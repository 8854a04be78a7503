"""Pallas TPU kernels for the filter engine's hot path.

The XLA ``direct`` backend materializes partial sums of the 65 shifted
multiply-adds through HBM; these kernels instead tile the stream into VMEM
once and run all taps in-register — the speed-of-light formulation for a
memory-bound FIR (read each input sample once, write each output once).

Layout: **time-major** ``[N, C]`` — the time axis on sublanes (so the tap
shifts are cheap sublane slices) and channels on lanes (dense 128-wide
vectors). The block halo needed by a causal FIR (the previous ``K-1``
samples) is obtained *without* overlapping BlockSpecs or manual DMA by
passing the same input array twice with index maps offset by one time block:
each kernel instance sees (previous block, current block) and concatenates
the tail of one with the other. Mosaic double-buffers both streams
automatically across the grid.

New capability (the reference computes its FIRs one sample at a time,
`/root/reference/src/modem/fir.rs:18-34`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fir import _as_f32

#: time samples per kernel block (sublane dim; multiple of 8)
DEFAULT_CHUNK = 1024
#: channels per kernel block (lane dim)
LANE = 128


def _auto_interpret() -> bool:
    """Compile for real TPUs; interpret elsewhere (CPU test meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


def _fir_kernel(prev_ref, curr_ref, o_ref, *, taps: tuple, chunk: int):
    k = len(taps)
    t = pl.program_id(1)
    halo = jnp.where(t == 0, 0.0, prev_ref[chunk - (k - 1):, :])
    buf = jnp.concatenate([halo, curr_ref[:, :]], axis=0)  # [chunk+k-1, C]
    acc = taps[0] * buf[k - 1: k - 1 + chunk, :]
    for j in range(1, k):
        acc = acc + taps[j] * buf[k - 1 - j: k - 1 - j + chunk, :]
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("taps_t", "chunk", "interpret"))
def _pallas_fir_tmajor(x, taps_t: tuple, chunk: int, interpret: bool):
    n, c = x.shape
    k = len(taps_t)
    grid = (c // LANE, n // chunk)
    spec_curr = pl.BlockSpec((chunk, LANE), lambda ci, t: (t, ci),
                             memory_space=pltpu.VMEM)
    # Block t-1 (clamped at t=0; the kernel masks it out there).
    spec_prev = pl.BlockSpec((chunk, LANE),
                             lambda ci, t: (jnp.maximum(t - 1, 0), ci),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fir_kernel, taps=taps_t, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=grid,
        in_specs=[spec_prev, spec_curr],
        out_specs=pl.BlockSpec((chunk, LANE), lambda ci, t: (t, ci),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x)


def pallas_fir(
    x: jnp.ndarray,
    taps,
    state: jnp.ndarray | None = None,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Causal FIR over ``x [..., n]`` (time minor, like :func:`fir_filter`).

    Transposes to the kernel's time-major layout, pads time to a ``chunk``
    multiple and channels to a lane multiple, runs the kernel, and undoes
    both. Returns ``(y, new_state)`` with ``fir_filter`` semantics.
    """
    taps = _as_f32(taps)
    k = taps.shape[0]
    if k == 1:  # degenerate scale; no history, no kernel needed
        if state is None:
            state = jnp.zeros(x.shape[:-1] + (0,), x.dtype)
        return float(taps[0]) * x, state
    if k - 1 > chunk:
        raise ValueError(f"taps ({k}) must fit one chunk ({chunk})")
    if interpret is None:
        interpret = _auto_interpret()

    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    if state is None:
        state = jnp.zeros(batch_shape + (k - 1,), x.dtype)
    new_state = (jnp.concatenate([state, x], axis=-1)[..., -(k - 1):]
                 if k > 1 else state)

    xe = jnp.concatenate([state, x], axis=-1) if k > 1 else x
    flat = xe.reshape((-1, xe.shape[-1]))  # [C, k-1 + n]
    c = flat.shape[0]

    # Time-major with the history folded in front; pad so the first chunk
    # boundary lands exactly after the history (history length k-1 < chunk).
    lead = chunk - (k - 1) if k > 1 else 0
    n_pad = (-(n + (k - 1) + lead)) % chunk
    c_pad = (-c) % LANE
    xt = jnp.pad(flat.T, ((lead, n_pad), (0, c_pad)))
    y = _pallas_fir_tmajor(xt, tuple(float(t) for t in taps), chunk, interpret)
    # Output row g holds sum_j taps[j] * X[g - j]; x's first sample sits at
    # row lead + (k-1) == chunk (or 0 when k == 1).
    start = chunk if k > 1 else 0
    y = y[start: start + n, :c]
    return y.T.reshape(batch_shape + (n,)), new_state

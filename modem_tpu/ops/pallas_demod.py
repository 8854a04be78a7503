"""Fused reference demodulator: the steady-state product detector as one
Pallas kernel.

The reference's receive hot loop (`demodulator.rs:44-56`, driven by
`demodulate.rs:36-43`) is, per passband sample,

    i = 2 * LPF(x * cos(theta + phi)),  q = 2 * LPF(-x * sin(theta + phi))

with a 64-tap lowpass per rail — ~151 f32 MACs/sample on a scalar CPU
(BASELINE.md), order 1e7-1e8 samples/s/core. This kernel runs the identical
math as one VMEM pass per (channel x time) tile: exact integer-NCO phase +
per-channel acquired offset ``phi``, mix, and both FIR rails fused — HBM
traffic is 4 B in + 8 B out per sample.

The 64-sample PLL acquisition (`demodulator.rs:32-36`) is a one-shot,
sequential step and stays in the staged path
(:meth:`modem_tpu.rx.Demodulator.lock_phase`); its acquired ``phi`` enters
the kernel as a per-channel row. Outputs match
:meth:`modem_tpu.rx.Demodulator.demodulate` to f32 rounding (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fir import _as_f32
from .pallas_chain import LANE, _auto_interpret

#: halo rows covering the lowpass lookback (taps - 1 <= 64)
DEMOD_HALO = 64
#: tile height: at 1024 the 64 distinct-tap slice-MACs exhaust scoped VMEM
#: (silent Mosaic compile crash on the target, bisected); 256 compiles and
#: pipelines fine
DEFAULT_CHUNK = 256


def _demod_kernel(off_ref, phi_ref, prev_ref, curr_ref, oi_ref, oq_ref, *,
                  taps, hz, sr, cst, lb):
    t = pl.program_id(1)
    x = jnp.concatenate([prev_ref[DEMOD_HALO - lb:, :], curr_ref[:, :]],
                        axis=0)  # [cst + lb, C]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    g = t * cst + rows - lb  # global sample index
    # pre-stream rows read garbage via the clipped halo window; they must be
    # zero (the FIR's zero initial state)
    x = jnp.where(g >= 0, x, 0.0)
    # exact integer-mod NCO (`nco.carrier_phase`): u = ((off + g) % sr) * hz % sr
    u = (((g % sr) + off_ref[0, 0]) % sr * hz) % sr
    theta = u.astype(jnp.float32) * np.float32(2.0 * np.pi / sr)
    total = theta + phi_ref[0, :][None, :]
    mi = x * jnp.cos(total)
    mq = -x * jnp.sin(total)
    c = x.shape[1]
    acc_i = jnp.zeros((cst, c), jnp.float32)
    acc_q = jnp.zeros((cst, c), jnp.float32)
    for j in range(len(taps)):
        b = taps[j]
        if b == 0.0:
            continue
        sl = slice(lb - j, lb - j + cst)
        acc_i = acc_i + b * mi[sl, :]
        acc_q = acc_q + b * mq[sl, :]
    oi_ref[:, :] = 2.0 * acc_i
    oq_ref[:, :] = 2.0 * acc_q


@functools.partial(
    jax.jit,
    static_argnames=("taps", "hz", "sr", "cst", "interpret"),
)
def _demod_tmajor(x, off, phi, taps, hz, sr, cst, interpret):
    n_pad, c = x.shape
    lb = len(taps) - 1
    hb = DEMOD_HALO
    n_halo = n_pad // hb
    r = cst // hb
    grid = (c // LANE, n_pad // cst)
    curr = pl.BlockSpec((cst, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (hb, LANE),
        lambda ci, t: (jnp.clip(t * r - 1, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda ci, t: (0, 0), memory_space=pltpu.SMEM)
    phi_spec = pl.BlockSpec((1, LANE), lambda ci, t: (0, ci),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((cst, LANE), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_demod_kernel, taps=taps, hz=hz, sr=sr, cst=cst,
                          lb=lb),
        out_shape=[jax.ShapeDtypeStruct((n_pad, c), jnp.float32)] * 2,
        grid=grid,
        in_specs=[smem, phi_spec, prev, curr],
        out_specs=[out_spec] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(off.reshape(1, 1).astype(jnp.int32), phi, x, x)


def fused_product_detect(
    x: jnp.ndarray,
    carrier_hz: int,
    sample_rate: int,
    lowpass: np.ndarray,
    phase_offset=None,
    s_mod_sr=0,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
):
    """Passband ``x [..., N]`` -> soft baseband ``(i, q) [..., N]``.

    The reference demodulator's steady-state output (`demodulator.rs:44-56`)
    — fused mix + dual 64-tap lowpass. ``phase_offset`` is the per-batch
    acquired PLL phase (broadcast scalar or ``[...]`` matching the batch
    shape); ``s_mod_sr`` the stream-global carrier counter of ``x[..., 0]``.
    Zero FIR history at the block start (prepend the previous block's tail
    for streaming; :meth:`modem_tpu.rx.Demodulator.demodulate_fused` does).
    """
    taps = _as_f32(lowpass)
    lb = len(taps) - 1
    if lb > DEMOD_HALO:
        raise ValueError(f"lowpass must have <= {DEMOD_HALO + 1} taps")
    if chunk % DEMOD_HALO:
        raise ValueError(f"chunk must be a multiple of {DEMOD_HALO}")
    if carrier_hz * sample_rate >= 1 << 31:
        raise ValueError("needs hz*sr < 2^31 for exact int32 NCO")
    if interpret is None:
        interpret = _auto_interpret()

    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    flat = x.reshape((-1, n))
    c = flat.shape[0]
    c_pad = (-c) % LANE
    xt = jnp.pad(flat.T.astype(jnp.float32),
                 ((0, (-n) % chunk), (0, c_pad)))
    if phase_offset is None:
        phase_offset = jnp.zeros(batch_shape, jnp.float32)
    phi = jnp.broadcast_to(jnp.asarray(phase_offset, jnp.float32),
                           batch_shape).reshape(-1)
    phi = jnp.pad(phi, (0, c_pad)).reshape(1, -1)
    oi, oq = _demod_tmajor(
        xt, jnp.asarray(s_mod_sr, jnp.int32), phi,
        tuple(float(v) for v in taps), int(carrier_hz), int(sample_rate),
        chunk, interpret,
    )
    shaped = [o[:n, :c].T.reshape(batch_shape + (n,)) for o in (oi, oq)]
    return shaped[0], shaped[1]

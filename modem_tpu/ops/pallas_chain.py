"""Fully-fused flagship chain as one Pallas TPU kernel.

On the target device the memory:compute ratio makes any HBM round-trip of the
waveform the dominant cost (measured ~18-37 GB/s vs >=1 TFLOP/s VPU and ~10
TFLOP/s MXU f32). This kernel therefore keeps the *entire* signal chain
VMEM-resident per tile:

    int32 symbols -> constellation IQ -> polyphase RRC interpolation (the
    waveform exists only in VMEM) -> polyphase matched filter + decimation at
    decision instants -> min-distance slicing -> int32 decisions

HBM traffic is 4 B in + 4 B out per *symbol* (~1 B per complex sample at
sps=8) instead of the ~24 B/sample of the staged XLA chain — a >20x traffic
reduction, putting the chain at the device roofline.

Layout: time-major ``[K, C]`` (symbols on sublanes, channels on lanes). The
span-limited lookback/lookahead (``span`` symbols each side) is fetched with
the prev/next-block trick: the symbol array is passed three times with index
maps offset by one time block; beyond-stream regions are masked to **zero
I/Q**, which is exactly the zero start state and zero-symbol flush of
:class:`modem_tpu.chain.PulseShapedChain`.

Numerics match the staged chain to f32 reassociation; decisions agree exactly
in practice (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fir import _as_f32
from .polyphase import _phase_bank

LANE = 128
DEFAULT_CHUNK_SYM = 256


def _auto_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _chain_kernel(
    prev_ref, curr_ref, next_ref, o_ref, *,
    lut: tuple, bank: tuple, taps: tuple, sps: int, span: int,
    cs: int, k_real: int,
):
    """One (channels, time) tile of the fused chain. Static args:
    ``lut``: ((i, q), ...) constellation; ``bank``: polyphase rows
    ``bank[p][k]``; ``taps``: matched-filter taps; ``cs``: symbols per tile;
    ``k_real``: unpadded global symbol count."""
    kp = len(bank[0])  # taps per polyphase branch
    ext_l, ext_r = span, span + 1
    t = pl.program_id(1)

    syms = jnp.concatenate(
        [prev_ref[cs - ext_l:, :], curr_ref[:, :], next_ref[:ext_r, :]], axis=0
    )  # [cs + ext_l + ext_r, C] int32

    # Constellation gather as selects (small LUTs), masked to zero I/Q outside
    # the real stream: left of sample 0 = zero initial state, right of k_real
    # = the flush tail.
    rows = jax.lax.broadcasted_iota(jnp.int32, syms.shape, 0)
    g = t * cs + rows - ext_l
    valid = (g >= 0) & (g < k_real)
    zi = jnp.zeros(syms.shape, jnp.float32)
    zq = jnp.zeros(syms.shape, jnp.float32)
    for m, (ci, cq) in enumerate(lut):
        hit = valid & (syms == m)
        zi = jnp.where(hit, ci, zi)
        zq = jnp.where(hit, cq, zq)

    # Polyphase interpolation: wp[p][m8] = sum_k bank[p][k] * iq[m8 - k],
    # for m8 in [0, cs + span]; iq index offset by ext_l.
    n8 = cs + span + 1
    wip, wqp = [], []
    for p in range(sps):
        ai = jnp.zeros((n8, zi.shape[1]), jnp.float32)
        aq = jnp.zeros((n8, zi.shape[1]), jnp.float32)
        for k in range(kp):
            b = bank[p][k]
            if b == 0.0:
                continue
            sl = slice(ext_l - k, ext_l - k + n8)
            ai = ai + b * zi[sl, :]
            aq = aq + b * zq[sl, :]
        wip.append(ai)
        wqp.append(aq)

    # Matched filter + decimation at decision instants:
    # z[m] = sum_j taps[j] * w[m*sps + span*sps - j]  ->  per-j phase slice.
    d = span * sps
    acc_i = jnp.zeros((cs, zi.shape[1]), jnp.float32)
    acc_q = jnp.zeros((cs, zi.shape[1]), jnp.float32)
    for j in range(len(taps)):
        a = d - j
        p, q = a % sps, a // sps
        acc_i = acc_i + taps[j] * wip[p][q: q + cs, :]
        acc_q = acc_q + taps[j] * wqp[p][q: q + cs, :]

    # Min-distance slicing over the constellation.
    best = jnp.zeros((cs, zi.shape[1]), jnp.int32)
    best_d = jnp.full((cs, zi.shape[1]), np.inf, jnp.float32)
    for m, (ci, cq) in enumerate(lut):
        dist = (acc_i - ci) ** 2 + (acc_q - cq) ** 2
        best = jnp.where(dist < best_d, m, best)
        best_d = jnp.minimum(dist, best_d)
    o_ref[:, :] = best


@functools.partial(
    jax.jit,
    static_argnames=("lut", "bank", "taps", "sps", "span", "cs", "k_real",
                     "interpret"),
)
def _fused_tmajor(syms, lut, bank, taps, sps, span, cs, k_real, interpret):
    k_pad, c = syms.shape
    grid = (c // LANE, k_pad // cs)
    bs = lambda off: pl.BlockSpec(
        (cs, LANE),
        lambda ci, t, off=off: (jnp.clip(t + off, 0, k_pad // cs - 1), ci),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _chain_kernel, lut=lut, bank=bank, taps=taps, sps=sps, span=span,
            cs=cs, k_real=k_real,
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, c), jnp.int32),
        grid=grid,
        in_specs=[bs(-1), bs(0), bs(1)],
        out_specs=pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(syms, syms, syms)


def fused_pulse_chain(
    symbols: jnp.ndarray,
    lut: np.ndarray,
    rrc_taps: np.ndarray,
    sps: int,
    span: int,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Noiseless loopback of the pulse-shaped chain, fused in VMEM.

    ``symbols``: ``[..., K]`` int32 constellation indices. Returns the decided
    ``[..., K]`` int32 symbols — bit-identical in practice to
    ``PulseShapedChain`` tx->rx at infinite SNR.
    """
    lut = np.asarray(lut, np.float32)
    if lut.shape[0] > 64:
        raise ValueError("fused kernel supports constellations up to 64 points")
    taps = _as_f32(rrc_taps)
    if len(taps) != span * sps + 1:
        raise ValueError("rrc taps length must equal span*sps + 1")
    if chunk_sym < span + 1:
        raise ValueError("chunk_sym must exceed the filter span")
    if interpret is None:
        interpret = _auto_interpret()
    bank = _phase_bank(taps, sps)

    batch_shape = symbols.shape[:-1]
    k = symbols.shape[-1]
    flat = symbols.reshape((-1, k))
    c = flat.shape[0]
    k_pad = (-k) % chunk_sym
    c_pad = (-c) % LANE
    st = jnp.pad(flat.T, ((0, k_pad), (0, c_pad)))

    out = _fused_tmajor(
        st,
        tuple((float(i), float(q)) for i, q in lut),
        tuple(tuple(float(v) for v in row) for row in bank),
        tuple(float(v) for v in taps),
        sps, span, chunk_sym, k, interpret,
    )
    return out[:k, :c].T.reshape(batch_shape + (k,))

"""Fused Pallas max-log BCJR: one turbo half-iteration inside one kernel.

Why this exists (BENCH.md FEC table): turbo decoding at 25 Mbit/s was
the slowest row in the package — each of the 12 half-iterations is three
``lax.scan``s over the whole trellis (alpha, beta, app) whose per-step
overhead dwarfs the [batch, 8]-wide arithmetic, plus a materialized
``[T, ..., 8, 2]`` gamma tensor round-tripping HBM. This kernel runs a
whole windowed half-iteration — forward alpha recursion, backward beta
recursion and APP extraction — inside one ``pallas_call``: gammas are
assembled on the fly from three ``[1, 128]`` LLR rows (never
materialized), alphas live in a VMEM scratch, and a trellis step costs
VPU instructions instead of scan iterations.

Layout mirrors `ops/pallas_viterbi`: window rows on lanes (128
independent windows per grid tile), the 8 RSC states on sublanes — every
state-axis op is exactly one ``[8, 128]`` VPU tile. The LTE RSC trellis
has the same butterfly as a rate-1/n convolutional code (pred pair =
``{(s<<1)&7, (s<<1)|1}``), so the same **rotor relabeling** applies: under
a phase-rotating physical map (period ``K-1 = 3``) both recursion inputs
are always one static ``pltpu.roll`` away — no matmuls, no gathers, in
BOTH directions (the beta recursion's mirror butterfly admits the same
map; both verified by brute force against the natural recursions).

Windowing follows `fec/turbo.TurboCode._bcjr_windowed` exactly: windows
of ``window`` core steps with ``guard`` neutral-start warm-up steps on
each side, processed as independent batch rows; pin-gammas (only the
``(state 0, u=0)`` branch survives) carry the exact terminated-trellis
boundary conditions through the stream pads. Pinned steps are applied
through a per-step mask row, so the four on-the-fly gamma rows reproduce
the XLA form's pin values exactly where they decide anything: the one
deliberate divergence is that a pinned step here assigns cost 0 (not
-1e30) to every branch whose (u, parity) = (0, 0) — those branches leave
only *dead* states (alpha = -1e30-scale), so every live metric and hence
every kept APP value is bit-identical to the XLA windowed decoder
(gated in tests/test_pallas_bcjr.py, CPU interpret and chip).

New capability (the reference has no FEC; its RX stops at soft I/Q,
`/root/reference/src/bin/demodulate.rs:41-43`).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_NEG = np.float32(-1e30)
_NB = 3          # register bits of the 8-state LTE RSC
_S = 8
#: steps unrolled per fori iteration — a multiple of the rotor period 3
_CHUNK = 12


def _auto_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _rotr(x, r):
    return ((x >> r) | (x << (_NB - r))) & (_S - 1) if r else x


def _tables():
    """Static per-phase selection tables, packed column-wise ``[8, .]``.

    * ``wf [8, 3*2*4]``: forward gamma one-hots — column ``(rho*2+b)*4+g``
      is 1 at physical row ``y`` iff the branch from pred-parity ``b``
      into the state stored at ``y`` (output phase ``rho``) emits the
      (u, parity) combo ``g = 2u+p``.
    * ``vb [8, 3*2*4]``: backward/app gamma one-hots keyed by the pred
      state's frame (phase ``r``) and input bit ``u``.
    * ``ab [8, 3*2]``: the feedback bit ``a(s, u)`` selecting which beta
      partner the branch lands on.
    """
    y = np.arange(_S)
    wf = np.zeros((_S, _NB * 2 * 4), np.float32)
    vb = np.zeros((_S, _NB * 2 * 4), np.float32)
    ab = np.zeros((_S, _NB * 2), np.float32)
    for rho in range(_NB):
        sp = _rotr(y, rho)
        for b in (0, 1):
            u = ((sp >> 2) ^ sp ^ b) & 1
            p = ((sp >> 2) ^ (sp >> 1) ^ b) & 1
            wf[y, (rho * 2 + b) * 4 + (2 * u + p)] = 1.0
    for r in range(_NB):
        s = _rotr(y, r)
        s1, s2, s3 = (s >> 2) & 1, (s >> 1) & 1, s & 1
        for u in (0, 1):
            a = u ^ s2 ^ s3
            p = a ^ s1 ^ s3
            vb[y, (r * 2 + u) * 4 + (2 * u + p)] = 1.0
            ab[y, r * 2 + u] = a
    return wf, vb, ab


def _gamma_rows(lu, lp, pin):
    """The four possible branch costs at one step, pin-masked.

    ``lu/lp/pin [1, L]`` -> list of 4 ``[1, L]`` rows indexed ``2u+p``:
    ``g = 0.5*(1-2u)*lu + 0.5*(1-2p)*lp`` (the `fec/turbo._gammas` form,
    same products, same add order), replaced by ``{0, NEG}`` under pin.
    """
    a0 = 0.5 * lu
    a1 = -a0
    b0 = 0.5 * lp
    b1 = -b0
    g = [a0 + b0, a0 + b1, a1 + b0, a1 + b1]
    hot = pin > 0.0
    g[0] = jnp.where(hot, 0.0, g[0])
    for i in (1, 2, 3):
        g[i] = jnp.where(hot, _NEG, g[i])
    return g


def _bcjr_kernel(wf_ref, vb_ref, ab_ref, x_ref, out_ref,
                 al_scr, alphas_scr, be_scr, *, tw, interpret):
    """One 128-lane tile: alpha sweep, then fused beta+APP sweep.

    ``x_ref [3, tw, 128]``: rows 0/1/2 = systematic+apriori LLR, parity
    LLR, pin mask. ``out_ref [tw, 128]``: APP LLRs (caller subtracts the
    input to get extrinsics and slices the window core).
    """
    roll = jnp.roll if interpret else pltpu.roll
    chunks = tw // _CHUNK
    iota = lax.broadcasted_iota(jnp.int32, (_S, LANE), 0)
    lo_mask = [(iota & (1 << r)) == 0 for r in range(_NB)]
    wf = [[[wf_ref[:, (rho * 2 + b) * 4 + g:(rho * 2 + b) * 4 + g + 1]
            for g in range(4)] for b in (0, 1)] for rho in range(_NB)]
    vb = [[[vb_ref[:, (r * 2 + u) * 4 + g:(r * 2 + u) * 4 + g + 1]
            for g in range(4)] for u in (0, 1)] for r in range(_NB)]
    ab = [[ab_ref[:, r * 2 + u:r * 2 + u + 1] > 0.5
           for u in (0, 1)] for r in range(_NB)]

    al_scr[:, :] = jnp.zeros((_S, LANE), jnp.float32)

    def sel(mask4, g4):
        acc = mask4[0] * g4[0]
        for i in (1, 2, 3):
            acc = acc + mask4[i] * g4[i]
        return acc

    def fwd(c, _):
        xc = x_ref[:, pl.ds(c * _CHUNK, _CHUNK), :]   # [3, chunk, L]
        al = al_scr[:, :]
        hist = []
        for i in range(_CHUNK):
            r = i % _NB                 # (c*_CHUNK + i) % 3 == i % 3
            rho = (i + 1) % _NB
            d = 1 << r
            hist.append(al)
            g4 = _gamma_rows(xc[0:1, i, :], xc[1:2, i, :], xc[2:3, i, :])
            lo = jnp.where(lo_mask[r], al, roll(al, d, axis=0))
            hi = jnp.where(lo_mask[r], roll(al, _S - d, axis=0), al)
            c0 = lo + sel(wf[rho][0], g4)
            c1 = hi + sel(wf[rho][1], g4)
            al = jnp.maximum(c0, c1)
            al = al - jnp.max(al, axis=0, keepdims=True)
        al_scr[:, :] = al
        alphas_scr[pl.ds(c * _CHUNK, _CHUNK), :, :] = jnp.stack(hist)
        return 0

    lax.fori_loop(0, chunks, fwd, 0)

    be_scr[:, :] = jnp.zeros((_S, LANE), jnp.float32)

    def bwd(cr, _):
        c = chunks - 1 - cr
        xc = x_ref[:, pl.ds(c * _CHUNK, _CHUNK), :]
        ach = alphas_scr[pl.ds(c * _CHUNK, _CHUNK), :, :]
        be = be_scr[:, :]
        rows = []
        for i in range(_CHUNK - 1, -1, -1):
            r = i % _NB
            d = 1 << r
            g4 = _gamma_rows(xc[0:1, i, :], xc[1:2, i, :], xc[2:3, i, :])
            lo = jnp.where(lo_mask[r], be, roll(be, d, axis=0))
            hi = jnp.where(lo_mask[r], roll(be, _S - d, axis=0), be)
            gam0 = sel(vb[r][0], g4)
            gam1 = sel(vb[r][1], g4)
            bp0 = jnp.where(ab[r][0], hi, lo)
            bp1 = jnp.where(ab[r][1], hi, lo)
            al = ach[i]
            m0 = (al + gam0) + bp0
            m1 = (al + gam1) + bp1
            rows.append(jnp.max(m0, axis=0, keepdims=True)
                        - jnp.max(m1, axis=0, keepdims=True))
            be = jnp.maximum(gam0 + bp0, gam1 + bp1)
            be = be - jnp.max(be, axis=0, keepdims=True)
        be_scr[:, :] = be
        out_ref[pl.ds(c * _CHUNK, _CHUNK), :] = jnp.concatenate(
            rows[::-1], axis=0)
        return 0

    lax.fori_loop(0, chunks, bwd, 0)


@functools.partial(jax.jit, static_argnames=("tw", "interpret"))
def _bcjr_rows(x, tw: int, interpret: bool):
    """``x [3, tw, R]`` (tw % 12 == 0, R % 128 == 0) -> APP ``[tw, R]``."""
    wf, vb, ab = _tables()
    r = x.shape[-1]
    kern = functools.partial(_bcjr_kernel, tw=tw, interpret=interpret)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((tw, r), jnp.float32),
        grid=(r // LANE,),
        in_specs=[
            pl.BlockSpec((_S, _NB * 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_S, _NB * 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_S, _NB * 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tw, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tw, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_S, LANE), jnp.float32),
            pltpu.VMEM((tw, _S, LANE), jnp.float32),
            pltpu.VMEM((_S, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(wf), jnp.asarray(vb), jnp.asarray(ab), x)


def pick_guard(window: int, guard: int) -> int:
    """Smallest ``g >= guard`` with ``(window + 2g) % _CHUNK == 0`` (the
    kernel's unroll granularity). Exists for even ``window`` (the default
    256); the caller falls back to XLA otherwise."""
    for g in range(guard, guard + _CHUNK):
        if (window + 2 * g) % _CHUNK == 0:
            return g
    raise ValueError(
        f"no guard >= {guard} aligns window {window} to {_CHUNK} steps "
        "(odd window?) — use the XLA backend")


def bcjr_windowed(lsys, lpar, la, t_sys, t_par, window: int, guard: int,
                  interpret: bool | None = None):
    """Drop-in fused form of `fec/turbo.TurboCode._bcjr_windowed`.

    Same windowing, same pin-gamma boundary handling, kernel-layout
    window construction (lane-major stream, stacked slices — no gather).
    Returns extrinsic LLRs ``[..., T]`` bit-identical to the XLA form at
    the same (window, guard).
    """
    t = lsys.shape[-1]
    tp = t + 3
    batch = lsys.shape[:-1]
    c = int(np.prod(batch)) if batch else 1
    n_win = -(-tp // window)
    pad_tail = n_win * window - tp
    tw = window + 2 * guard
    if tw % _CHUNK:
        raise ValueError(f"window + 2*guard must be a multiple of {_CHUNK} "
                         "(use pick_guard)")

    lu = jnp.concatenate([lsys + la, t_sys], axis=-1)     # [..., T+3]
    lp = jnp.concatenate([lpar, t_par], axis=-1)
    stream = jnp.stack([lu.reshape((c, tp)), lp.reshape((c, tp)),
                        jnp.zeros((c, tp), jnp.float32)])  # [3, C, T+3]
    x = jnp.transpose(stream.astype(jnp.float32), (0, 2, 1))  # [3, T+3, C]
    x = jnp.pad(x, ((0, 0), (guard, pad_tail + guard), (0, 0)))
    # pin mask: 1 everywhere outside the data region
    x = x.at[2, :guard, :].set(1.0)
    x = x.at[2, guard + tp:, :].set(1.0)
    wins = jnp.stack(
        [x[:, w * window: w * window + tw, :] for w in range(n_win)],
        axis=2)                                            # [3, tw, W, C]
    rows = wins.reshape((3, tw, n_win * c))
    r = n_win * c
    pad_r = (-r) % LANE
    if pad_r:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, pad_r)),
                       constant_values=0.0)
        # padded rows: mark fully pinned so their metrics stay bounded
        rows = rows.at[2, :, r:].set(1.0)
    app = _bcjr_rows(rows, tw,
                     _auto_interpret() if interpret is None else interpret)
    core = app[guard: guard + window, :r]                  # [window, W*C]
    core = jnp.transpose(core.reshape((window, n_win, c)), (2, 1, 0))
    flat = core.reshape(batch + (n_win * window,))[..., :t]
    return flat - (lsys + la)

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
#: legacy steps-per-fori-iteration granule (pick_guard's alignment unit);
#: the kernel now takes ``chunk`` as a parameter — bigger unrolls measured
#: +20-25% on the chip (1.46 -> 1.76-1.82 Gstep/s at chunk 108-324), and
#: chunking is value-neutral (renorm is per-step), so callers pick the
#: largest aligned chunk via `_pick_chunk`
_CHUNK = 12
#: alpha-history scratch cap: tw * 4 KB (f32 [8, 128] per step) must
#: leave room for the other buffers in ~16 MB VMEM
_TW_CAP = 2496


def _auto_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _rotr(x, r):
    return ((x >> r) | (x << (_NB - r))) & (_S - 1) if r else x


def _onehot_tables():
    """Static per-phase one-hot selection tables ``[8, .]``.

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


def _fold_signed(onehot):
    """One-hot gamma mix -> signed 2-term form (round-5 op-count cut).

    The four max-log branch costs at a step are ``g_{2u+p} =
    0.5*(1-2u)*lu + 0.5*(1-2p)*lp``, so ``g3 = -g0`` and ``g2 = -g1``
    exactly (f32 negation is exact and round-to-nearest is
    sign-symmetric, so ``fl(-a+b) == -fl(a-b)``). The per-state one-hot
    mix ``sum_g m_g * g_g`` (4 mults + 3 adds per selection) therefore
    collapses to ``w0*g0 + w1*g1`` with static ``w0 = m_0 - m_3``,
    ``w1 = m_1 - m_2`` in {-1, 0, +1} (2 mults + 1 add) — every product
    is an exact copy/negation and the discarded terms are exact zeros,
    so the selected value is BIT-IDENTICAL to the one-hot mix. Pinned
    steps lose the +/- symmetry (g0 -> 0, rest -> NEG), so each
    (phase, b) also gets a static pinned column ``NEG * (1 - m_0)``
    applied by one select.

    ``onehot [8, G*4]`` -> (signed ``[8, G*2]``, pinned ``[8, G]``).
    """
    groups = onehot.shape[1] // 4
    signed = np.zeros((_S, groups * 2), np.float32)
    pinned = np.zeros((_S, groups), np.float32)
    for g in range(groups):
        m = onehot[:, g * 4: g * 4 + 4]
        signed[:, 2 * g] = m[:, 0] - m[:, 3]
        signed[:, 2 * g + 1] = m[:, 1] - m[:, 2]
        pinned[:, g] = _NEG * (1.0 - m[:, 0])
    return signed, pinned


def _tables():
    wf, vb, ab = _onehot_tables()
    wfs, wfn = _fold_signed(wf)
    vbs, vbn = _fold_signed(vb)
    return wfs, wfn, vbs, vbn, ab


def _bcjr_kernel(wfs_ref, wfn_ref, vbs_ref, vbn_ref, ab_ref, x_ref, out_ref,
                 al_scr, alphas_scr, be_scr, *, tw, chunk, interpret):
    """One 128-lane tile: alpha sweep, then fused beta+APP sweep.

    ``x_ref [3, tw, 128]``: rows 0/1/2 = systematic+apriori LLR, parity
    LLR, pin mask. ``out_ref [tw, 128]``: APP LLRs (caller subtracts the
    input to get extrinsics and slices the window core). Gamma selection
    uses the signed 2-term fold (`_fold_signed`) — bit-identical to the
    one-hot mix at ~60% of its VPU ops.
    """
    roll = jnp.roll if interpret else pltpu.roll
    chunks = tw // chunk
    iota = lax.broadcasted_iota(jnp.int32, (_S, LANE), 0)
    lo_mask = [(iota & (1 << r)) == 0 for r in range(_NB)]
    wf = [[(wfs_ref[:, (rho * 2 + b) * 2:(rho * 2 + b) * 2 + 1],
            wfs_ref[:, (rho * 2 + b) * 2 + 1:(rho * 2 + b) * 2 + 2],
            wfn_ref[:, rho * 2 + b:rho * 2 + b + 1])
           for b in (0, 1)] for rho in range(_NB)]
    vb = [[(vbs_ref[:, (r * 2 + u) * 2:(r * 2 + u) * 2 + 1],
            vbs_ref[:, (r * 2 + u) * 2 + 1:(r * 2 + u) * 2 + 2],
            vbn_ref[:, r * 2 + u:r * 2 + u + 1])
           for u in (0, 1)] for r in range(_NB)]
    ab = [[ab_ref[:, r * 2 + u:r * 2 + u + 1] > 0.5
           for u in (0, 1)] for r in range(_NB)]

    al_scr[:, :] = jnp.zeros((_S, LANE), jnp.float32)

    def gam01(xc, i):
        """g0 = gamma(u=0,p=0), g1 = gamma(u=0,p=1) and the pin flag —
        `fec/turbo._gammas` values (same products, same add order); the
        other two combos are exact negations handled by the fold."""
        a0 = 0.5 * xc[0:1, i, :]
        b0 = 0.5 * xc[1:2, i, :]
        return a0 + b0, a0 + (-b0), xc[2:3, i, :] > 0.0

    def sel(wtriple, g0, g1, hot):
        w0, w1, pinned = wtriple
        return jnp.where(hot, pinned, w0 * g0 + w1 * g1)

    def fwd(c, _):
        xc = x_ref[:, pl.ds(c * chunk, chunk), :]   # [3, chunk, L]
        al = al_scr[:, :]
        hist = []
        for i in range(chunk):
            r = i % _NB                 # chunk % 3 == 0, so == global % 3
            rho = (i + 1) % _NB
            d = 1 << r
            hist.append(al)
            g0, g1, hot = gam01(xc, i)
            lo = jnp.where(lo_mask[r], al, roll(al, d, axis=0))
            hi = jnp.where(lo_mask[r], roll(al, _S - d, axis=0), al)
            c0 = lo + sel(wf[rho][0], g0, g1, hot)
            c1 = hi + sel(wf[rho][1], g0, g1, hot)
            al = jnp.maximum(c0, c1)
            al = al - jnp.max(al, axis=0, keepdims=True)
        al_scr[:, :] = al
        alphas_scr[pl.ds(c * chunk, chunk), :, :] = jnp.stack(hist)
        return 0

    lax.fori_loop(0, chunks, fwd, 0)

    be_scr[:, :] = jnp.zeros((_S, LANE), jnp.float32)

    def bwd(cr, _):
        c = chunks - 1 - cr
        xc = x_ref[:, pl.ds(c * chunk, chunk), :]
        ach = alphas_scr[pl.ds(c * chunk, chunk), :, :]
        be = be_scr[:, :]
        rows = []
        for i in range(chunk - 1, -1, -1):
            r = i % _NB
            d = 1 << r
            g0, g1, hot = gam01(xc, i)
            lo = jnp.where(lo_mask[r], be, roll(be, d, axis=0))
            hi = jnp.where(lo_mask[r], roll(be, _S - d, axis=0), be)
            gam0 = sel(vb[r][0], g0, g1, hot)
            gam1 = sel(vb[r][1], g0, g1, hot)
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
        out_ref[pl.ds(c * chunk, chunk), :] = jnp.concatenate(
            rows[::-1], axis=0)
        return 0

    lax.fori_loop(0, chunks, bwd, 0)


@functools.partial(jax.jit, static_argnames=("tw", "chunk", "interpret"))
def _bcjr_rows(x, tw: int, chunk: int, interpret: bool):
    """``x [3, tw, R]`` (tw % chunk == 0, chunk % 3 == 0, R % 128 == 0)
    -> APP ``[tw, R]``."""
    wfs, wfn, vbs, vbn, ab = _tables()
    r = x.shape[-1]
    kern = functools.partial(_bcjr_kernel, tw=tw, chunk=chunk,
                             interpret=interpret)

    def const_spec(cols):
        return pl.BlockSpec((_S, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((tw, r), jnp.float32),
        grid=(r // LANE,),
        in_specs=[
            const_spec(_NB * 4),   # wfs (signed pairs)
            const_spec(_NB * 2),   # wfn (pinned cols)
            const_spec(_NB * 4),   # vbs
            const_spec(_NB * 2),   # vbn
            const_spec(_NB * 2),   # ab
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
    )(jnp.asarray(wfs), jnp.asarray(wfn), jnp.asarray(vbs),
      jnp.asarray(vbn), jnp.asarray(ab), x)


def pick_guard(window: int, guard: int) -> int:
    """Smallest ``g >= guard`` with ``(window + 2g) % _CHUNK == 0`` (the
    legacy alignment granule). Exists for even ``window`` (e.g. 256);
    the caller falls back to XLA otherwise."""
    for g in range(guard, guard + _CHUNK):
        if (window + 2 * g) % _CHUNK == 0:
            return g
    raise ValueError(
        f"no guard >= {guard} aligns window {window} to {_CHUNK} steps "
        "(odd window?) — use the XLA backend")


def _pick_chunk(tw: int) -> int:
    """Largest unroll chunk <= 150 with ``chunk % 3 == 0`` dividing
    ``tw``. Measured on the chip: chunk 84-150 runs 1.6-1.8 Gstep/s vs
    1.46 at the legacy 12 (fori_loop overhead); chunking is
    value-neutral (renormalization is per-step), so any aligned chunk
    gives bit-identical output."""
    for c in range(150, 11, -3):
        if tw % c == 0:
            return c
    raise ValueError(f"no 3-aligned chunk divides tw={tw} "
                     "(align window+2*guard via pick_guard)")


def pick_geometry(t_steps: int, guard: int = 32):
    """``(window, guard, chunk)`` for a ``t_steps``-step terminated
    stream (round-5 default geometry).

    Single window covering the whole trellis when the alpha-history
    scratch fits VMEM (``tw <= _TW_CAP``): no interior window
    boundaries, so the kernel computes the EXACT full-block BCJR (the
    windowed form's guard approximation only ever applied at interior
    cuts) while doing ~1.5x fewer steps than the legacy 256-step
    multi-window schedule (K=1024: 1092 total steps vs 1620). The
    sequential depth that motivated windowing is an XLA-scan concern —
    inside the kernel every step costs VPU ops regardless, so fewer
    total steps strictly wins. Guards remain: ``guard`` pinned warm-up
    steps at the stream edges carry the exact terminated boundary
    (pins force state 0 within 3 steps, so any ``guard >= 3`` is
    already exact there). Larger streams fall back to 2016-step
    multi-window cores."""
    need = t_steps + 2 * guard
    if need <= _TW_CAP:
        best = None  # (tw, -chunk, chunk): minimal tw, then max chunk
        for chunk in range(84, 151, 3):
            tw = -(-need // chunk) * chunk
            cand = (tw, -chunk, chunk)
            if best is None or cand < best:
                best = cand
        return best[0] - 2 * guard, guard, best[2]
    window = 2016
    g = pick_guard(window, guard)
    return window, g, _pick_chunk(window + 2 * g)


def bcjr_windowed(lsys, lpar, la, t_sys, t_par, window: int | None,
                  guard: int, interpret: bool | None = None):
    """Drop-in fused form of `fec/turbo.TurboCode._bcjr_windowed`.

    Same windowing, same pin-gamma boundary handling, kernel-layout
    window construction (lane-major stream, stacked slices — no gather).
    Returns extrinsic LLRs ``[..., T]`` bit-identical to the XLA form at
    the same (window, guard). ``window=None`` picks the round-5 default
    geometry (`pick_geometry`): one window covering the whole trellis
    where VMEM allows — the EXACT full-block BCJR at ~1.5x fewer steps.
    """
    t = lsys.shape[-1]
    tp = t + 3
    batch = lsys.shape[:-1]
    c = int(np.prod(batch)) if batch else 1
    if interpret is None:
        interpret = _auto_interpret()
    if window is None:
        window, guard, chunk = pick_geometry(tp, guard)
    else:
        chunk = _pick_chunk(window + 2 * guard)
    if interpret:
        # CPU interpret: small unroll granule (tracing cost dominates);
        # chunking is value-neutral, so parity gates are unaffected
        for small in range(12, 151, 3):
            if (window + 2 * guard) % small == 0:
                chunk = small
                break
    n_win = -(-tp // window)
    pad_tail = n_win * window - tp
    tw = window + 2 * guard

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
    app = _bcjr_rows(rows, tw, chunk,
                     _auto_interpret() if interpret is None else interpret)
    core = app[guard: guard + window, :r]                  # [window, W*C]
    core = jnp.transpose(core.reshape((window, n_win, c)), (2, 1, 0))
    flat = core.reshape(batch + (n_win * window,))[..., :t]
    return flat - (lsys + la)

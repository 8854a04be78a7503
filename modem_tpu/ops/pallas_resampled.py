"""Fused Pallas kernels for the resampled chain (BASELINE config #4).

The staged :class:`modem_tpu.resampled.ResampledChain` runs ~0.2 GSamp/s: the
rational-resampler cascade makes ~10 HBM passes over full-rate waveforms.
These two kernels fuse each direction into one VMEM-resident pass, mirroring
the deployment split (TX produces the channel-rate waveform; RX consumes it):

* **TX**: int symbols -> constellation map -> polyphase RRC interpolation
  (modem rate, VMEM-only) -> rational ``up/down`` resample -> channel-rate
  waveform to HBM. Matches :meth:`ResampledChain.tx` to f32 reassociation.
* **RX**: channel waveform -> rational ``down/up`` resample (VMEM-only) ->
  matched filter + delay-compensated symbol sampling -> min-distance slice.
  Decisions equal :meth:`ResampledChain.rx` in practice.

Every stage uses the same Mosaic-safe algebra as the other fused kernels
(no strided memory ops): a rational L/M stage emits outputs in groups of L
per M inputs, so with the input viewed as ``[g, M, C]`` each output phase is
a sum of *contiguous* leading-dim slices weighted by per-``(offset, lane)``
scalar rows, reduced over the middle axis; phase interleave is the
``[g, L, C] -> [g*L, C]`` reshape. See `resample.py:102-121` for the
polyphase identity both stages implement.

Alignment (checked at the wrapper): ``chunk_sym * sps % down == 0`` so every
tile covers an integer number of channel samples; the RX halo windows must
divide the tile's channel-row stride (searched); all stage lookbacks must
fit their halos.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fir import _as_f32
from .polyphase import _phase_bank
from .pallas_chain import (
    HALO_ROWS, LANE, _auto_interpret, _lut_map, _lut_slice,
)


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _weight_row(w_np, width: int):
    """[1, width, 1] f32 vector from scalar weights via iota selects (array
    constants can't be captured by a Pallas kernel)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, width, 1), 1)
    w = jnp.zeros((1, width, 1), jnp.float32)
    for i in range(width):
        v = float(w_np[i])
        if v != 0.0:
            w = jnp.where(iota == i, jnp.float32(v), w)
    return w


def _stage_weights(h, L: int, M: int, base_off: int):
    """Per-output-phase slice weights for a rational L/M polyphase stage.

    Output ``m = g*L + r`` is ``sum_k h[k*L + (r*M)%L] * x[(r*M)//L + g*M -
    k]`` (`resample.py:102-108`). With ``x`` viewed as ``[g', M, C]`` and the
    output's group origin shifted ``base_off`` input rows into the view,
    sample ``(r*M)//L - k + base_off = q*M + i`` contributes tap ``k`` at
    slice offset ``q``, middle-lane ``i``. Returns ``{r: {q: np[M]}}``.
    """
    h = np.asarray(h, np.float32)
    kp = -(-len(h) // L)
    out = {}
    for r in range(L):
        p_r = (r * M) % L
        b_r = (r * M) // L
        rows: dict[int, np.ndarray] = {}
        for k in range(kp):
            idx = k * L + p_r
            tap = float(h[idx]) if idx < len(h) else 0.0
            if tap == 0.0:
                continue
            a = b_r - k + base_off
            if a < 0:
                raise ValueError("stage lookback exceeds its halo")
            q, i = divmod(a, M)
            rows.setdefault(q, np.zeros(M, np.float32))[i] = tap
        out[r] = rows
    return out


def _apply_stage(x3, weights, L: int, n_groups: int):
    """x3 [G, M, C] -> [n_groups * L, C] resampled output."""
    c = x3.shape[2]
    m = x3.shape[1]
    outs = []
    for r in range(L):
        acc3 = jnp.zeros((n_groups, m, c), jnp.float32)
        for q, w_np in sorted(weights[r].items()):
            acc3 = acc3 + x3[q: q + n_groups, :, :] * _weight_row(w_np, m)
        outs.append(jnp.sum(acc3, axis=1))
    y = jnp.stack(outs, axis=1)  # [n_groups, L, C]
    return y.reshape(n_groups * L, c)


# --------------------------------------------------------------------------
# TX: symbols -> channel-rate waveform
# --------------------------------------------------------------------------

def _resampled_tx_kernel(prev_ref, curr_ref, oi_ref, oq_ref, *,
                         mparams, bank, h1, sps, span, up, down, cs,
                         k_real, mlb, e_l):
    t = pl.program_id(1)
    syms = jnp.concatenate(
        [prev_ref[HALO_ROWS - e_l:, :], curr_ref[:, :]], axis=0
    ).astype(jnp.int32)  # [e_l + cs, C]
    rows = jax.lax.broadcasted_iota(jnp.int32, syms.shape, 0)
    g = t * cs + rows - e_l
    valid = (g >= 0) & (g < k_real) & (syms >= 0)
    zi, zq = _lut_map(syms, valid, mparams)
    c = zi.shape[1]

    # RRC interpolation for modem rows [M0*sps - mlb, M0*sps + cs*sps);
    # window-symbol base s0 = e_l - mlb//sps (= span: full lookback present).
    s0 = e_l - mlb // sps
    n_w = mlb // sps + cs
    kp = len(bank[0])
    wts = _stage_weights(h1, up, down, mlb)
    g_out = cs * sps // down  # output channel groups (of `up` rows) per tile
    for z, o_ref in ((zi, oi_ref), (zq, oq_ref)):
        phases = []
        for p in range(sps):
            acc = jnp.zeros((n_w, c), jnp.float32)
            for k in range(kp):
                b = bank[p][k]
                if b == 0.0:
                    continue
                acc = acc + b * z[s0 - k: s0 - k + n_w, :]
            phases.append(acc)
        wave = jnp.stack(phases, axis=1).reshape(n_w * sps, c)  # modem rows
        x3 = wave.reshape(n_w * sps // down, down, c)
        o_ref[:, :] = _apply_stage(x3, wts, up, g_out)


@functools.partial(
    jax.jit,
    static_argnames=("mparams", "bank", "h1", "sps", "span", "up", "down",
                     "cs", "k_real", "mlb", "e_l", "interpret"),
)
def _resampled_tx_tmajor(syms, mparams, bank, h1, sps, span, up, down, cs,
                         k_real, mlb, e_l, interpret):
    k_pad, c = syms.shape
    hb = HALO_ROWS
    n_halo = k_pad // hb
    r = cs // hb
    s_out = cs * sps * up // down  # channel rows per tile
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (hb, LANE),
        lambda ci, t: (jnp.clip(t * r - 1, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec((s_out, LANE), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
    n_out = k_pad * sps * up // down
    return pl.pallas_call(
        functools.partial(
            _resampled_tx_kernel, mparams=mparams, bank=bank, h1=h1,
            sps=sps, span=span, up=up, down=down, cs=cs, k_real=k_real,
            mlb=mlb, e_l=e_l,
        ),
        out_shape=[jax.ShapeDtypeStruct((n_out, c), jnp.float32)] * 2,
        grid=grid,
        in_specs=[prev, curr],
        out_specs=[out_spec] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(syms, syms)


# --------------------------------------------------------------------------
# RX: channel-rate waveform -> decisions
# --------------------------------------------------------------------------

def _composite_rx_weights(taps, h2, sps: int, up: int, down: int, d: int,
                          pb: int):
    """Collapse stage-2 resampling + matched filter + decimation into one
    periodically-time-varying channel-rate -> symbol-rate stage.

    Substituting ``y2[n] = sum_k h2[k*down + (n*up)%down] *
    yc[(n*up)//down - k]`` into ``z[m] = sum_j taps[j] * y2[m*sps + d - j]``
    gives ``z[m] = sum_o G_rho[o] * yc[(m//P)*S_g + o - pb]`` with period
    ``P = down / gcd(sps*up, down)`` (``rho = m % P``) and input group
    ``S_g = sps*up / gcd(sps*up, down)`` — the same slice-weight form as a
    plain rational stage, with *fewer* total taps than running the two
    stages separately (and no intermediate modem-rate array, which Mosaic's
    layout assignment could not handle next to a second regrouping).
    Returns ``(P, S_g, {rho: {q: np[S_g]}})``.
    """
    g = math.gcd(sps * up, down)
    P = down // g
    S_g = sps * up // g
    h2 = np.asarray(h2, np.float32)
    kp2 = -(-len(h2) // down)
    out = {}
    for rho in range(P):
        rows: dict[int, np.ndarray] = {}
        for j in range(len(taps)):
            tj = float(taps[j])
            if tj == 0.0:
                continue
            e = d - j  # y2 offset; e >= 0 since d >= len(taps) - 1
            num = (rho * sps + e) * up
            p = num % down
            base = num // down
            for k in range(kp2):
                idx = k * down + p
                h = float(h2[idx]) if idx < len(h2) else 0.0
                if h == 0.0:
                    continue
                o = base - k + pb
                if o < 0:
                    raise ValueError("composite lookback exceeds the halo")
                q, i = divmod(o, S_g)
                row = rows.setdefault(q, np.zeros(S_g, np.float32))
                row[i] += tj * h
        out[rho] = rows
    return P, S_g, out


def _resampled_rx_kernel(*refs, mparams, wts, P, S_g, sps, up, down,
                         cs, pb, soft):
    (pi_ref, ci_ref, ni_ref, pq_ref, cq_ref, nq_ref, *out_refs) = refs
    t = pl.program_id(1)
    s_in = cs * sps * up // down  # channel rows per tile

    # Stitch the channel window [C0 - pb, C0 + s_in + nb); zero the
    # pre-stream part of the prev window (t=0: the resampler's zero history).
    def window(p_ref, c_ref, n_ref):
        y = jnp.concatenate([p_ref[:, :], c_ref[:, :], n_ref[:, :]], axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
        glob = t * s_in - pb + rows
        return jnp.where(glob >= 0, y, 0.0)

    yc_i = window(pi_ref, ci_ref, ni_ref)
    yc_q = window(pq_ref, cq_ref, nq_ref)
    c = yc_i.shape[1]
    n_c = yc_i.shape[0]  # pb + s_in + nb, multiple of S_g

    # One composite channel-rate -> symbol-rate stage per rail.
    rails = []
    for yc in (yc_i, yc_q):
        yc3 = yc.reshape(n_c // S_g, S_g, c)
        z = _apply_stage(yc3, wts, P, cs // P)  # [cs, C]
        rails.append(z)
    if soft:
        out_refs[0][:, :] = rails[0]
        out_refs[1][:, :] = rails[1]
    else:
        out_refs[0][:, :] = _lut_slice(rails[0], rails[1], mparams).astype(
            out_refs[0].dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mparams", "h2", "taps", "sps", "span", "up", "down",
                     "cs", "d", "pb", "nb", "k_pad", "interpret", "soft"),
)
def _resampled_rx_tmajor(wave_i, wave_q, mparams, h2, taps, sps, span, up,
                         down, cs, d, pb, nb, k_pad, interpret, soft):
    n_rows, c = wave_i.shape
    s_in = cs * sps * up // down
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((s_in, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    rp = s_in // pb
    prev = pl.BlockSpec(
        (pb, LANE),
        lambda ci, t: (jnp.clip(t * rp - 1, 0, n_rows // pb - 1), ci),
        memory_space=pltpu.VMEM,
    )
    rn = s_in // nb
    nxt = pl.BlockSpec(
        (nb, LANE),
        lambda ci, t: (jnp.clip((t + 1) * rn, 0, n_rows // nb - 1), ci),
        memory_space=pltpu.VMEM,
    )
    n_points = len(mparams)
    o_dtype = jnp.int8 if n_points <= 127 else jnp.int32
    P, S_g, wts = _composite_rx_weights(taps, h2, sps, up, down, d, pb)
    out_spec = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
    if soft:
        out_shape = [jax.ShapeDtypeStruct((k_pad, c), jnp.float32)] * 2
        out_specs = [out_spec] * 2
    else:
        out_shape = jax.ShapeDtypeStruct((k_pad, c), o_dtype)
        out_specs = out_spec
    return pl.pallas_call(
        functools.partial(
            _resampled_rx_kernel, mparams=mparams, wts=wts, P=P, S_g=S_g,
            sps=sps, up=up, down=down, cs=cs, pb=pb, soft=soft,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[prev, curr, nxt, prev, curr, nxt],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(wave_i, wave_i, wave_i, wave_q, wave_q, wave_q)


# --------------------------------------------------------------------------
# wrappers
# --------------------------------------------------------------------------

def _pick_chunk(sps: int, down: int, chunk_sym: int | None) -> int:
    """Smallest valid tile >= the request: multiple of HALO_ROWS with
    ``cs * sps % down == 0``."""
    want = chunk_sym or 128
    step = HALO_ROWS * down // math.gcd(HALO_ROWS * sps, down)
    cs = _roundup(max(want, HALO_ROWS), step)
    return cs


def _pick_window(s_in: int, need: int, up: int, other: int) -> int:
    """Halo window size: multiple of HALO_ROWS dividing the tile stride,
    covering ``need`` rows, with ``(window + other) % up == 0`` so the
    stitched window reshapes into groups of ``up``."""
    for w in range(HALO_ROWS, s_in + 1, HALO_ROWS):
        if s_in % w == 0 and w >= need and (w + other) % up == 0:
            return w
    raise ValueError(
        f"no halo window for stride {s_in}, need {need}, up {up}")


def fused_resampled_tx(
    symbols: jnp.ndarray,
    lut: np.ndarray,
    rrc: np.ndarray,
    sps: int,
    span: int,
    up: int,
    down: int,
    taps1: np.ndarray,
    n_modem: int,
    chunk_sym: int | None = None,
    interpret: bool | None = None,
):
    """``symbols [..., K]`` -> channel-rate I/Q ``[..., n_modem*up//down]``.

    ``n_modem`` is the modem-rate baseband length the staged chain would
    produce (:meth:`ResampledChain._padded_len`); the kernel synthesizes
    pulse shaping and stage-1 resampling in VMEM and writes only the
    channel-rate waveform. Matches :meth:`ResampledChain.tx` to f32
    reassociation.
    """
    lut = np.asarray(lut, np.float32)
    mparams = tuple((float(i), float(q)) for i, q in lut)
    taps = _as_f32(rrc)
    if len(taps) != span * sps + 1:
        raise ValueError("rrc taps length must equal span*sps + 1")
    h1 = np.asarray(taps1, np.float32)
    kp1 = -(-len(h1) // up)
    if n_modem % down:
        raise ValueError("n_modem must divide by down")
    cs = _pick_chunk(sps, down, chunk_sym)
    # modem lookback below the tile base: stage-1 taps, aligned to both the
    # symbol grid (sps) and the stage-1 input grouping (down)
    mlb = _roundup(kp1 - 1, sps * down // math.gcd(sps, down))
    e_l = mlb // sps + span
    if e_l > HALO_ROWS:
        raise ValueError(f"symbol lookback {e_l} exceeds the {HALO_ROWS}-row "
                         "halo; use shorter resampler taps")
    if interpret is None:
        interpret = _auto_interpret()
    bank = _phase_bank(taps, sps)

    batch_shape = symbols.shape[:-1]
    k = symbols.shape[-1]
    flat = symbols.reshape((-1, k))
    c = flat.shape[0]
    k_need = _roundup(n_modem, sps) // sps
    k_pad = _roundup(k_need, cs)
    io_dtype = jnp.int8 if len(lut) <= 127 else jnp.int32
    st = jnp.pad(flat.T.astype(io_dtype), ((0, k_pad - k), (0, (-c) % LANE)))
    oi, oq = _resampled_tx_tmajor(
        st, mparams,
        tuple(tuple(float(v) for v in row) for row in bank),
        tuple(float(v) for v in h1),
        sps, span, up, down, cs, k, mlb, e_l, interpret,
    )
    n_out = n_modem * up // down
    shaped = [o[:n_out, :c].T.reshape(batch_shape + (n_out,))
              for o in (oi, oq)]
    return shaped[0], shaped[1]


def fused_resampled_rx(
    wave,
    n_symbols: int,
    lut: np.ndarray,
    rrc: np.ndarray,
    sps: int,
    span: int,
    up: int,
    down: int,
    taps2: np.ndarray,
    delay: int,
    chunk_sym: int | None = None,
    interpret: bool | None = None,
    soft: bool = False,
):
    """Channel-rate ``(i, q)`` -> int32 decisions ``[..., n_symbols]``.

    ``delay`` is the chain's total decision delay in modem-rate samples
    (:attr:`ResampledChain.delay` = ``span*sps + resample_delay``).
    Decisions equal :meth:`ResampledChain.rx` in practice. ``soft=True``
    returns the matched-filter decision-point ``(i, q)`` float32 instead,
    for the LLR layer.
    """
    lut = np.asarray(lut, np.float32)
    mparams = tuple((float(i), float(q)) for i, q in lut)
    taps = _as_f32(rrc)
    h2 = np.asarray(taps2, np.float32)
    kp2 = -(-len(h2) // down)
    if delay < len(taps) - 1:
        raise ValueError("delay must cover the matched filter span")
    cs = _pick_chunk(sps, down, chunk_sym)
    s_in = cs * sps * up // down
    # channel window: prev halo covers the composite stage's lookback; next
    # halo sized so its highest slice (group units) stays in the window
    pb = _pick_window(s_in, kp2 - 1, 1, 0)
    P, S_g, wts = _composite_rx_weights(
        tuple(float(v) for v in taps), tuple(float(v) for v in h2),
        sps, up, down, delay, pb)
    if cs % P:
        raise ValueError(f"chunk {cs} must divide by the output period {P}")
    q_max = max(max(rows) for rows in wts.values() if rows)
    need_next = (q_max + cs // P) * S_g - pb - s_in
    nb = _pick_window(s_in, max(need_next, 1), S_g, pb + s_in)
    if interpret is None:
        interpret = _auto_interpret()

    wi, wq = wave
    batch_shape = wi.shape[:-1]
    n = wi.shape[-1]
    need_rows = ((delay + (n_symbols - 1) * sps) * up) // down + 1
    if n < need_rows:
        raise ValueError("waveform shorter than the last decision's reach")
    k_pad = _roundup(n_symbols, cs)
    rows_pad = k_pad * sps * up // down + nb  # next-window overrun room
    prepped = []
    for w in (wi, wq):
        flat = w.reshape((-1, n))
        c = flat.shape[0]
        wt = flat.T.astype(jnp.float32)
        wt = jnp.pad(wt[: min(n, rows_pad), :],
                     ((0, max(0, rows_pad - n)), (0, (-c) % LANE)))
        prepped.append(wt)
    out = _resampled_rx_tmajor(
        prepped[0], prepped[1], mparams,
        tuple(float(v) for v in h2), tuple(float(v) for v in taps),
        sps, span, up, down, cs, delay, pb, nb, k_pad, interpret, soft,
    )
    if soft:
        return tuple(
            o[:n_symbols, :c].T.reshape(batch_shape + (n_symbols,))
            for o in out)
    return (out[:n_symbols, :c].T.reshape(batch_shape + (n_symbols,))
            .astype(jnp.int32))

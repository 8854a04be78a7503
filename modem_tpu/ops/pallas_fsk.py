"""Fused FSK-family chain (BFSK/MFSK/CPFSK) as one Pallas TPU kernel.

Division of labor with the XLA side: phase *continuity* (the reference's
``update()`` accumulators, `bfsk.rs:43-55` / `mfsk.rs:68-75`) has unbounded
lookback, so the symbol-rate integer phase program (``fnum``, ``pnum`` — see
:class:`modem_tpu.models.base.PhaseProgram`) is computed by the existing
scheme code in XLA (a cheap prefix sum over symbols). The *sample-rate* heavy
lifting is fused here per (time x channels) tile, VMEM-resident:

    integer phase -> cos/sin waveform synthesis (the modulated signal)
    -> [optional in-kernel AWGN]
    -> FM discriminator  dphi[s] = angle(y[s] * conj(y[s-1]))  from I/Q
    -> per-symbol interior mean (guard samples skipped)
    -> nearest-frequency decision

Tile halo: the discriminator needs exactly ONE extra sample (the previous
symbol's last), synthesized locally from a one-row halo of (fnum, pnum) —
unlike the RRC chain there is no filter span to exchange.

HBM traffic: two int32 symbol-rate tensors in, one out (~1 B/sample at
sps=8); the waveform never leaves VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TWO_PI
from .pallas_chain import HALO_ROWS, LANE, _auto_interpret, _gauss_pair

DEFAULT_CHUNK_SYM = 256


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Four-quadrant arctangent built from a degree-9 minimax polynomial
    (Mosaic has no atan2/atan lowering). Max error ~1e-5 rad — far below
    the discriminator's decision spacing (~0.06 rad at the CLI configs)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.float32(1e-30))
    s = t * t
    # atan(t), t in [0, 1]
    r = t * (0.99997726
             + s * (-0.33262347
                    + s * (0.19354346
                           + s * (-0.11643287
                                  + s * (0.05265332
                                         + s * -0.01172120)))))
    pi = jnp.float32(np.pi)
    r = jnp.where(ay > ax, pi * 0.5 - r, r)
    r = jnp.where(x < 0, pi - r, r)
    return jnp.where(y < 0, -r, r)


def _fsk_kernel(
    *refs,
    coefs: tuple, den: int, sps: int, amp: float, qshift: float,
    time_offset: int, guard: int, cs: int, sigma: float | None,
    interpret: bool = False,
):
    """coefs: per-candidate-symbol fnum table (static). Decisions pick the
    candidate whose phase increment 2*pi*fnum/den is nearest the measured
    per-symbol mean discriminator output."""
    if sigma is None:
        fprev_ref, fcurr_ref, pprev_ref, pcurr_ref, o_ref = refs
    else:
        seed_ref, fprev_ref, fcurr_ref, pprev_ref, pcurr_ref, o_ref = refs
    t = pl.program_id(1)

    # One-symbol halo: append the previous symbol's program row in front.
    fnum = jnp.concatenate(
        [fprev_ref[HALO_ROWS - 1:, :], fcurr_ref[:, :]], axis=0
    )  # [cs+1, C]
    pnum = jnp.concatenate(
        [pprev_ref[HALO_ROWS - 1:, :], pcurr_ref[:, :]], axis=0
    )

    # Synthesize samples for symbols -1..cs-1 (the halo symbol's last sample
    # is the discriminator's s-1 for the tile's first sample). Sample s of
    # symbol row r (global symbol g = t*cs + r - 1):
    #   tmod = (g*sps + j + time_offset) mod den
    #   u = (fnum*tmod + pnum) mod den ; theta = 2*pi*u/den
    n_rows = cs + 1
    full = n_rows * sps
    rows = jax.lax.broadcasted_iota(jnp.int32, (full, fnum.shape[1]), 0)
    g = (t * cs - 1) * sps + rows + time_offset
    # g can be negative only in tile 0's halo row, whose samples are never
    # used (guard >= 1 skips them and tile 0's first dphi is masked); clamp
    # to keep the modulo positive.
    tmod = jnp.maximum(g, 0) % den
    # symbol-rate -> sample-rate hold via broadcast+reshape (jnp.repeat
    # lowers to scatter, which Mosaic does not implement)
    c_lane = fnum.shape[1]
    f_s = jnp.broadcast_to(fnum[:, None, :], (n_rows, sps, c_lane)
                           ).reshape(full, c_lane)
    p_s = jnp.broadcast_to(pnum[:, None, :], (n_rows, sps, c_lane)
                           ).reshape(full, c_lane)
    u = (f_s * tmod + p_s) % den
    theta = u.astype(jnp.float32) * jnp.float32(TWO_PI / den)
    wi = jnp.float32(amp) * jnp.cos(theta)
    wq = jnp.float32(amp) * jnp.cos(theta + jnp.float32(qshift))

    if sigma is not None:
        tile_key = (seed_ref[0, 0]
                    + pl.program_id(0) * 1000003
                    + pl.program_id(1) * 7919)
        if not interpret:
            pltpu.prng_seed(tile_key)
        gi, gq = _gauss_pair(wi.shape, interpret, tile_key)
        wi = wi + sigma * gi
        wq = wq + sigma * gq

    # Discriminator on I/Q planes: the increment *into* sample s is
    # D[s] = atan2 of y[s] * conj(y[s-1]); D[0] := 0 (never used, guard>=1).
    # Built with a one-row zero pad so D has exactly (cs+1)*sps rows and
    # reshapes to [symbol, sample-in-symbol, C] — Mosaic has no strided
    # slicing, so the per-symbol grouping must be a reshape, not a stride.
    ip, qp = wi[:-1, :], wq[:-1, :]
    ci, cq = wi[1:, :], wq[1:, :]
    dphi = _atan2(cq * ip - ci * qp, ci * ip + cq * qp)  # [full-1, C]
    d_al = jnp.concatenate(
        [jnp.zeros((1, dphi.shape[1]), jnp.float32), dphi], axis=0
    ).reshape(n_rows, sps, dphi.shape[1])
    # Interior mean over sample positions j in [guard, sps) of real symbols
    # (rows 1..cs; row 0 is the halo symbol).
    acc = jnp.sum(d_al[1:, guard:, :], axis=1)
    mean_f = acc * jnp.float32(1.0 / (sps - guard))

    best = jnp.zeros((cs, dphi.shape[1]), jnp.int32)
    best_d = jnp.full((cs, dphi.shape[1]), np.inf, jnp.float32)
    for m, fn in enumerate(coefs):
        target = jnp.float32(TWO_PI * fn / den)
        dist = jnp.abs(mean_f - target)
        best = jnp.where(dist < best_d, m, best)
        best_d = jnp.minimum(dist, best_d)
    o_ref[:, :] = best


@functools.partial(
    jax.jit,
    static_argnames=("coefs", "den", "sps", "amp", "qshift", "time_offset",
                     "guard", "cs", "interpret", "sigma"),
)
def _fsk_tmajor(fnum, pnum, seed, coefs, den, sps, amp, qshift, time_offset,
                guard, cs, interpret, sigma):
    k_pad, c = fnum.shape
    hb = HALO_ROWS
    r = cs // hb
    n_halo = k_pad // hb
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (hb, LANE), lambda ci, t: (jnp.clip(t * r - 1, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    in_specs = [prev, curr, prev, curr]
    args = (fnum, fnum, pnum, pnum)
    if sigma is not None:
        in_specs = [pl.BlockSpec((1, 1), lambda ci, t: (0, 0),
                                 memory_space=pltpu.SMEM)] + in_specs
        args = (seed.reshape(1, 1).astype(jnp.int32),) + args
    return pl.pallas_call(
        functools.partial(
            _fsk_kernel, coefs=coefs, den=den, sps=sps, amp=amp,
            qshift=qshift, time_offset=time_offset, guard=guard, cs=cs,
            sigma=sigma, interpret=interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, c), jnp.int32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)


def fsk_decide_from_program(
    fnum: jnp.ndarray,
    pnum: jnp.ndarray,
    coefs: tuple,
    den: int,
    sps: int,
    amp: float,
    qshift: float,
    guard: int = 1,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
    sigma: float | None = None,
    seed=None,
) -> jnp.ndarray:
    """Kernel entry below the scheme layer: integer phase program
    ``fnum``/``pnum`` ``[..., K]`` -> decided symbols ``[..., K]``.

    Used directly by the time-sharded path, where each device folds its
    global sample offset ``S0`` into ``pnum`` (``theta = 2*pi*(fnum*(t_local
    + S0) + pnum)/den`` == local-time evaluation with ``pnum + fnum*S0``).
    """
    from ..tx import REF_TIME_OFFSET

    if guard < 1:
        raise ValueError("fused FSK needs guard >= 1")
    if guard >= sps:
        raise ValueError("guard leaves no interior samples per symbol")
    if interpret is None:
        interpret = _auto_interpret()
    batch_shape = fnum.shape[:-1]
    k = fnum.shape[-1]
    fl = fnum.reshape((-1, k))
    plo = pnum.reshape((-1, k))
    c = fl.shape[0]
    k_pad = (-k) % chunk_sym
    c_pad = (-c) % LANE
    fpad = jnp.pad(fl.T, ((0, k_pad), (0, c_pad)))
    ppad = jnp.pad(plo.T, ((0, k_pad), (0, c_pad)))
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    out = _fsk_tmajor(
        fpad.astype(jnp.int32), ppad.astype(jnp.int32),
        jnp.asarray(seed, jnp.int32),
        coefs, den, sps, amp, qshift, REF_TIME_OFFSET,
        guard, chunk_sym, interpret,
        None if sigma is None else float(sigma),
    )
    return out[:k, :c].T.reshape(batch_shape + (k,))


def fsk_noise_sigma(amp: float, snr_db: float) -> float:
    """Per-rail noise sigma for a per-complex-sample SNR of ``snr_db``
    (A^2 / (2*sigma^2) per rail) — the one encoding of the FSK noise
    convention, shared by the single-device and time-sharded paths."""
    return amp / math.sqrt(2.0) * 10.0 ** (-snr_db / 20.0)


def fsk_coef_table(scheme) -> tuple:
    """Static per-candidate-symbol fnum table, computed in NumPy (a jnp
    probe would become a tracer under an outer jit); validates the
    discriminator Nyquist bound."""
    from ..models.fsk import BFSK, CPFSK, MFSK

    m = 1 << scheme.bits_per_symbol
    s = np.arange(m)
    if isinstance(scheme, BFSK):
        table = s * scheme.dev
    elif isinstance(scheme, MFSK):
        coef = 2 * s if scheme.symbol_map == "increase" else 2 * s - scheme.max_sym
        table = coef * scheme.dev
    elif isinstance(scheme, CPFSK):
        table = 2 * s * scheme.dev_hz
    else:
        raise TypeError(f"fused FSK does not support {type(scheme).__name__}")
    coefs = tuple(int(v) for v in table)
    if max(abs(v) for v in coefs) * 2 >= scheme.den:
        raise ValueError(
            "discriminator Nyquist violated: |fnum| must stay below den/2 "
            f"(max {max(abs(v) for v in coefs)} vs den {scheme.den}) — the "
            "phase increment would alias (see ops/slicer.py fsk_slice)"
        )
    return coefs


def fused_fsk_chain(
    symbols: jnp.ndarray,
    scheme,
    rates,
    guard: int = 1,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
    snr_db: float | None = None,
    seed=None,
) -> jnp.ndarray:
    """FSK loopback: ``[..., K]`` int32 symbols -> decided symbols.

    ``scheme``: a BFSK/MFSK/CPFSK instance (slots_per_symbol == 1, constant
    amplitude). ``snr_db`` is per-complex-sample SNR (A^2 / (2*sigma^2) per
    rail); noise is drawn in-kernel on the synthesized waveform. Requires
    ``guard >= 1`` (the discriminator's first increment of each symbol spans
    the boundary).
    """
    from ..models.base import PhaseProgram

    coefs = fsk_coef_table(scheme)
    amp = float(scheme.amplitude)  # jit-safe (static, not from the tracer)

    # Symbol-rate phase program via the scheme's own (prefix-sum) compiler.
    prog, _ = scheme.program(
        symbols, scheme.init_state(symbols.shape[:-1]), rates, 0
    )
    if not isinstance(prog, PhaseProgram) or prog.slots_per_symbol != 1:
        raise TypeError("fused FSK supports slots_per_symbol == 1 schemes")

    sigma = None
    if snr_db is not None:
        sigma = fsk_noise_sigma(amp, snr_db)
    return fsk_decide_from_program(
        prog.fnum, prog.pnum, coefs, prog.den, rates.samples_per_symbol,
        amp, float(prog.qshift), guard, chunk_sym, interpret, sigma, seed,
    )


# -- MSK: half-sine staggered slots, per-slot discriminator sign --------------

def _msk_kernel(
    *refs,
    den: int, spb: int, amp: float, time_offset: int, guard: int, cs: int,
    sigma: float | None, interpret: bool = False,
):
    """MSK variant: per-*slot* (half-symbol) sign planes s0/s1 in, per-slot
    discriminator sign out. Within a slot the baseband
    ``y = A*(s0*cos(th) - j*s1*sin(th))``, ``th = 2*pi*t/den`` (`msk.rs:12-35`)
    is a pure tone of frequency ``-s0*s1*pi/(2*spb)``, so the interior mean of
    the discriminator output has sign ``-s0*s1`` — the kernel emits that sign
    bit (1 where negative); the telescoping slot-product decode back to bits
    runs outside at slot rate (`chain.MskChain`)."""
    if sigma is None:
        s0prev_ref, s0curr_ref, s1prev_ref, s1curr_ref, o_ref = refs
    else:
        seed_ref, s0prev_ref, s0curr_ref, s1prev_ref, s1curr_ref, o_ref = refs
    t = pl.program_id(1)

    s0 = jnp.concatenate(
        [s0prev_ref[HALO_ROWS - 1:, :], s0curr_ref[:, :]], axis=0
    )  # [cs+1, C] slot signs (+-1)
    s1 = jnp.concatenate(
        [s1prev_ref[HALO_ROWS - 1:, :], s1curr_ref[:, :]], axis=0
    )

    n_rows = cs + 1
    full = n_rows * spb
    c_lane = s0.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (full, c_lane), 0)
    g = (t * cs - 1) * spb + rows + time_offset
    u = jnp.maximum(g, 0) % den
    theta = u.astype(jnp.float32) * jnp.float32(TWO_PI / den)
    s0_s = jnp.broadcast_to(s0[:, None, :], (n_rows, spb, c_lane)
                            ).reshape(full, c_lane).astype(jnp.float32)
    s1_s = jnp.broadcast_to(s1[:, None, :], (n_rows, spb, c_lane)
                            ).reshape(full, c_lane).astype(jnp.float32)
    wi = jnp.float32(amp) * s0_s * jnp.cos(theta)
    wq = -jnp.float32(amp) * s1_s * jnp.sin(theta)

    if sigma is not None:
        tile_key = (seed_ref[0, 0]
                    + pl.program_id(0) * 1000003
                    + pl.program_id(1) * 7919)
        if not interpret:
            pltpu.prng_seed(tile_key)
        gi, gq = _gauss_pair(wi.shape, interpret, tile_key)
        wi = wi + sigma * gi
        wq = wq + sigma * gq

    ip, qp = wi[:-1, :], wq[:-1, :]
    ci, cq = wi[1:, :], wq[1:, :]
    dphi = _atan2(cq * ip - ci * qp, ci * ip + cq * qp)
    d_al = jnp.concatenate(
        [jnp.zeros((1, dphi.shape[1]), jnp.float32), dphi], axis=0
    ).reshape(n_rows, spb, dphi.shape[1])
    acc = jnp.sum(d_al[1:, guard:, :], axis=1)
    o_ref[:, :] = (acc < 0).astype(jnp.int32)  # 1 where c = -1


@functools.partial(
    jax.jit,
    static_argnames=("den", "spb", "amp", "time_offset", "guard", "cs",
                     "interpret", "sigma"),
)
def _msk_tmajor(s0, s1, seed, den, spb, amp, time_offset, guard, cs,
                interpret, sigma):
    k_pad, c = s0.shape
    hb = HALO_ROWS
    r = cs // hb
    n_halo = k_pad // hb
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (hb, LANE), lambda ci, t: (jnp.clip(t * r - 1, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    in_specs = [prev, curr, prev, curr]
    args = (s0, s0, s1, s1)
    if sigma is not None:
        in_specs = [pl.BlockSpec((1, 1), lambda ci, t: (0, 0),
                                 memory_space=pltpu.SMEM)] + in_specs
        args = (seed.reshape(1, 1).astype(jnp.int32),) + args
    return pl.pallas_call(
        functools.partial(
            _msk_kernel, den=den, spb=spb, amp=amp, time_offset=time_offset,
            guard=guard, cs=cs, sigma=sigma, interpret=interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, c), jnp.int32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)


def fused_msk_slots(
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    spb: int,
    amp: float,
    guard: int = 1,
    chunk_slots: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
    snr_db: float | None = None,
    seed=None,
) -> jnp.ndarray:
    """Fused MSK synthesis + discriminator: per-slot staggered sign planes
    ``s0``/``s1`` ``[..., 2K]`` (values +-1) -> per-slot discriminator sign
    bits ``[..., 2K]`` (1 where the slot tone is negative, i.e. c = -1).

    ``snr_db`` is per-complex-sample SNR (same convention as the FSK kernel);
    noise is drawn in-kernel on the synthesized waveform.
    """
    from ..tx import REF_TIME_OFFSET

    if guard < 1:
        raise ValueError("fused MSK needs guard >= 1")
    if guard >= spb:
        raise ValueError("guard leaves no interior samples per slot")
    if interpret is None:
        interpret = _auto_interpret()
    den = 4 * spb  # envelope period (`models/fsk.py` MSK: den = 2*sps)
    batch_shape = s0.shape[:-1]
    k = s0.shape[-1]
    fl0 = s0.reshape((-1, k))
    fl1 = s1.reshape((-1, k))
    c = fl0.shape[0]
    k_pad = (-k) % chunk_slots
    c_pad = (-c) % LANE
    p0 = jnp.pad(fl0.T.astype(jnp.int32), ((0, k_pad), (0, c_pad)))
    p1 = jnp.pad(fl1.T.astype(jnp.int32), ((0, k_pad), (0, c_pad)))
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    sigma = None if snr_db is None else fsk_noise_sigma(amp, snr_db)
    out = _msk_tmajor(
        p0, p1, jnp.asarray(seed, jnp.int32), den, spb, float(amp),
        REF_TIME_OFFSET, guard, chunk_slots, interpret, sigma,
    )
    return out[:k, :c].T.reshape(batch_shape + (k,))


# -- one-way kernels: synthesis-only TX / discriminator-only RX ---------------

def _fsk_tx_kernel(fcurr_ref, pcurr_ref, oi_ref, oq_ref, *,
                   den, sps, amp, qshift, time_offset, cs):
    """Synthesis half of :func:`_fsk_kernel`: integer phase program ->
    baseband I/Q waveform rows (no halo — the program is per-symbol)."""
    t = pl.program_id(1)
    fnum = fcurr_ref[:, :]
    pnum = pcurr_ref[:, :]
    c_lane = fnum.shape[1]
    full = cs * sps
    rows = jax.lax.broadcasted_iota(jnp.int32, (full, c_lane), 0)
    g = t * full + rows + time_offset
    tmod = g % den
    f_s = jnp.broadcast_to(fnum[:, None, :], (cs, sps, c_lane)
                           ).reshape(full, c_lane)
    p_s = jnp.broadcast_to(pnum[:, None, :], (cs, sps, c_lane)
                           ).reshape(full, c_lane)
    u = (f_s * tmod + p_s) % den
    theta = u.astype(jnp.float32) * jnp.float32(TWO_PI / den)
    oi_ref[:, :] = jnp.float32(amp) * jnp.cos(theta)
    oq_ref[:, :] = jnp.float32(amp) * jnp.cos(theta + jnp.float32(qshift))


@functools.partial(
    jax.jit,
    static_argnames=("den", "sps", "amp", "qshift", "time_offset", "cs",
                     "interpret"),
)
def _fsk_tx_tmajor(fnum, pnum, den, sps, amp, qshift, time_offset, cs,
                   interpret):
    k_pad, c = fnum.shape
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((cs * sps, LANE), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _fsk_tx_kernel, den=den, sps=sps, amp=amp, qshift=qshift,
            time_offset=time_offset, cs=cs,
        ),
        out_shape=[jax.ShapeDtypeStruct((k_pad * sps, c), jnp.float32)] * 2,
        grid=grid,
        in_specs=[curr, curr],
        out_specs=[out_spec] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(fnum, pnum)


def fused_fsk_tx(
    fnum: jnp.ndarray,
    pnum: jnp.ndarray,
    den: int,
    sps: int,
    amp: float,
    qshift: float,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
):
    """Integer phase program ``[..., K]`` -> baseband ``(i, q)``
    ``[..., K*sps]`` — the synthesis half of the fused FSK chain, written
    once to HBM (the `Modulator.baseband` output, `modulator.rs:85-100`,
    at the write roofline). Covers every ``PhaseProgram`` scheme (BFSK,
    MFSK, CPFSK; MSK uses :func:`fused_msk_tx`)."""
    from ..tx import REF_TIME_OFFSET

    if interpret is None:
        interpret = _auto_interpret()
    batch_shape = fnum.shape[:-1]
    k = fnum.shape[-1]
    fl = fnum.reshape((-1, k))
    plo = pnum.reshape((-1, k))
    c = fl.shape[0]
    k_pad = (-k) % chunk_sym
    c_pad = (-c) % LANE
    fpad = jnp.pad(fl.T.astype(jnp.int32), ((0, k_pad), (0, c_pad)))
    ppad = jnp.pad(plo.T.astype(jnp.int32), ((0, k_pad), (0, c_pad)))
    oi, oq = _fsk_tx_tmajor(fpad, ppad, den, sps, float(amp), float(qshift),
                            REF_TIME_OFFSET, chunk_sym, interpret)
    n = k * sps
    return (oi[:n, :c].T.reshape(batch_shape + (n,)),
            oq[:n, :c].T.reshape(batch_shape + (n,)))


def _disc_mean_kernel(icurr_ref, qcurr_ref, o_ref, *, group, guard, cs):
    """Discriminator half: I/Q waveform rows -> per-group interior mean of
    the instantaneous frequency. With ``guard >= 1`` every used increment
    lies inside its group, so tiles need no sample halo at all."""
    wi = icurr_ref[:, :]  # [cs*group, C]
    wq = qcurr_ref[:, :]
    ip, qp = wi[:-1, :], wq[:-1, :]
    ci, cq = wi[1:, :], wq[1:, :]
    dphi = _atan2(cq * ip - ci * qp, ci * ip + cq * qp)
    d_al = jnp.concatenate(
        [jnp.zeros((1, dphi.shape[1]), jnp.float32), dphi], axis=0
    ).reshape(cs, group, dphi.shape[1])
    acc = jnp.sum(d_al[:, guard:, :], axis=1)
    o_ref[:, :] = acc * jnp.float32(1.0 / (group - guard))


@functools.partial(
    jax.jit,
    static_argnames=("group", "guard", "cs", "interpret"),
)
def _disc_mean_tmajor(wi, wq, group, guard, cs, interpret):
    n_pad, c = wi.shape
    k_pad = n_pad // group
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs * group, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_disc_mean_kernel, group=group, guard=guard, cs=cs),
        out_shape=jax.ShapeDtypeStruct((k_pad, c), jnp.float32),
        grid=grid,
        in_specs=[curr, curr],
        out_specs=pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(wi, wq)


def fused_discriminator_means(
    i: jnp.ndarray,
    q: jnp.ndarray,
    group: int,
    guard: int = 1,
    chunk_groups: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Baseband ``(i, q) [..., N]`` -> per-group mean instantaneous
    frequency ``[..., N//group]`` (rad/sample) — the discriminator half of
    the FSK/MSK receivers, one waveform read. ``group`` is ``sps`` for the
    FSK family, the half-symbol slot for MSK. Matches
    ``fsk_symbol_means(fm_discriminate(i, q), group, guard)`` to the
    polynomial-atan2 tolerance (~1e-5 rad); hard decisions (nearest
    frequency / sign) are cheap symbol-rate XLA on top."""
    if guard < 1:
        raise ValueError("the discriminator needs guard >= 1")
    if guard >= group:
        raise ValueError("guard leaves no interior samples per group")
    if interpret is None:
        interpret = _auto_interpret()
    batch_shape = i.shape[:-1]
    n = i.shape[-1]
    if n % group:
        raise ValueError("waveform length must be a whole number of groups")
    k = n // group
    fl_i = i.reshape((-1, n))
    fl_q = q.reshape((-1, n))
    c = fl_i.shape[0]
    k_pad = (-k) % chunk_groups
    c_pad = (-c) % LANE
    wi = jnp.pad(fl_i.T.astype(jnp.float32), ((0, k_pad * group), (0, c_pad)))
    wq = jnp.pad(fl_q.T.astype(jnp.float32), ((0, k_pad * group), (0, c_pad)))
    out = _disc_mean_tmajor(wi, wq, group, guard, chunk_groups, interpret)
    return out[:k, :c].T.reshape(batch_shape + (k,))


def _msk_tx_kernel(s0curr_ref, s1curr_ref, oi_ref, oq_ref, *,
                   den, spb, amp, time_offset, cs):
    """Synthesis half of :func:`_msk_kernel`: per-slot sign planes ->
    half-sine baseband (`msk.rs:12-35`)."""
    t = pl.program_id(1)
    s0 = s0curr_ref[:, :]
    s1 = s1curr_ref[:, :]
    c_lane = s0.shape[1]
    full = cs * spb
    rows = jax.lax.broadcasted_iota(jnp.int32, (full, c_lane), 0)
    g = t * full + rows + time_offset
    u = g % den
    theta = u.astype(jnp.float32) * jnp.float32(TWO_PI / den)
    s0_s = jnp.broadcast_to(s0[:, None, :], (cs, spb, c_lane)
                            ).reshape(full, c_lane).astype(jnp.float32)
    s1_s = jnp.broadcast_to(s1[:, None, :], (cs, spb, c_lane)
                            ).reshape(full, c_lane).astype(jnp.float32)
    oi_ref[:, :] = jnp.float32(amp) * s0_s * jnp.cos(theta)
    oq_ref[:, :] = -jnp.float32(amp) * s1_s * jnp.sin(theta)


@functools.partial(
    jax.jit,
    static_argnames=("den", "spb", "amp", "time_offset", "cs", "interpret"),
)
def _msk_tx_tmajor(s0, s1, den, spb, amp, time_offset, cs, interpret):
    k_pad, c = s0.shape
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((cs * spb, LANE), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _msk_tx_kernel, den=den, spb=spb, amp=amp,
            time_offset=time_offset, cs=cs,
        ),
        out_shape=[jax.ShapeDtypeStruct((k_pad * spb, c), jnp.float32)] * 2,
        grid=grid,
        in_specs=[curr, curr],
        out_specs=[out_spec] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(s0, s1)


def fused_msk_tx(
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    spb: int,
    amp: float,
    chunk_slots: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
):
    """Staggered slot sign planes ``[..., 2K]`` (+-1) -> baseband ``(i, q)``
    ``[..., 2K*spb]`` — the MSK synthesis half, one HBM write."""
    from ..tx import REF_TIME_OFFSET

    if interpret is None:
        interpret = _auto_interpret()
    den = 4 * spb
    batch_shape = s0.shape[:-1]
    k = s0.shape[-1]
    fl0 = s0.reshape((-1, k))
    fl1 = s1.reshape((-1, k))
    c = fl0.shape[0]
    k_pad = (-k) % chunk_slots
    c_pad = (-c) % LANE
    p0 = jnp.pad(fl0.T.astype(jnp.int32), ((0, k_pad), (0, c_pad)))
    p1 = jnp.pad(fl1.T.astype(jnp.int32), ((0, k_pad), (0, c_pad)))
    oi, oq = _msk_tx_tmajor(p0, p1, den, spb, float(amp), REF_TIME_OFFSET,
                            chunk_slots, interpret)
    n = k * spb
    return (oi[:n, :c].T.reshape(batch_shape + (n,)),
            oq[:n, :c].T.reshape(batch_shape + (n,)))

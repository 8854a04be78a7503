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

Two constellation paths share the filter core:

* ``lut`` — arbitrary constellations up to 64 points; the gather is a select
  cascade and slicing is a min-distance loop (O(M) VPU passes).
* ``qam`` — square QAM of any even bits-per-symbol (incl. 256-QAM):
  map and slice are *algebraic* in the bit halves (`qam.rs:32-38` grid
  levels + rotation, inverted exactly for slicing), O(1) in M.

Numerics match the staged chain to f32 reassociation; decisions agree exactly
in practice (tested).
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

LANE = 128
DEFAULT_CHUNK_SYM = 256


def _auto_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# -- constellation map / slice pairs ----------------------------------------

def _lut_map(syms, valid, lut):
    zi = jnp.zeros(syms.shape, jnp.float32)
    zq = jnp.zeros(syms.shape, jnp.float32)
    for m, (ci, cq) in enumerate(lut):
        hit = valid & (syms == m)
        zi = jnp.where(hit, ci, zi)
        zq = jnp.where(hit, cq, zq)
    return zi, zq


def _lut_slice(ai, aq, lut):
    best = jnp.zeros(ai.shape, jnp.int32)
    best_d = jnp.full(ai.shape, np.inf, jnp.float32)
    for m, (ci, cq) in enumerate(lut):
        dist = (ai - ci) ** 2 + (aq - cq) ** 2
        best = jnp.where(dist < best_d, m, best)
        best_d = jnp.minimum(dist, best_d)
    return best


def _qam_map(syms, valid, qp):
    """Square QAM evaluated from the bit halves (`qam.rs:32-38` + rotation):
    i = a*(pm*cos - pl*sin), q = a*(pl*cos + pm*sin), p = 2*half - max."""
    cshift, ms, a, c, s = qp
    msb = (syms >> cshift).astype(jnp.float32)
    lsb = (syms & ((1 << cshift) - 1)).astype(jnp.float32)
    pm = 2.0 * msb - ms
    plv = 2.0 * lsb - ms
    zi = jnp.where(valid, a * (pm * c - plv * s), 0.0)
    zq = jnp.where(valid, a * (plv * c + pm * s), 0.0)
    return zi, zq


def _qam_slice(ai, aq, qp):
    """Exact inverse of :func:`_qam_map`: un-rotate, quantize each half."""
    cshift, ms, a, c, s = qp
    pm = (ai * c + aq * s) / a
    plv = (aq * c - ai * s) / a
    msb = jnp.clip(jnp.round((pm + ms) * 0.5), 0, ms).astype(jnp.int32)
    lsb = jnp.clip(jnp.round((plv + ms) * 0.5), 0, ms).astype(jnp.int32)
    return (msb << cshift) | lsb


# -- the fused kernel --------------------------------------------------------

def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 avalanche hash (public-domain integer mix): the
    counter-based PRNG for the interpret-mode noise path."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _gauss_pair(shape, interpret: bool = False, key=None, salt: int = 0):
    """Standard-normal pair via Box-Muller.

    Hardware path: the on-core PRNG (caller must ``pltpu.prng_seed`` first).
    Interpret path (``interpret=True``): a counter-based hash stream keyed by
    ``key`` (the same per-tile seed expression) and ``salt`` (the draw index
    within the kernel) — no Mosaic primitives, so the identical kernel logic
    (sigma calibration, Box-Muller, accumulation) runs in the default CPU
    suite; only the bit source differs from hardware.
    """
    if interpret:
        rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        ctr = rows * jnp.uint32(shape[1]) + cols
        k = (jnp.asarray(key, jnp.int32).astype(jnp.uint32)
             + jnp.uint32(salt) * jnp.uint32(0x9E3779B9))
        b1 = _hash_u32(ctr * jnp.uint32(2654435761) + k)
        b2 = _hash_u32(ctr * jnp.uint32(2246822519) + (k ^ jnp.uint32(0x85EBCA6B)))
        u1 = ((b1 >> 8).astype(jnp.float32) + 0.5) * (2.0 ** -24)
        u2 = ((b2 >> 8).astype(jnp.float32) + 0.5) * (2.0 ** -24)
    else:
        b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # 24 mantissa-quality bits -> uniform in (0, 1), never exactly 0.
        # (Mosaic has no uint32->f32 cast; the >>8 makes the value fit int32.)
        i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
        i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
        u1 = (i1.astype(jnp.float32) + 0.5) * (2.0 ** -24)
        u2 = (i2.astype(jnp.float32) + 0.5) * (2.0 ** -24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = (2.0 * np.pi) * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


#: halo block height (sublane rows); >= span+1 and a valid tile height for
#: every symbol dtype (int8 needs 32).
HALO_ROWS = 32


#: carrier-phase table threshold: with integer carriers the NCO phase
#: takes only ``sr/gcd(hz, sr)`` distinct values (5 for the reference's
#: 2000/10000 default; the CLI even asserts ``sr % cf == 0`` for
#: preambles, `modulate.rs:62`); below this many, per-sample cos/sin is
#: replaced by a compare-select from a tiny table computed IN-KERNEL
#: with the same ``jnp.cos/sin`` on the same f32 angles — the selected
#: values are bit-identical to the per-sample transcendentals
_NCO_TABLE_MAX = 16


def _nco_cos_sin(gsym, p, hz: int, sr: int, sps: int):
    """``(cos th, sin th)`` for the exact integer-mod NCO phase, using
    the small-phase-table select when the carrier admits one."""
    import math as _math

    g = _math.gcd(hz, sr)
    n_ph = sr // g
    smod = ((gsym % sr) * sps + p) % sr
    u = (smod * hz) % sr
    scale = np.float32(2.0 * np.pi / sr)
    if n_ph > _NCO_TABLE_MAX:
        th = u.astype(jnp.float32) * scale
        return jnp.cos(th), jnp.sin(th)
    # tiny in-kernel table: the SAME cos/sin lowering evaluated on the
    # same f32 angles the per-sample path would see (u = k*g), so each
    # selected value is bit-identical to the transcendental it replaces
    ki = jax.lax.broadcasted_iota(jnp.int32, (1, n_ph), 1)
    tht = (ki * g).astype(jnp.float32) * scale
    ct = jnp.cos(tht)
    st = jnp.sin(tht)
    idx = u // g
    one = (1,) * idx.ndim
    cth = jnp.zeros(idx.shape, jnp.float32)
    sth = jnp.zeros(idx.shape, jnp.float32)
    for k in range(n_ph):
        m = idx == k
        cth = jnp.where(m, ct[0:1, k:k + 1].reshape(one), cth)
        sth = jnp.where(m, st[0:1, k:k + 1].reshape(one), sth)
    return cth, sth


def _chain_kernel(
    *refs,
    mode: str, mparams, bank: tuple, taps: tuple, sps: int, span: int,
    cs: int, k_real: int, sigma: float | None = None,
    carrier: tuple[int, int] | None = None,
    interpret: bool = False,
):
    refs = list(refs)
    seed_ref = refs.pop(0) if sigma is not None else None
    off_ref = refs.pop(0) if carrier is not None else None
    prev_ref, curr_ref, next_ref, o_ref = refs
    kp = len(bank[0])  # taps per polyphase branch
    ext_l, ext_r = span, span + 1
    t = pl.program_id(1)

    # prev/next are HALO_ROWS-row windows adjacent to the current block (not
    # whole neighbor blocks — the halo is tiny, so reading full blocks would
    # triple the kernel's HBM traffic for 17 useful rows).
    syms = jnp.concatenate(
        [prev_ref[HALO_ROWS - ext_l:, :], curr_ref[:, :], next_ref[:ext_r, :]],
        axis=0,
    ).astype(jnp.int32)  # [cs + ext_l + ext_r, C]

    # Zero I/Q outside the real stream: left of sample 0 = zero initial
    # state, right of k_real = the flush tail. Negative symbol values are a
    # caller-provided sentinel for "no symbol here" (zero I/Q) — used by the
    # sharded wrapper to mark beyond-stream halo positions.
    rows = jax.lax.broadcasted_iota(jnp.int32, syms.shape, 0)
    g = t * cs + rows - ext_l
    valid = (g >= 0) & (g < k_real) & (syms >= 0)
    map_fn = _lut_map if mode == "lut" else _qam_map
    slice_fn = _lut_slice if mode == "lut" else _qam_slice
    zi, zq = map_fn(syms, valid, mparams)

    tile_key = None
    if sigma is not None:
        tile_key = (seed_ref[0, 0]
                    + pl.program_id(0) * 1000003
                    + pl.program_id(1) * 7919)
        if not interpret:
            pltpu.prng_seed(tile_key)

    # Polyphase interpolation + matched-filter decimation, one phase at a
    # time so only one phase's waveform is live in VMEM (8x smaller working
    # set -> large time tiles fit, amortizing per-tile overhead):
    #   w_p[m8] = sum_k bank[p][k] * iq[m8 - k]           (the waveform)
    #   z[m]   += sum_{j: (d-j) % sps == p} taps[j] * w_p[(d-j)//sps + m]
    n8 = cs + span + 1
    d = span * sps
    by_phase = [[] for _ in range(sps)]
    for j in range(len(taps)):
        a = d - j
        by_phase[a % sps].append((j, a // sps))
    acc_i = jnp.zeros((cs, zi.shape[1]), jnp.float32)
    acc_q = jnp.zeros((cs, zi.shape[1]), jnp.float32)
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
        if carrier is not None:
            # Passband leg, fully in VMEM: upconvert this phase's waveform
            # samples (global sample index (off + t*cs + m8)*sps + p) with
            # the exact integer-mod NCO phase (`nco.carrier_phase` formula),
            # optionally add real AWGN, then coherent product detection with
            # 2x gain (`demodulator.rs:52-55`). The matched filter below is
            # the lowpass.
            hz, sr = carrier
            rows8 = jax.lax.broadcasted_iota(jnp.int32, ai.shape, 0)
            gsym = off_ref[0, 0] + t * cs + rows8
            cth, sth = _nco_cos_sin(gsym, p, hz, sr, sps)
            x = ai * cth - aq * sth
            if sigma is not None:
                gx, _ = _gauss_pair(x.shape, interpret, tile_key, p)
                x = x + sigma * gx
            ai = 2.0 * x * cth
            aq = -2.0 * x * sth
        elif sigma is not None:
            # AWGN on the full-rate waveform in VMEM (the matched filter
            # below then shapes it, as in the staged chain). Each tile draws
            # an independent stream; the span-symbol lookahead rows get this
            # tile's draw rather than the neighbor's — statistically
            # identical per decision (every symbol is decided exactly once).
            gi, gq = _gauss_pair(ai.shape, interpret, tile_key, p)
            ai = ai + sigma * gi
            aq = aq + sigma * gq
        for j, q in by_phase[p]:
            acc_i = acc_i + taps[j] * ai[q: q + cs, :]
            acc_q = acc_q + taps[j] * aq[q: q + cs, :]

    o_ref[:, :] = slice_fn(acc_i, acc_q, mparams).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "mparams", "bank", "taps", "sps", "span", "cs",
                     "k_real", "interpret", "sigma", "carrier"),
)
def _fused_tmajor(syms, seed, sym_off, mode, mparams, bank, taps, sps, span,
                  cs, k_real, interpret, sigma, carrier):
    k_pad, c = syms.shape
    hb = HALO_ROWS
    n_halo = k_pad // hb
    r = cs // hb
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    # Halo windows in units of HALO_ROWS: the hb rows just before / after the
    # current cs-row block. Reading whole neighbor blocks instead would
    # triple the kernel's HBM input traffic for 17 useful rows; edge clipping
    # is made irrelevant by the kernel's global-index mask.
    prev = pl.BlockSpec(
        (hb, LANE),
        lambda ci, t: (jnp.clip(t * r - 1, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    nxt = pl.BlockSpec(
        (hb, LANE),
        lambda ci, t: (jnp.clip((t + 1) * r, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda ci, t: (0, 0),
                        memory_space=pltpu.SMEM)
    in_specs = [prev, curr, nxt]
    args = (syms, syms, syms)
    if carrier is not None:
        in_specs = [smem] + in_specs
        args = (sym_off.reshape(1, 1).astype(jnp.int32),) + args
    if sigma is not None:
        in_specs = [smem] + in_specs
        args = (seed.reshape(1, 1).astype(jnp.int32),) + args
    return pl.pallas_call(
        functools.partial(
            _chain_kernel, mode=mode, mparams=mparams, bank=bank, taps=taps,
            sps=sps, span=span, cs=cs, k_real=k_real, sigma=sigma,
            carrier=carrier, interpret=interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, c), syms.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        # Channel tiles are independent ("parallel" lets Mosaic pipeline
        # them); time tiles share nothing either, but halo index maps reread
        # neighbor blocks, so keep that dimension "arbitrary". Measured +3%
        # on the target chip (BENCH.md round-2 ablation).
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)


def _run_fused(symbols, mode, mparams, rrc, sps, span, chunk_sym, interpret,
               sigma=None, seed=None, carrier=None, sym_offset=0):
    taps = _as_f32(rrc)
    if carrier is not None:
        hz, sr = carrier
        if hz * sr >= 1 << 31:
            raise ValueError("carrier needs hz*sr < 2^31 for exact int32 NCO")
    if len(taps) != span * sps + 1:
        raise ValueError("rrc taps length must equal span*sps + 1")
    if chunk_sym < span + 1:
        raise ValueError("chunk_sym must exceed the filter span")
    if chunk_sym % HALO_ROWS:
        raise ValueError(f"chunk_sym must be a multiple of {HALO_ROWS}")
    # VMEM stack guard, calibrated against the Mosaic compiler's own
    # accounting on the target (cs=2048 reported a 31.2 MB scoped
    # allocation -> ~16 KB per symbol row of live working set after the
    # phase-streaming restructure; cs=512 compiles and runs).
    est_bytes = chunk_sym * 16 * 1024
    if est_bytes > 14 * 1024 * 1024:
        raise ValueError(
            f"chunk_sym={chunk_sym} (est. ~{est_bytes >> 20} MB of VMEM "
            "working set) exceeds the 16 MB budget; use a smaller tile"
        )
    if interpret is None:
        interpret = _auto_interpret()
    bank = _phase_bank(taps, sps)

    # Narrowest symbol dtype that fits the constellation (plus the -1
    # sentinel): the kernel is HBM-traffic-bound, so int8 I/O where possible
    # quarters its bandwidth cost.
    n_points = len(mparams) if mode == "lut" else 1 << (2 * mparams[0])
    if n_points <= 127:
        io_dtype = jnp.int8
    elif n_points <= 32767:
        io_dtype = jnp.int16
    else:
        io_dtype = jnp.int32

    batch_shape = symbols.shape[:-1]
    k = symbols.shape[-1]
    flat = symbols.reshape((-1, k))
    c = flat.shape[0]
    k_pad = (-k) % chunk_sym
    c_pad = (-c) % LANE
    st = jnp.pad(flat.T.astype(io_dtype), ((0, k_pad), (0, c_pad)))

    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    out = _fused_tmajor(
        st, jnp.asarray(seed, jnp.int32), jnp.asarray(sym_offset, jnp.int32),
        mode, mparams,
        tuple(tuple(float(v) for v in row) for row in bank),
        tuple(float(v) for v in taps),
        sps, span, chunk_sym, k, interpret,
        None if sigma is None else float(sigma),
        None if carrier is None else (int(carrier[0]), int(carrier[1])),
    )
    return out[:k, :c].T.reshape(batch_shape + (k,)).astype(jnp.int32)


def fused_pulse_chain(
    symbols: jnp.ndarray,
    lut: np.ndarray,
    rrc_taps: np.ndarray,
    sps: int,
    span: int,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
    snr_db: float | None = None,
    seed=None,
    carrier_hz: int | None = None,
    sample_rate: int | None = None,
    sym_offset=0,
) -> jnp.ndarray:
    """Loopback of the pulse-shaped chain, fused in VMEM.

    ``symbols``: ``[..., K]`` int32 constellation indices. Returns the decided
    ``[..., K]`` int32 symbols — at infinite SNR (``snr_db=None``)
    bit-identical in practice to ``PulseShapedChain`` tx->rx. With ``snr_db``
    (Es/N0 in dB, Es = mean constellation energy; the RRC is unit-energy so
    the decision-point SNR equals Es/N0 up to truncation ISI), AWGN is drawn
    on the full-rate waveform *inside the kernel* by the on-core PRNG and the
    matched filter processes signal+noise. For >64-point square QAM use
    :func:`fused_pulse_chain_qam`.

    ``carrier_hz`` (with ``sample_rate``) runs the *passband* loop entirely
    in VMEM: NCO upconvert (`modulator.rs:37-48`), real-waveform AWGN, 2x
    coherent product detection (`demodulator.rs:52-55`) — matching the staged
    passband chain's decisions. ``sym_offset`` is the stream-global index of
    ``symbols[..., 0]`` (traced scalar), used by sharded/streaming callers to
    keep the NCO phase aligned across shards/blocks.
    """
    lut = np.asarray(lut, np.float32)
    if lut.shape[0] > 64:
        raise ValueError("lut path supports up to 64 points; use the qam path")
    mparams = tuple((float(i), float(q)) for i, q in lut)
    carrier = _carrier_tuple(carrier_hz, sample_rate)
    sigma = None
    if snr_db is not None:
        es = float(np.mean(np.sum(lut * lut, axis=-1)))
        sigma = _snr_sigma(es, snr_db, carrier)
    return _run_fused(symbols, "lut", mparams, rrc_taps, sps, span,
                      chunk_sym, interpret, sigma, seed, carrier, sym_offset)


def _carrier_tuple(carrier_hz, sample_rate):
    if carrier_hz is None:
        return None
    if sample_rate is None:
        raise ValueError("carrier_hz needs sample_rate")
    return (int(carrier_hz), int(sample_rate))


def _snr_sigma(es: float, snr_db: float, carrier) -> float:
    """Waveform-noise sigma for a decision-point Es/N0: per-rail N0/2 at
    baseband; for passband the 2x product detector doubles the noise power
    at the rail, so the passband sigma is halved (matches the staged sharded
    passband chain)."""
    denom = 4.0 if carrier is not None else 2.0
    return math.sqrt(es / (10.0 ** (snr_db / 10.0)) / denom)


def fused_pulse_chain_qam(
    symbols: jnp.ndarray,
    bits_per_symbol: int,
    phase: float,
    amplitude: float,
    rrc_taps: np.ndarray,
    sps: int,
    span: int,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
    snr_db: float | None = None,
    seed=None,
    carrier_hz: int | None = None,
    sample_rate: int | None = None,
    sym_offset=0,
) -> jnp.ndarray:
    """Fused chain for square QAM (even ``bits_per_symbol``, incl. 256-QAM):
    constellation map and slicer are algebraic in the MSB/LSB halves, O(1)
    in constellation size. ``snr_db``/``carrier_hz``/``sym_offset`` as in
    :func:`fused_pulse_chain`."""
    if bits_per_symbol % 2:
        raise ValueError("square QAM needs even bits_per_symbol")
    cshift = bits_per_symbol // 2
    ms = float((1 << cshift) - 1)
    a = amplitude / ms / 2.0
    mparams = (cshift, ms, float(a), math.cos(phase), math.sin(phase))
    carrier = _carrier_tuple(carrier_hz, sample_rate)
    sigma = None
    if snr_db is not None:
        levels = 2.0 * np.arange(int(ms) + 1) - ms
        es = float(a * a * 2.0 * np.mean(levels**2))
        sigma = _snr_sigma(es, snr_db, carrier)
    return _run_fused(symbols, "qam", mparams, rrc_taps, sps, span,
                      chunk_sym, interpret, sigma, seed, carrier, sym_offset)

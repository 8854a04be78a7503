"""Fused one-way TX and RX Pallas kernels — the production halves.

The fused *roundtrip* kernel (:mod:`modem_tpu.ops.pallas_chain`) covers the
loopback/BER use; real deployments run the two directions separately — the
reference ships them as separate programs (`modulate.rs`, `demodulate.rs`).
These kernels make each half a single VMEM-resident pass:

* **TX** (`modulate.rs:96-133` equivalent): int symbols -> constellation map
  -> polyphase RRC interpolation -> (optional in-kernel NCO upconversion,
  `modulator.rs:37-48`) -> full-rate waveform written once to HBM. The only
  HBM traffic is ~1 B/symbol in and the waveform out, so the kernel runs at
  the write-bandwidth roofline.
* **RX** (`demodulate.rs:82-147` equivalent, completed to decisions): full
  rate waveform in -> (optional product detection, `demodulator.rs:52-55`)
  -> polyphase matched filter + symbol-instant decimation -> min-distance
  slicing to hard symbols, or soft decision-point I/Q (the reference's own
  output product, `demodulate.rs:41-43`) for the LLR layer
  (:mod:`modem_tpu.ops.llr`). One waveform read, ~4 B/symbol out.

Phase interleave/deinterleave rides the ``[m, sps, C]`` <-> ``[m*sps, C]``
sublane reshape (no strided memory ops — Mosaic has none); the polyphase
decomposition is the same ``bank``/``by_phase`` algebra as the fused
roundtrip, so decisions match the staged chain exactly in practice and the
waveforms match to f32 reassociation.

Layout: time-major ``[rows, C]`` with channels on lanes, as everywhere else.
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
from .pallas_chain import (
    HALO_ROWS, LANE, _auto_interpret, _carrier_tuple,
    _lut_map, _lut_slice, _nco_cos_sin, _qam_map, _qam_slice,
)

DEFAULT_CHUNK_SYM = 256


def _theta(gsym, p, hz: int, sr: int, sps: int):
    """Exact integer-mod NCO phase at sample ``gsym*sps + p``
    (`nco.carrier_phase` formula; caller guarantees hz*sr < 2^31)."""
    smod = ((gsym % sr) * sps + p) % sr
    u = (smod * hz) % sr
    return u.astype(jnp.float32) * np.float32(2.0 * np.pi / sr)


# --------------------------------------------------------------------------
# TX: symbols -> waveform
# --------------------------------------------------------------------------

def _tx_kernel(*refs, mode, mparams, bank, sps, span, cs, k_real,
               carrier, out_scale):
    refs = list(refs)
    off_ref = refs.pop(0) if carrier is not None else None
    prev_ref, curr_ref = refs[0], refs[1]
    out_refs = refs[2:]
    t = pl.program_id(1)

    syms = jnp.concatenate(
        [prev_ref[HALO_ROWS - span:, :], curr_ref[:, :]], axis=0
    ).astype(jnp.int32)  # [cs + span, C]
    rows = jax.lax.broadcasted_iota(jnp.int32, syms.shape, 0)
    g = t * cs + rows - span
    valid = (g >= 0) & (g < k_real) & (syms >= 0)
    map_fn = _lut_map if mode == "lut" else _qam_map
    zi, zq = map_fn(syms, valid, mparams)

    # Polyphase interpolation in tap-major [m, p, C] form (the dual of the
    # RX kernel's filter): w[m, p] = sum_k bank[p][k] * z[m + span - k].
    # For each symbol-lag k, ONE contiguous leading-dim slice of z feeds
    # all sps phases through a [1, sps, 1] weight row (bank column k built
    # from scalars against a phase iota — array constants can't be
    # captured by a Pallas kernel). vs the phase-major form (per-(p,k)
    # slices + a final jnp.stack) this is kp slices instead of sps*kp and
    # no relayout, and the per-(m,p) accumulation order over k is the
    # same, so results are bit-identical. Measured: the phase-major form
    # ran 2.4x under the map+write ceiling at floor-amortized geometry.
    c = zi.shape[1]
    kp = len(bank[0])
    zi_k = [zi[span - k: span - k + cs, :] for k in range(kp)]
    zq_k = [zq[span - k: span - k + cs, :] for k in range(kp)]
    wi, wq = [], []
    for p in range(sps):
        ai = jnp.zeros((cs, c), jnp.float32)
        aq = jnp.zeros((cs, c), jnp.float32)
        for k in range(kp):
            b = bank[p][k]
            if b == 0.0:
                continue
            ai = ai + b * zi_k[k]
            aq = aq + b * zq_k[k]
        wi.append(ai)
        wq.append(aq)
    wi = jnp.stack(wi, axis=1)  # [cs, sps, C]
    wq = jnp.stack(wq, axis=1)

    if carrier is not None:
        hz, sr = carrier
        m = jax.lax.broadcasted_iota(jnp.int32, wi.shape, 0)
        p = jax.lax.broadcasted_iota(jnp.int32, wi.shape, 1)
        gsym = off_ref[0, 0] + t * cs + m
        cth, sth = _nco_cos_sin(gsym, p, hz, sr, sps)
        x = wi * cth - wq * sth
        outs = [x.reshape(cs * sps, c)]
    else:
        outs = [wi.reshape(cs * sps, c), wq.reshape(cs * sps, c)]
    for o_ref, val in zip(out_refs, outs):
        if out_scale is not None:
            val = jnp.clip(jnp.round(val * out_scale), -32768.0, 32767.0)
        o_ref[:, :] = val.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "mparams", "bank", "sps", "span", "cs",
                     "k_real", "interpret", "carrier", "out_scale",
                     "wave_dtype"),
)
def _tx_tmajor(syms, sym_off, mode, mparams, bank, sps, span, cs, k_real,
               interpret, carrier, out_scale, wave_dtype=jnp.float32):
    k_pad, c = syms.shape
    hb = HALO_ROWS
    n_halo = k_pad // hb
    r = cs // hb
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (hb, LANE),
        lambda ci, t: (jnp.clip(t * r - 1, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda ci, t: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [prev, curr]
    args = (syms, syms)
    if carrier is not None:
        in_specs = [smem] + in_specs
        args = (sym_off.reshape(1, 1).astype(jnp.int32),) + args
    out_dtype = wave_dtype if out_scale is None else jnp.int16
    n_out = 1 if carrier is not None else 2
    out_spec = pl.BlockSpec((cs * sps, LANE), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _tx_kernel, mode=mode, mparams=mparams, bank=bank, sps=sps,
            span=span, cs=cs, k_real=k_real, carrier=carrier,
            out_scale=out_scale,
        ),
        out_shape=[jax.ShapeDtypeStruct((k_pad * sps, c), out_dtype)] * n_out,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)
    return out


def _prep_syms(symbols, chunk_sym, n_points, extra_rows=0):
    """Flatten + pad + transpose to the kernel's [k_pad, C] int layout."""
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
    k_pad = (-(k + extra_rows)) % chunk_sym + extra_rows
    c_pad = (-c) % LANE
    st = jnp.pad(flat.T.astype(io_dtype), ((0, k_pad), (0, c_pad)))
    return st, batch_shape, k, c


def fused_tx(
    symbols: jnp.ndarray,
    lut: np.ndarray | None,
    rrc_taps: np.ndarray,
    sps: int,
    span: int,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
    carrier_hz: int | None = None,
    sample_rate: int | None = None,
    sym_offset=0,
    qam_params: tuple | None = None,
    out_scale: float | None = None,
    wave_dtype=jnp.float32,
):
    """Fused transmitter: ``symbols [..., K]`` -> RRC-shaped waveform.

    Baseband (``carrier_hz=None``): returns ``(i, q)`` each
    ``[..., (K+span)*sps]`` float32 — same values as
    :meth:`modem_tpu.chain.PulseShapedChain.tx` up to f32 reassociation
    (decisions through the matched filter are identical in practice).
    Passband: returns the real waveform ``[..., (K+span)*sps]`` with the
    exact integer-NCO upconversion in-kernel (`modulator.rs:37-48`).

    ``lut`` is the ``[M, 2]`` constellation (<= 64 points); for larger square
    QAM pass ``qam_params`` from :func:`qam_mparams` instead. ``out_scale``
    quantizes the output to int16 in-kernel (``round(x*out_scale)``, the
    CLI's i16 wire format) at half the HBM write cost of f32.
    ``sym_offset`` keeps the NCO aligned for streaming/sharded callers.

    ``wave_dtype=jnp.bfloat16`` stores the waveform bf16 (f32 in-kernel
    compute, one rounding at the HBM write) — halves the write cost; the
    matched-filter decisions through :func:`fused_rx` are unchanged on
    clean waveforms (8-bit mantissa rounding ~1e-3 of the waveform scale
    vs O(1) decision margins; exactness gated in ``tests/test_txrx.py``).
    """
    if (lut is None) == (qam_params is None):
        raise ValueError("pass exactly one of lut / qam_params")
    if lut is not None:
        lut = np.asarray(lut, np.float32)
        if lut.shape[0] > 64:
            raise ValueError("lut path supports up to 64 points; use qam_params")
        mode, mparams = "lut", tuple((float(i), float(q)) for i, q in lut)
        n_points = lut.shape[0]
    else:
        mode, mparams = "qam", qam_params
        n_points = 1 << (2 * int(qam_params[0]))
    taps = _as_f32(rrc_taps)
    if len(taps) != span * sps + 1:
        raise ValueError("rrc taps length must equal span*sps + 1")
    carrier = _carrier_tuple(carrier_hz, sample_rate)
    if carrier is not None and carrier[0] * carrier[1] >= 1 << 31:
        raise ValueError("carrier needs hz*sr < 2^31 for exact int32 NCO")
    if chunk_sym < span + 1 or chunk_sym % HALO_ROWS:
        raise ValueError(f"chunk_sym must exceed span and be a multiple of "
                         f"{HALO_ROWS}")
    if interpret is None:
        interpret = _auto_interpret()
    bank = _phase_bank(taps, sps)
    st, batch_shape, k, c = _prep_syms(symbols, chunk_sym, n_points,
                                       extra_rows=span)
    outs = _tx_tmajor(
        st, jnp.asarray(sym_offset, jnp.int32), mode, mparams,
        tuple(tuple(float(v) for v in row) for row in bank),
        sps, span, chunk_sym, k, interpret, carrier,
        None if out_scale is None else float(out_scale),
        jnp.dtype(wave_dtype),
    )
    n = (k + span) * sps
    shaped = [o[:n, :c].T.reshape(batch_shape + (n,)) for o in outs]
    return shaped[0] if carrier is not None else tuple(shaped)


def qam_mparams(bits_per_symbol: int, phase: float, amplitude: float):
    """Algebraic square-QAM map/slice parameters (any even bits/symbol)."""
    import math

    if bits_per_symbol % 2:
        raise ValueError("square QAM needs even bits_per_symbol")
    cshift = bits_per_symbol // 2
    ms = float((1 << cshift) - 1)
    a = amplitude / ms / 2.0
    return (cshift, ms, float(a), math.cos(phase), math.sin(phase))


# --------------------------------------------------------------------------
# RX: waveform -> decisions (or soft decision-point I/Q)
# --------------------------------------------------------------------------

def _rx_kernel(*refs, mode, mparams, taps, sps, span, cs,
               carrier, soft):
    refs = list(refs)
    off_ref = refs.pop(0) if carrier is not None else None
    n_in = 1 if carrier is not None else 2
    curr = refs[:n_in]
    nxt = refs[n_in:2 * n_in]
    out_refs = refs[2 * n_in:]
    t = pl.program_id(1)
    halo = span * sps

    def planes(curr_ref, nxt_ref):
        # bf16-stored waveforms are cast up HERE (f32 in-kernel compute;
        # HBM only ever sees the narrow type)
        y = jnp.concatenate([curr_ref[:, :], nxt_ref[:halo, :]],
                            axis=0).astype(jnp.float32)
        return y.reshape(cs + span, sps, y.shape[1])  # [m, p, C]

    if carrier is not None:
        hz, sr = carrier
        x = planes(curr[0], nxt[0])
        m = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        p = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        gsym = off_ref[0, 0] + t * cs + m
        cth, sth = _nco_cos_sin(gsym, p, hz, sr, sps)
        yi = 2.0 * x * cth
        yq = -2.0 * x * sth
    else:
        yi = planes(curr[0], nxt[0])
        yq = planes(curr[1], nxt[1])

    # Matched filter + decimation without strided slicing (Mosaic has
    # none): z[m] = sum_j taps[j] * y[m*sps + d - j]. Writing the sample
    # offset a = d - j as q*sps + p, each (q, p) pair holds exactly one tap,
    # so the whole filter is span+1 *contiguous* leading-dim slices of the
    # [m, sps, C] view, each multiply-added with a [1, sps, 1] weight row,
    # and one final reduction over the phase axis. (The per-tap 2D-slice
    # formulation materialized the full 3D block per tap — 65 x 1 MB of
    # scoped VMEM, an OOM at any useful tile size.)
    d = span * sps
    c = yi.shape[2]
    w_rows = np.zeros((span + 1, sps), np.float32)
    for j in range(len(taps)):
        a = d - j
        w_rows[a // sps, a % sps] = taps[j]
    # Array constants can't be captured by a Pallas kernel; build each
    # [1, sps, 1] weight row from scalar taps against a phase iota.
    piota = jax.lax.broadcasted_iota(jnp.int32, (1, sps, 1), 1)
    acc3_i = jnp.zeros((cs, sps, c), jnp.float32)
    acc3_q = jnp.zeros((cs, sps, c), jnp.float32)
    for q in range(span + 1):
        w = jnp.zeros((1, sps, 1), jnp.float32)
        for p in range(sps):
            v = float(w_rows[q, p])
            if v != 0.0:
                w = jnp.where(piota == p, jnp.float32(v), w)
        acc3_i = acc3_i + yi[q: q + cs, :, :] * w
        acc3_q = acc3_q + yq[q: q + cs, :, :] * w
    acc_i = jnp.sum(acc3_i, axis=1)
    acc_q = jnp.sum(acc3_q, axis=1)

    if soft:
        out_refs[0][:, :] = acc_i
        out_refs[1][:, :] = acc_q
    else:
        slice_fn = _lut_slice if mode == "lut" else _qam_slice
        out_refs[0][:, :] = slice_fn(acc_i, acc_q, mparams).astype(
            out_refs[0].dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "mparams", "taps", "sps", "span", "cs",
                     "interpret", "carrier", "soft"),
)
def _rx_tmajor(waves, sym_off, mode, mparams, taps, sps, span, cs,
               interpret, carrier, soft):
    n_pad, c = waves[0].shape
    k_pad = n_pad // sps
    halo = span * sps  # multiple of HALO_ROWS for sps>=4·span/… guarded below
    hb = halo
    n_halo = n_pad // hb
    grid = (c // LANE, k_pad // cs)
    curr = pl.BlockSpec((cs * sps, LANE), lambda ci, t: (t, ci),
                        memory_space=pltpu.VMEM)
    r = cs * sps // hb
    nxt = pl.BlockSpec(
        (hb, LANE),
        lambda ci, t: (jnp.clip((t + 1) * r, 0, n_halo - 1), ci),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda ci, t: (0, 0), memory_space=pltpu.SMEM)
    in_specs = list([curr] * len(waves)) + list([nxt] * len(waves))
    args = tuple(waves) + tuple(waves)
    if carrier is not None:
        in_specs = [smem] + in_specs
        args = (sym_off.reshape(1, 1).astype(jnp.int32),) + args
    if soft:
        out_shape = [jax.ShapeDtypeStruct((k_pad, c), jnp.float32)] * 2
    else:
        n_points = len(mparams) if mode == "lut" else 1 << (2 * int(mparams[0]))
        o_dtype = jnp.int8 if n_points <= 127 else jnp.int32
        out_shape = [jax.ShapeDtypeStruct((k_pad, c), o_dtype)]
    out_spec = pl.BlockSpec((cs, LANE), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _rx_kernel, mode=mode, mparams=mparams, taps=taps, sps=sps,
            span=span, cs=cs, carrier=carrier, soft=soft,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * len(out_shape),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)


def fused_rx(
    wave,
    n_symbols: int,
    lut: np.ndarray | None,
    rrc_taps: np.ndarray,
    sps: int,
    span: int,
    chunk_sym: int = DEFAULT_CHUNK_SYM,
    interpret: bool | None = None,
    carrier_hz: int | None = None,
    sample_rate: int | None = None,
    sym_offset=0,
    qam_params: tuple | None = None,
    soft: bool = False,
):
    """Fused receiver: waveform -> hard symbol decisions (or soft I/Q).

    ``wave``: baseband ``(i, q)`` tuple or real passband array ``[..., N]``
    (``carrier_hz`` set), ``N >= (n_symbols + span) * sps`` — the layout
    :func:`fused_tx` / the staged TX produce. Returns int32 decisions
    ``[..., n_symbols]`` equal to the staged
    :meth:`modem_tpu.chain.PulseShapedChain.rx`; with ``soft=True`` returns
    the matched-filter decision-point ``(i, q)`` float32 ``[..., n_symbols]``
    (the reference's demodulate output product, `demodulate.rs:41-43`) for
    :mod:`modem_tpu.ops.llr`.
    """
    if (lut is None) == (qam_params is None):
        raise ValueError("pass exactly one of lut / qam_params")
    if lut is not None:
        lut = np.asarray(lut, np.float32)
        mode, mparams = "lut", tuple((float(i), float(q)) for i, q in lut)
    else:
        mode, mparams = "qam", qam_params
    taps = _as_f32(rrc_taps)
    if len(taps) != span * sps + 1:
        raise ValueError("rrc taps length must equal span*sps + 1")
    if (span * sps) % HALO_ROWS:
        raise ValueError(f"span*sps must be a multiple of {HALO_ROWS}")
    if chunk_sym < span + 1 or chunk_sym % HALO_ROWS:
        raise ValueError(f"chunk_sym must exceed span and be a multiple of "
                         f"{HALO_ROWS}")
    carrier = _carrier_tuple(carrier_hz, sample_rate)
    if interpret is None:
        interpret = _auto_interpret()

    waves = (wave,) if carrier is not None else tuple(wave)
    batch_shape = waves[0].shape[:-1]
    n = waves[0].shape[-1]
    if n < (n_symbols + span) * sps:
        raise ValueError("waveform shorter than (n_symbols + span) * sps")
    k_pad = n_symbols + span + (-(n_symbols + span)) % chunk_sym
    prepped = []
    for w in waves:
        flat = w.reshape((-1, n))
        c = flat.shape[0]
        # bf16 input stays bf16 through HBM (halves the read cost); the
        # kernel casts to f32 at the VMEM boundary. Anything else is
        # computed in f32 as before.
        wt = (flat.T if flat.dtype == jnp.bfloat16
              else flat.T.astype(jnp.float32))
        wt = jnp.pad(wt[: min(n, k_pad * sps), :],
                     ((0, max(0, k_pad * sps - n)), (0, (-c) % LANE)))
        prepped.append(wt)
    outs = _rx_tmajor(
        tuple(prepped), jnp.asarray(sym_offset, jnp.int32), mode, mparams,
        tuple(float(v) for v in taps), sps, span, chunk_sym, interpret,
        carrier, soft,
    )
    shaped = [o[:n_symbols, :c].T.reshape(batch_shape + (n_symbols,))
              for o in outs]
    if soft:
        return shaped[0], shaped[1]
    return shaped[0].astype(jnp.int32)

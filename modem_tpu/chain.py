"""End-to-end bits -> waveform -> bits chains.

These close the loop the reference leaves open (its demodulator stops at soft
I/Q text, `/root/reference/src/bin/demodulate.rs:41-43`) and are the
BASELINE.md headline configurations:

* :class:`PulseShapedChain` — linear-modulation flagship: bits -> constellation
  map -> zero-stuffed upsample -> RRC pulse shaping -> (optional NCO passband)
  -> AWGN -> matched filter -> symbol-instant decimation -> min-distance
  slicing -> bits. (configs #1/#2: BPSK/QPSK + RRC + matched filter.)
* :class:`FskChain` — FSK/MSK via the Modulator's exact phase programs and an
  FM-discriminator receiver (config #3).

Both are single jittable block transforms: the whole TX+channel+RX graph fuses
into a handful of XLA kernels around the FIR engine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .config import Rates
from .models.base import Scheme
from .ops.fir import fir_filter
from .ops.filters import rrc_taps
from .ops.nco import carrier_phase, mix_up
from .ops.polyphase import polyphase_decim, polyphase_interp
from .ops.slicer import (
    diff_phase_slice, fm_discriminate, fsk_slice, lut_map, lut_slice,
)
from .tx import Modulator
from .utils.bits import pack_bits, unpack_symbols


def upsample_zero_stuff(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[..., K] -> [..., K*factor] with x[k] at position k*factor, zeros between."""
    shape = x.shape[:-1] + (x.shape[-1], factor)
    u = jnp.zeros(shape, x.dtype).at[..., 0].set(x)
    return u.reshape(x.shape[:-1] + (x.shape[-1] * factor,))


def shape_iq(iq, rrc, sps: int, span: int, polyphase: bool,
             fir_backend: str = "direct"):
    """Per-symbol I/Q values ``[..., K, 2]`` -> RRC-shaped baseband,
    ``span`` flush symbols appended — the shared TX back half of the
    constellation and differential chains."""
    flush = jnp.zeros(iq.shape[:-2] + (span, 2), iq.dtype)
    iq = jnp.concatenate([iq, flush], axis=-2)
    if polyphase:
        si, _ = polyphase_interp(iq[..., 0], rrc, sps)
        sq, _ = polyphase_interp(iq[..., 1], rrc, sps)
        return si, sq
    ui = upsample_zero_stuff(iq[..., 0], sps)
    uq = upsample_zero_stuff(iq[..., 1], sps)
    si, _ = fir_filter(ui, rrc, backend=fir_backend)
    sq, _ = fir_filter(uq, rrc, backend=fir_backend)
    return si, sq


def matched_decision_points(yi, yq, rrc, sps: int, span: int,
                            n_symbols: int, polyphase: bool,
                            fir_backend: str = "direct",
                            delay: int | None = None):
    """Matched filter + symbol-instant sampling ``-> (di, dq) [..., K]`` —
    the shared RX front half of the constellation and differential chains.
    ``delay`` overrides the default ``span*sps`` decision-instant offset
    (used by the resampled chain, whose cascade adds its own group delay)."""
    d = span * sps if delay is None else delay
    if polyphase:
        di = polyphase_decim(yi, rrc, sps, d, n_symbols)
        dq = polyphase_decim(yq, rrc, sps, d, n_symbols)
        return di, dq
    yi, _ = fir_filter(yi, rrc, backend=fir_backend)
    yq, _ = fir_filter(yq, rrc, backend=fir_backend)
    idx = d + jnp.arange(n_symbols, dtype=jnp.int32) * sps
    return yi[..., idx], yq[..., idx]


class PulseShapedChain:
    """Matched-filter chain for constellation (LUT) schemes.

    ``scheme`` must expose a static ``lut`` ([M, 2] constellation, as built by
    BPSK/QPSK/MPSK/QAM/APSK/BASK); slicing is minimum-distance against it.
    One-shot block API: the TX appends ``span`` flush symbols so the matched
    filter's full response is observed; total group delay is ``span*sps``.
    """

    def __init__(
        self,
        scheme: Scheme,
        rates: Rates,
        span_symbols: int = 8,
        beta: float = 0.35,
        carrier_hz: int | None = None,
        fir_backend: str = "direct",
        polyphase: bool = False,
    ):
        if not hasattr(scheme, "lut"):
            raise TypeError("PulseShapedChain needs a constellation-LUT scheme")
        self.scheme = scheme
        self.rates = rates
        self.span = span_symbols
        self.sps = rates.samples_per_symbol
        self.rrc = rrc_taps(self.sps, span_symbols, beta)
        self.carrier_hz = carrier_hz
        self.fir_backend = fir_backend
        #: polyphase=True computes pulse shaping at symbol rate and the
        #: matched filter only at decision instants (sps-fold FLOP/traffic
        #: reduction; same decisions up to f32 reassociation).
        self.polyphase = polyphase
        self.lut = np.asarray(scheme.lut, np.float32)

    # ---- TX ----

    def map_symbols(self, bits: jnp.ndarray) -> jnp.ndarray:
        return pack_bits(bits, self.scheme.bits_per_symbol)

    def shape_pulses(self, symbols: jnp.ndarray):
        """symbols [..., K] -> RRC-shaped baseband I/Q [..., (K+span)*sps]."""
        mi, mq = lut_map(symbols, self.lut)  # one-hot matmul, not a gather
        return shape_iq(jnp.stack([mi, mq], axis=-1), self.rrc, self.sps,
                        self.span, self.polyphase, self.fir_backend)

    def tx(self, bits: jnp.ndarray):
        """bits -> baseband I/Q (or real passband if carrier_hz is set)."""
        si, sq = self.shape_pulses(self.map_symbols(bits))
        if self.carrier_hz is None:
            return si, sq
        theta = carrier_phase(
            self.carrier_hz, self.rates.sample_rate, si.shape[-1], 0
        )
        re, _ = mix_up(si, sq, theta)
        return re

    # ---- RX ----

    def matched_filter(self, i: jnp.ndarray, q: jnp.ndarray):
        yi, _ = fir_filter(i, self.rrc, backend=self.fir_backend)
        yq, _ = fir_filter(q, self.rrc, backend=self.fir_backend)
        return yi, yq

    def downconvert(self, x: jnp.ndarray):
        """Real passband -> baseband I/Q via coherent product detection
        (2x gain as in `demodulator.rs:52-55`; the matched filter is the
        lowpass)."""
        theta = carrier_phase(self.carrier_hz, self.rates.sample_rate,
                              x.shape[-1], 0)
        return 2.0 * x * jnp.cos(theta), -2.0 * x * jnp.sin(theta)

    def decimate(self, yi: jnp.ndarray, yq: jnp.ndarray, n_symbols: int):
        """Sample at symbol centers: delay span*sps, stride sps."""
        d = self.span * self.sps
        idx = d + jnp.arange(n_symbols, dtype=jnp.int32) * self.sps
        return yi[..., idx], yq[..., idx]

    def decision_points(self, rx_wave, n_symbols: int):
        """waveform -> matched-filter outputs at symbol instants
        ``(di, dq) [..., K]`` — the shared front half of hard (:meth:`rx`)
        and soft (:meth:`rx_soft`) detection."""
        if self.carrier_hz is None:
            yi, yq = rx_wave
        else:
            yi, yq = self.downconvert(rx_wave)
        return matched_decision_points(
            yi, yq, self.rrc, self.sps, self.span, n_symbols,
            self.polyphase, self.fir_backend,
        )

    def rx(self, rx_wave, n_symbols: int) -> jnp.ndarray:
        """waveform -> decided bits [..., K*bps]."""
        di, dq = self.decision_points(rx_wave, n_symbols)
        syms = lut_slice(di, dq, self.lut)
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft(self, rx_wave, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        """waveform -> per-bit max-log LLRs ``[..., K*bps]`` for downstream
        FEC (``noise_var`` = per-rail sigma^2 at the decision point, N0/2)."""
        from .ops.llr import lut_llr

        di, dq = self.decision_points(rx_wave, n_symbols)
        return lut_llr(di, dq, self.lut, self.scheme.bits_per_symbol,
                       noise_var)

    # ---- fused one-way paths (production TX / RX halves) ----

    def _txrx_params(self):
        """(lut, qam_params) for :mod:`modem_tpu.ops.pallas_txrx` — square
        QAM takes the O(1) algebraic path, everything else the LUT path."""
        from .models.qam import QAM
        from .ops.pallas_txrx import qam_mparams

        bps = self.scheme.bits_per_symbol
        # the algebraic map hard-codes the natural-binary level map, so
        # Gray-coded QAM must take the LUT path
        if (isinstance(self.scheme, QAM) and bps % 2 == 0
                and not self.scheme.gray):
            return None, qam_mparams(bps, self.scheme.phase,
                                     self.scheme.amplitude)
        return self.lut, None

    def tx_fused(self, bits: jnp.ndarray, sym_offset=0,
                 out_scale: float | None = None,
                 wave_dtype=jnp.float32):
        """bits -> waveform via the fused TX kernel
        (:func:`modem_tpu.ops.pallas_txrx.fused_tx`): same output as
        :meth:`tx` up to f32 reassociation, one VMEM-resident pass.
        ``out_scale`` emits int16 (the CLI wire format) at half the HBM
        write cost; ``wave_dtype=jnp.bfloat16`` halves the baseband
        write cost (f32 in-kernel compute, decisions via
        :meth:`rx_fused` unchanged on clean waveforms — tested)."""
        from .ops.pallas_txrx import fused_tx

        lut, qp = self._txrx_params()
        return fused_tx(
            self.map_symbols(bits), lut, np.asarray(self.rrc), self.sps,
            self.span, carrier_hz=self.carrier_hz,
            sample_rate=self.rates.sample_rate
            if self.carrier_hz is not None else None,
            sym_offset=sym_offset, qam_params=qp, out_scale=out_scale,
            wave_dtype=wave_dtype,
        )

    def rx_fused(self, rx_wave, n_symbols: int, sym_offset=0) -> jnp.ndarray:
        """waveform -> decided bits via the fused RX kernel — decisions equal
        :meth:`rx` (tested)."""
        from .ops.pallas_txrx import fused_rx

        lut, qp = self._txrx_params()
        syms = fused_rx(
            rx_wave, n_symbols, lut, np.asarray(self.rrc), self.sps,
            self.span, carrier_hz=self.carrier_hz,
            sample_rate=self.rates.sample_rate
            if self.carrier_hz is not None else None,
            sym_offset=sym_offset, qam_params=qp,
        )
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft_fused(self, rx_wave, n_symbols: int,
                      noise_var: float = 1.0, sym_offset=0) -> jnp.ndarray:
        """waveform -> per-bit LLRs: fused matched filter + decimation to
        decision-point I/Q (the reference's own RX product,
        `demodulate.rs:41-43`), then the symbol-rate LLR layer."""
        from .ops.llr import lut_llr
        from .ops.pallas_txrx import fused_rx

        lut, qp = self._txrx_params()
        di, dq = fused_rx(
            rx_wave, n_symbols, lut, np.asarray(self.rrc), self.sps,
            self.span, carrier_hz=self.carrier_hz,
            sample_rate=self.rates.sample_rate
            if self.carrier_hz is not None else None,
            sym_offset=sym_offset, qam_params=qp, soft=True,
        )
        return lut_llr(di, dq, self.lut, self.scheme.bits_per_symbol,
                       noise_var)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Noiseless bits -> bits (must be exactly equal for sane configs)."""
        k = bits.shape[-1] // self.scheme.bits_per_symbol
        return self.rx(self.tx(bits), k)

    def roundtrip_fused(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Noiseless bits -> bits through the single fused Pallas kernel
        (:mod:`modem_tpu.ops.pallas_chain`): the full-rate waveform is
        synthesized and matched-filtered entirely in VMEM, with HBM traffic
        only for the bit tensors. With ``carrier_hz`` set, the NCO
        up/downconversion and product detection also run in-kernel (the
        reference's primary output mode, `modulate.rs:128-133`). Decisions
        match :meth:`roundtrip`."""
        from .models.qam import QAM
        from .ops.pallas_chain import fused_pulse_chain, fused_pulse_chain_qam

        pb = dict(carrier_hz=self.carrier_hz,
                  sample_rate=self.rates.sample_rate
                  if self.carrier_hz is not None else None)
        bps = self.scheme.bits_per_symbol
        syms = pack_bits(bits, bps)
        if (isinstance(self.scheme, QAM) and bps % 2 == 0
                and not self.scheme.gray):
            # algebraic map/slice: O(1) in constellation size (256-QAM
            # etc.); natural-binary only — Gray QAM uses the LUT kernel
            dec = fused_pulse_chain_qam(
                syms, bps, self.scheme.phase, self.scheme.amplitude,
                np.asarray(self.rrc), self.sps, self.span, **pb,
            )
        else:
            dec = fused_pulse_chain(
                syms, self.lut, np.asarray(self.rrc), self.sps, self.span,
                **pb,
            )
        return unpack_symbols(dec, bps)


class DifferentialChain:
    """Pulse-shaped chain for differential PSK (DBPSK/DQPSK, `dmpsk.rs`).

    DMPSK has no static constellation (its phase accumulates), so TX maps
    symbols through the scheme's phase-accumulating program to per-symbol I/Q,
    and RX decides on the *phase change* between consecutive matched-filter
    outputs (:func:`modem_tpu.ops.slicer.diff_phase_slice`) — differential
    detection needs no absolute carrier phase, which is the scheme's point.
    The first symbol is decided against the known TX initial phase
    (`modulate.rs:86-90` passes phase pi/4).
    """

    def __init__(self, scheme, rates: Rates, span_symbols: int = 8,
                 beta: float = 0.35, polyphase: bool = False):
        from .models.psk import DMPSK

        if not isinstance(scheme, DMPSK):
            raise TypeError("DifferentialChain requires a DMPSK scheme")
        self.scheme = scheme
        self.rates = rates
        self.span = span_symbols
        self.sps = rates.samples_per_symbol
        self.rrc = rrc_taps(self.sps, span_symbols, beta)
        self.polyphase = polyphase

    def tx(self, bits: jnp.ndarray):
        symbols = pack_bits(bits, self.scheme.bits_per_symbol)
        prog, _ = self.scheme.program(
            symbols, self.scheme.init_state(symbols.shape[:-1]), self.rates, 0
        )
        iq = jnp.stack([prog.i, prog.q], axis=-1)  # [..., K, 2]
        return shape_iq(iq, self.rrc, self.sps, self.span, self.polyphase)

    def _dphi(self, rx_wave, n_symbols: int) -> jnp.ndarray:
        """Per-symbol differential phase at the decision points, seeded with
        the known TX initial phase — the shared statistic of hard
        (:meth:`rx`) and soft (:meth:`rx_soft`) detection."""
        import math as _math

        from .ops.slicer import diff_phase

        di, dq = matched_decision_points(
            *rx_wave, self.rrc, self.sps, self.span, n_symbols,
            self.polyphase,
        )
        p0 = self.scheme.phase0_turns * 2.0 * _math.pi
        prev = jnp.broadcast_to(
            jnp.asarray([_math.cos(p0), _math.sin(p0)], jnp.float32),
            di.shape[:-1] + (2,),
        )
        return diff_phase(di, dq, prev)

    def rx(self, rx_wave, n_symbols: int) -> jnp.ndarray:
        import math as _math

        dphi = self._dphi(rx_wave, n_symbols)
        shift = self.scheme.shift_turns * 2.0 * _math.pi
        m = 1 << self.scheme.bits_per_symbol
        syms = jnp.round(dphi / shift).astype(jnp.int32) % m
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft(self, rx_wave, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        """waveform -> per-bit max-log LLRs ``[..., K*bps]`` from the
        differential phase (``noise_var`` = differential-phase variance).
        The reference's RX emits soft I/Q for every scheme
        (`demodulate.rs:41-43`); this completes the per-bit soft surface for
        the differential family."""
        import math as _math

        from .ops.llr import dmpsk_llr

        dphi = self._dphi(rx_wave, n_symbols)
        shift = self.scheme.shift_turns * 2.0 * _math.pi
        return dmpsk_llr(dphi, shift, self.scheme.bits_per_symbol, noise_var)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        k = bits.shape[-1] // self.scheme.bits_per_symbol
        return self.rx(self.tx(bits), k)

    # ---- fused paths (accumulated-constellation representation) ----

    def _acc_constellation(self):
        """DMPSK's accumulated phase ``phi_k = phi0 + shift * sum sym_j``
        (`dmpsk.rs:29-41`) is a rotated M'-PSK constellation indexed by the
        modular prefix sum — the representation every fused path runs on.
        Returns ``(M', lut)``."""
        import math as _math

        sch = self.scheme
        inv = 1.0 / sch.shift_turns
        m_ph = round(inv)
        if abs(inv - m_ph) > 1e-9 or m_ph != 1 << sch.bits_per_symbol:
            raise NotImplementedError(
                "fused DMPSK needs shift = 2*pi / 2^bits_per_symbol"
            )
        ang = 2.0 * _math.pi * (sch.phase0_turns + np.arange(m_ph) / m_ph)
        lut = np.stack([sch.amplitude * np.cos(ang),
                        sch.amplitude * np.sin(ang)], axis=-1)
        return m_ph, lut.astype(np.float32)

    def _acc_symbols(self, bits: jnp.ndarray, m_ph: int) -> jnp.ndarray:
        from .utils.scan import cummod

        syms = pack_bits(bits, self.scheme.bits_per_symbol)
        return cummod(syms.astype(jnp.int32), m_ph)

    def tx_fused(self, bits: jnp.ndarray):
        """bits -> baseband I/Q via the fused TX kernel on the accumulated
        constellation: matches :meth:`tx` to f32 reassociation (same
        per-symbol phases, pulse shaping in VMEM, one HBM write)."""
        from .ops.pallas_txrx import fused_tx

        m_ph, lut = self._acc_constellation()
        acc = self._acc_symbols(bits, m_ph)
        return fused_tx(acc, lut, np.asarray(self.rrc), self.sps, self.span)

    def rx_fused(self, rx_wave, n_symbols: int) -> jnp.ndarray:
        """waveform -> decided bits: fused matched filter + min-distance
        slice against the accumulated constellation (one waveform read),
        then the symbol-rate differential decode ``sym = (a_k - a_{k-1})
        mod M'``. Noiseless decisions equal :meth:`rx` exactly."""
        from .ops.pallas_txrx import fused_rx

        m_ph, lut = self._acc_constellation()
        dec_abs = fused_rx(rx_wave, n_symbols, lut, np.asarray(self.rrc),
                           self.sps, self.span)
        prev = jnp.concatenate(
            [jnp.zeros_like(dec_abs[..., :1]), dec_abs[..., :-1]], axis=-1
        )
        dec = (dec_abs - prev) % m_ph
        return unpack_symbols(dec, self.scheme.bits_per_symbol)

    def rx_soft_fused(self, rx_wave, n_symbols: int,
                      noise_var: float = 1.0) -> jnp.ndarray:
        """waveform -> per-bit LLRs: fused decision-point I/Q, then the
        differential-phase LLR layer (as :meth:`rx_soft`)."""
        import math as _math

        from .ops.llr import dmpsk_llr
        from .ops.pallas_txrx import fused_rx
        from .ops.slicer import diff_phase

        m_ph, lut = self._acc_constellation()
        di, dq = fused_rx(rx_wave, n_symbols, lut, np.asarray(self.rrc),
                          self.sps, self.span, soft=True)
        p0 = self.scheme.phase0_turns * 2.0 * _math.pi
        prev = jnp.broadcast_to(
            jnp.asarray([_math.cos(p0), _math.sin(p0)], jnp.float32),
            di.shape[:-1] + (2,),
        )
        dphi = diff_phase(di, dq, prev)
        shift = self.scheme.shift_turns * 2.0 * _math.pi
        return dmpsk_llr(dphi, shift, self.scheme.bits_per_symbol, noise_var)

    def roundtrip_fused(self, bits: jnp.ndarray,
                        snr_db: float | None = None,
                        seed=None) -> jnp.ndarray:
        """bits -> bits through the fused Pallas chain kernel on the
        accumulated constellation (see :meth:`_acc_constellation`); the
        differential decode happens at symbol rate outside the kernel.
        Decisions are absolute-then-difference (identical to :meth:`rx` at
        high SNR; both exact noiseless). ``snr_db`` = Es/N0 at the decision
        point, noise drawn in-kernel."""
        from .ops.pallas_chain import fused_pulse_chain

        m_ph, lut = self._acc_constellation()
        bps = self.scheme.bits_per_symbol
        acc = self._acc_symbols(bits, m_ph)
        dec_abs = fused_pulse_chain(
            acc, lut, np.asarray(self.rrc), self.sps, self.span,
            snr_db=snr_db, seed=seed,
        )
        prev = jnp.concatenate(
            [jnp.zeros_like(dec_abs[..., :1]), dec_abs[..., :-1]], axis=-1
        )
        dec = (dec_abs - prev) % m_ph
        return unpack_symbols(dec, bps)


class FskChain:
    """FSK/MSK chain: exact-phase TX (the Modulator's PhaseProgram) plus an
    FM-discriminator RX (config #3). ``coefs`` is the static symbol ->
    frequency-coefficient table; ``dev`` the deviation in rad/sample."""

    def __init__(self, scheme: Scheme, rates: Rates, coefs: np.ndarray,
                 dev_rad_per_sample: float, guard: int = 1):
        if guard < 1:
            # The discriminator's first increment of each symbol spans the
            # boundary (and the stream's very first has no predecessor);
            # guard >= 1 is required for correct decisions.
            raise ValueError("FskChain needs guard >= 1")
        if guard >= rates.samples_per_symbol:
            raise ValueError("guard leaves no interior samples per symbol")
        self.scheme = scheme
        self.rates = rates
        self.mod = Modulator(scheme, rates)
        self.coefs = np.asarray(coefs, np.float32)
        self.dev = float(dev_rad_per_sample)
        self.guard = guard

    def tx(self, bits: jnp.ndarray, state=None):
        st = state if state is not None else self.mod.init_state(bits.shape[:-1])
        (i, q), _ = self.mod.baseband(bits, st)
        return i, q

    def rx(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        inst = fm_discriminate(i, q)
        syms = fsk_slice(inst, self.coefs, self.dev,
                         self.rates.samples_per_symbol, self.guard)
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft(self, i: jnp.ndarray, q: jnp.ndarray,
                noise_var: float = 1.0) -> jnp.ndarray:
        """waveform -> per-bit max-log LLRs ``[..., K*bps]`` in the
        discriminator domain (``noise_var`` = variance of the per-symbol
        mean instantaneous frequency). Sign-of-LLR == :meth:`rx` decisions.
        Completes the soft surface for the FSK family
        (`demodulate.rs:41-43` stops at soft I/Q)."""
        from .ops.llr import fsk_llr
        from .ops.slicer import fsk_symbol_means

        inst = fm_discriminate(i, q)
        mean_f = fsk_symbol_means(inst, self.rates.samples_per_symbol,
                                  self.guard)
        return fsk_llr(mean_f, self.coefs, self.dev,
                       self.scheme.bits_per_symbol, noise_var)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        i, q = self.tx(bits)
        return self.rx(i, q)

    # ---- fused one-way paths ----

    def _phase_program(self, bits: jnp.ndarray):
        from .models.base import PhaseProgram

        syms = pack_bits(bits, self.scheme.bits_per_symbol)
        prog, _ = self.scheme.program(
            syms, self.scheme.init_state(syms.shape[:-1]), self.rates, 0
        )
        if not isinstance(prog, PhaseProgram) or prog.slots_per_symbol != 1:
            raise TypeError("fused FSK supports slots_per_symbol == 1 schemes")
        return prog

    def tx_fused(self, bits: jnp.ndarray):
        """bits -> baseband I/Q via the fused synthesis kernel
        (:func:`modem_tpu.ops.pallas_fsk.fused_fsk_tx`): the scheme's
        symbol-rate integer phase program expands to the waveform in VMEM,
        one HBM write. Matches :meth:`tx` to f32 trig rounding."""
        from .ops.pallas_fsk import fused_fsk_tx

        prog = self._phase_program(bits)
        return fused_fsk_tx(
            prog.fnum, prog.pnum, prog.den, self.rates.samples_per_symbol,
            float(self.scheme.amplitude), float(prog.qshift),
        )

    def rx_fused(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """waveform -> decided bits via the fused discriminator kernel:
        per-symbol mean instantaneous frequency in VMEM (one waveform read),
        nearest-frequency decisions at symbol rate. Decisions equal
        :meth:`rx` away from coefficient midpoints (the two paths differ
        only by the kernel's ~1e-5 rad polynomial atan2)."""
        from .ops.pallas_fsk import fused_discriminator_means
        from .ops.slicer import fsk_slice_means

        mean_f = fused_discriminator_means(
            i, q, self.rates.samples_per_symbol, self.guard)
        syms = fsk_slice_means(mean_f, self.coefs, self.dev)
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft_fused(self, i: jnp.ndarray, q: jnp.ndarray,
                      noise_var: float = 1.0) -> jnp.ndarray:
        """waveform -> per-bit LLRs: fused discriminator means, then the
        symbol-rate discriminator-domain LLR layer (as :meth:`rx_soft`)."""
        from .ops.llr import fsk_llr
        from .ops.pallas_fsk import fused_discriminator_means

        mean_f = fused_discriminator_means(
            i, q, self.rates.samples_per_symbol, self.guard)
        return fsk_llr(mean_f, self.coefs, self.dev,
                       self.scheme.bits_per_symbol, noise_var)

    def roundtrip_fused(self, bits: jnp.ndarray,
                        snr_db: float | None = None, seed=None) -> jnp.ndarray:
        """bits -> bits through the fused Pallas FSK kernel
        (:mod:`modem_tpu.ops.pallas_fsk`): waveform synthesis, FM
        discrimination, and slicing VMEM-resident; optional in-kernel AWGN
        (``snr_db`` = per-complex-sample SNR)."""
        from .ops.pallas_fsk import fused_fsk_chain

        bps = self.scheme.bits_per_symbol
        syms = pack_bits(bits, bps)
        dec = fused_fsk_chain(syms, self.scheme, self.rates, self.guard,
                              snr_db=snr_db, seed=seed)
        return unpack_symbols(dec, bps)


class MskChain:
    """MSK bits->bits: exact half-sine TX (the MSK scheme's PhaseProgram)
    plus discriminator detection with differential decoding.

    The MSK baseband is ``y = A*(s0*cos(th) - j*s1*sin(th))`` with
    ``th = pi*s/(2*spb)`` and per-half-symbol signs ``s0, s1`` (`msk.rs:12-35`
    + the `EvenOddOffset` stagger). Within one half-symbol slot ``y`` is a
    pure tone of frequency ``-s0*s1 * pi/(2*spb)`` rad/sample, so the FM
    discriminator yields one sign per slot, ``c = -s0*s1``; consecutive slot
    products telescope back to the bit signs:

        c[2m]*c[2m+1] = s1[m-1]*s1[m]   ->  s1 by running product
        s0[m] = -c[2m]*s1[m-1]

    seeded by the zero-initialized stagger (``s1[-1] = -1``,
    `data.rs:97-99`). Running sign products are XOR prefix sums — fully
    parallel (SURVEY.md section 7's prefix-sum inversion, applied to RX).
    """

    def __init__(self, rates: Rates, amplitude: float = 1.0, guard: int = 1):
        from .models.fsk import MSK

        if rates.samples_per_symbol % 2:
            raise ValueError("MSK needs even samples_per_symbol")
        self.rates = rates
        self.scheme = MSK(amplitude, rates.samples_per_symbol)
        self.mod = Modulator(self.scheme, rates)
        self.spb = rates.samples_per_symbol // 2
        self.guard = guard
        if guard < 1:
            # Slot boundaries flip the discriminator sign mid-increment;
            # the boundary sample must be excluded from the slot mean.
            raise ValueError("MskChain needs guard >= 1")
        if self.spb - guard < 1:
            raise ValueError("guard leaves no interior samples per slot")

    def tx(self, bits: jnp.ndarray):
        (i, q), _ = self.mod.baseband(bits, self.mod.init_state(bits.shape[:-1]))
        return i, q

    def _decode_cneg(self, c_neg: jnp.ndarray) -> jnp.ndarray:
        """Per-slot discriminator sign bits (1 where c = -1) -> bits, via the
        telescoping slot-product prefix decode (class docstring)."""
        ce, co = c_neg[..., 0::2], c_neg[..., 1::2]  # slots 2m / 2m+1
        # s1[m] sign flips where c[2m]*c[2m+1] = -1; s1[-1] = -1.
        flips = (ce + co) % 2
        s1_neg = (1 + jnp.cumsum(flips, axis=-1)) % 2  # 1 where s1[m] < 0
        s1_prev_neg = jnp.concatenate(
            [jnp.ones_like(s1_neg[..., :1]), s1_neg[..., :-1]], axis=-1
        )
        # s0[m] = -c[2m]*s1[m-1]: negative iff exactly one of
        # {c[2m] negative, s1[m-1] negative} ... -(-1)^a*(-1)^b
        s0_neg = (1 + ce + s1_prev_neg) % 2
        b0 = 1 - s0_neg
        b1 = 1 - s1_neg
        bits = jnp.stack([b0, b1], axis=-1)
        return bits.reshape(bits.shape[:-2] + (2 * b0.shape[-1],))

    def rx(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        inst = fm_discriminate(i, q)
        n_slots = i.shape[-1] // self.spb
        per_slot = inst[..., : n_slots * self.spb].reshape(
            inst.shape[:-1] + (n_slots, self.spb)
        )
        mean_f = jnp.mean(per_slot[..., self.guard:], axis=-1)
        c_neg = (mean_f < 0).astype(jnp.int32)  # 1 where c = -1
        return self._decode_cneg(c_neg)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        return self.rx(*self.tx(bits))

    # ---- fused one-way paths ----

    def _slot_signs(self, bits: jnp.ndarray):
        from .models.base import stagger_bit_planes

        b = bits.reshape(bits.shape[:-1] + (bits.shape[-1] // 2, 2))
        b0, b1 = b[..., 0], b[..., 1]
        prev = jnp.zeros(bits.shape[:-1], jnp.int32)
        b0s, b1s, _ = stagger_bit_planes(b0, b1, prev)
        return 2 * b0s.astype(jnp.int32) - 1, 2 * b1s.astype(jnp.int32) - 1

    def tx_fused(self, bits: jnp.ndarray):
        """bits -> baseband I/Q via the fused MSK synthesis kernel
        (:func:`modem_tpu.ops.pallas_fsk.fused_msk_tx`): staggered slot
        signs expand to the half-sine waveform in VMEM, one HBM write.
        Matches :meth:`tx` to f32 trig rounding."""
        from .ops.pallas_fsk import fused_msk_tx

        s0, s1 = self._slot_signs(bits)
        return fused_msk_tx(s0, s1, self.spb, float(self.scheme.amplitude))

    def rx_fused(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """waveform -> decided bits: fused per-slot discriminator means (one
        waveform read), then the telescoping slot-product prefix decode at
        slot rate. Decisions equal :meth:`rx`."""
        from .ops.pallas_fsk import fused_discriminator_means

        mean_f = fused_discriminator_means(i, q, self.spb, self.guard)
        c_neg = (mean_f < 0).astype(jnp.int32)
        return self._decode_cneg(c_neg)

    def roundtrip_fused(self, bits: jnp.ndarray,
                        snr_db: float | None = None,
                        seed=None) -> jnp.ndarray:
        """bits -> bits through the fused Pallas MSK kernel
        (:func:`modem_tpu.ops.pallas_fsk.fused_msk_slots`): half-sine
        synthesis, FM discrimination and per-slot sign decisions
        VMEM-resident; the telescoping prefix decode runs at slot rate
        outside. ``snr_db`` = per-complex-sample SNR, noise in-kernel."""
        from .models.base import stagger_bit_planes
        from .ops.pallas_fsk import fused_msk_slots

        b = bits.reshape(bits.shape[:-1] + (bits.shape[-1] // 2, 2))
        b0, b1 = b[..., 0], b[..., 1]
        prev = jnp.zeros(bits.shape[:-1], jnp.int32)
        b0s, b1s, _ = stagger_bit_planes(b0, b1, prev)
        s0 = 2 * b0s.astype(jnp.int32) - 1
        s1 = 2 * b1s.astype(jnp.int32) - 1
        c_neg = fused_msk_slots(
            s0, s1, self.spb, float(self.scheme.amplitude), self.guard,
            snr_db=snr_db, seed=seed,
        )
        return self._decode_cneg(c_neg)


class OqpskChain:
    """OQPSK bits->bits: rectangular-pulse offset QPSK with mid-slot
    coherent sampling. The I rail holds ``b0`` over slots [2m, 2m+2), the Q
    rail ``b1`` over [2m+1, 2m+3) (`oqpsk.rs:19-25` + `data.rs:102-123`);
    each rail is sampled in the middle of its hold interval and sign-sliced.
    """

    def __init__(self, rates: Rates, amplitude: float = 1.0):
        from .models.psk import OQPSK

        if rates.samples_per_symbol % 2:
            raise ValueError("OQPSK needs even samples_per_symbol")
        self.rates = rates
        self.scheme = OQPSK(amplitude)
        self.mod = Modulator(self.scheme, rates)
        self.sps = rates.samples_per_symbol

    def tx(self, bits: jnp.ndarray):
        (i, q), _ = self.mod.baseband(bits, self.mod.init_state(bits.shape[:-1]))
        return i, q

    def rx(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        sps, half = self.sps, self.sps // 2
        k = i.shape[-1] // sps
        idx0 = jnp.arange(k, dtype=jnp.int32) * sps + half  # mid of I hold
        # Q's hold for b1[m] is [m*sps + half, (m+1)*sps + half); its middle
        # aligns with the next symbol boundary. The final symbol's Q hold
        # runs past the stream end, so sample its last available point.
        idx1 = jnp.minimum(
            jnp.arange(k, dtype=jnp.int32) * sps + sps, i.shape[-1] - 1
        )
        b0 = (i[..., idx0] > 0).astype(jnp.int32)
        b1 = (q[..., idx1] > 0).astype(jnp.int32)
        bits = jnp.stack([b0, b1], axis=-1)
        return bits.reshape(bits.shape[:-2] + (2 * k,))

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        return self.rx(*self.tx(bits))


class DcqpskChain:
    """pi/4-QPSK bits->bits: coherent slicing against the parity-dependent
    constellation (`dcqpsk.rs:24-44`): symbol k uses the +pi/4-rotated map
    iff k is even — the parity is closed-form in the symbol index, so the RX
    slices even and odd symbols against their respective 4-point tables.
    """

    def __init__(self, rates: Rates, amplitude: float = 1.0):
        from .models.psk import DCQPSK

        self.rates = rates
        self.scheme = DCQPSK(amplitude)
        self.mod = Modulator(self.scheme, rates)
        self.sps = rates.samples_per_symbol

    def tx(self, bits: jnp.ndarray):
        (i, q), _ = self.mod.baseband(bits, self.mod.init_state(bits.shape[:-1]))
        return i, q

    def rx(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        sps = self.sps
        k = i.shape[-1] // sps
        idx = jnp.arange(k, dtype=jnp.int32) * sps + sps // 2
        di, dq = i[..., idx], q[..., idx]
        lut = np.asarray(self.scheme.lut, np.float32)  # [2, 4, 2]
        s_even = lut_slice(di, dq, lut[0])
        s_odd = lut_slice(di, dq, lut[1])
        parity = jnp.arange(k, dtype=jnp.int32) % 2
        syms = jnp.where(parity == 0, s_even, s_odd)
        return unpack_symbols(syms, 2)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        return self.rx(*self.tx(bits))


def qpsk_reference_chain(
    rates: Rates, span_symbols: int = 8, beta: float = 0.35,
    fir_backend: str = "direct",
) -> PulseShapedChain:
    """The BASELINE.md flagship: QPSK + RRC + matched filter at complex
    baseband (`BASELINE.json` config #2)."""
    from .models.psk import QPSK

    return PulseShapedChain(
        QPSK(0.0, 1.0), rates, span_symbols, beta, fir_backend=fir_backend
    )

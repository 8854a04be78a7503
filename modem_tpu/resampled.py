"""BASELINE config #4: QAM with a polyphase rational resampler *in the chain*.

The reference has no resampler (SURVEY.md "What the reference is NOT"); this
composes the mandated extension end-to-end:

    bits -> QAM map -> RRC pulse shaping (sps, symbol-rate polyphase)
         -> rational resample up/down   (modem rate -> DAC/channel rate)
         -> [channel: optional AWGN at the channel rate]
         -> rational resample down/up   (channel rate -> modem rate)
         -> matched filter + delay-compensated symbol sampling
         -> min-distance slice -> bits

Both resample stages run at the *higher* of the two rates internally
(polyphase: ``len(h)/L`` MACs per output, no zero-stuffed stream ever
materialized), and every stage carries explicit streaming state, so chunked
processing (:class:`StreamingResampledChain`) is bit-identical to one-shot.

Group-delay bookkeeping: each resampler is a causal linear-phase lowpass; the
cascade's delay at the modem rate is ``(L1 + L2 - 2) / (2 * up)`` samples
(stage-2's zero-stuffed rate equals stage-1's: both are ``r * up``). The
constructor solves for a stage-2 ``taps_per_phase`` that makes this an exact
integer, so decision instants stay on the symbol grid with no fractional
interpolation.
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from .chain import matched_decision_points, shape_iq
from .config import Rates
from .models.base import Scheme
from .ops.channel import awgn
from .ops.filters import rrc_taps
from .ops.fir import fir_filter
from .ops.polyphase import _phase_bank, polyphase_interp
from .ops.resample import rational_resample, resample_taps
from .ops.slicer import lut_map, lut_slice
from .utils.bits import pack_bits, unpack_symbols


def _solve_stage2_taps(up: int, down: int, t1: int) -> int:
    """Smallest ``t2 >= t1`` with ``(up*t1 + down*t2 - 2) % (2*up) == 0`` —
    i.e. the resampler cascade's group delay is an integer number of
    modem-rate samples. Solvable for any coprime (up, down) once ``t1`` is
    even (gcd(down, 2*up) is then 1 or 2, both dividing ``2 - up*t1``)."""
    for t2 in range(t1, t1 + 2 * up + 1):
        if (up * t1 + down * t2 - 2) % (2 * up) == 0:
            return t2
    raise ValueError(
        f"no integer-delay taps_per_phase for up={up}, down={down}, t1={t1}"
    )


class ResampledChain:
    """16/64-QAM (any constellation-LUT scheme) with a rational resampler
    pair in the loop (`BASELINE.json` configs[3]).

    ``up/down`` is the modem-rate -> channel-rate ratio (reduced internally);
    e.g. ``up=3, down=2`` models a DAC running at 1.5x the modem clock.
    """

    def __init__(
        self,
        scheme: Scheme,
        rates: Rates,
        up: int,
        down: int,
        span_symbols: int = 8,
        beta: float = 0.35,
        taps_per_phase: int = 16,
    ):
        if not hasattr(scheme, "lut"):
            raise TypeError("ResampledChain needs a constellation-LUT scheme")
        g = math.gcd(up, down)
        up, down = up // g, down // g
        if taps_per_phase % 2:
            taps_per_phase += 1  # even t1 guarantees an integer-delay t2
        self.scheme = scheme
        self.rates = rates
        self.up = up
        self.down = down
        self.span = span_symbols
        self.sps = rates.samples_per_symbol
        self.rrc = rrc_taps(self.sps, span_symbols, beta)
        self.lut = np.asarray(scheme.lut, np.float32)
        t2 = _solve_stage2_taps(up, down, taps_per_phase)
        self.taps1 = resample_taps(up, down, taps_per_phase)
        self.taps2 = resample_taps(down, up, t2)
        #: cascade group delay in modem-rate samples (exact integer)
        self.resample_delay = (
            len(self.taps1) + len(self.taps2) - 2
        ) // (2 * up)
        #: symbol decision delay: RRC pair (span*sps) + resampler cascade
        self.delay = self.span * self.sps + self.resample_delay

    # ---- rate/padding bookkeeping ----

    def _padded_len(self, n_symbols: int) -> int:
        """Baseband length after flush + drain + divisibility padding: long
        enough to cover the last delay-compensated decision instant, rounded
        up to a whole number of channel-rate samples."""
        n0 = (n_symbols + self.span) * self.sps
        need = self.delay + (n_symbols - 1) * self.sps + 1
        n_pad = max(n0, need)
        return n_pad + (-n_pad) % self._block_quantum()

    def _block_quantum(self) -> int:
        """Smallest modem-rate block with an integer number of channel-rate
        samples: gcd(up, down) == 1, so ``down`` itself."""
        return self.down

    # ---- TX ----

    def map_symbols(self, bits: jnp.ndarray) -> jnp.ndarray:
        return pack_bits(bits, self.scheme.bits_per_symbol)

    def tx(self, bits: jnp.ndarray):
        """bits -> channel-rate baseband I/Q (resampled by up/down)."""
        syms = self.map_symbols(bits)
        mi, mq = lut_map(syms, self.lut)  # one-hot matmul, not a gather
        si, sq = shape_iq(jnp.stack([mi, mq], axis=-1), self.rrc, self.sps,
                          self.span, polyphase=True)
        n_pad = self._padded_len(syms.shape[-1])
        pad = n_pad - si.shape[-1]
        if pad:
            z = jnp.zeros(si.shape[:-1] + (pad,), si.dtype)
            si = jnp.concatenate([si, z], axis=-1)
            sq = jnp.concatenate([sq, z], axis=-1)
        ci, _ = rational_resample(si, self.up, self.down, self.taps1)
        cq, _ = rational_resample(sq, self.up, self.down, self.taps1)
        return ci, cq

    # ---- RX ----

    def decision_points(self, rx_wave, n_symbols: int):
        ci, cq = rx_wave
        yi, _ = rational_resample(ci, self.down, self.up, self.taps2)
        yq, _ = rational_resample(cq, self.down, self.up, self.taps2)
        return matched_decision_points(
            yi, yq, self.rrc, self.sps, 0, n_symbols, polyphase=True,
            delay=self.delay,
        )

    def rx(self, rx_wave, n_symbols: int) -> jnp.ndarray:
        di, dq = self.decision_points(rx_wave, n_symbols)
        syms = lut_slice(di, dq, self.lut)
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft(self, rx_wave, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        from .ops.llr import lut_llr

        di, dq = self.decision_points(rx_wave, n_symbols)
        return lut_llr(di, dq, self.lut, self.scheme.bits_per_symbol,
                       noise_var)

    # ---- fused paths (ops/pallas_resampled.py) ----

    def tx_fused(self, bits: jnp.ndarray):
        """bits -> channel-rate I/Q through the fused TX kernel (pulse
        shaping + stage-1 resampler in VMEM): matches :meth:`tx` to f32
        reassociation."""
        from .ops.pallas_resampled import fused_resampled_tx

        syms = self.map_symbols(bits)
        return fused_resampled_tx(
            syms, self.lut, np.asarray(self.rrc), self.sps, self.span,
            self.up, self.down, self.taps1,
            self._padded_len(syms.shape[-1]),
        )

    def rx_fused(self, rx_wave, n_symbols: int) -> jnp.ndarray:
        """channel-rate I/Q -> decided bits through the fused RX kernel
        (stage-2 resampler + matched filter + delay-compensated slicing in
        VMEM): decisions equal :meth:`rx` (tested)."""
        from .ops.pallas_resampled import fused_resampled_rx

        syms = fused_resampled_rx(
            rx_wave, n_symbols, self.lut, np.asarray(self.rrc), self.sps,
            self.span, self.up, self.down, self.taps2, self.delay,
        )
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft_fused(self, rx_wave, n_symbols: int,
                      noise_var: float = 1.0) -> jnp.ndarray:
        """channel-rate I/Q -> per-bit LLRs: fused decision-point I/Q
        (``soft=True`` composite kernel), then the symbol-rate LLR layer."""
        from .ops.llr import lut_llr
        from .ops.pallas_resampled import fused_resampled_rx

        di, dq = fused_resampled_rx(
            rx_wave, n_symbols, self.lut, np.asarray(self.rrc), self.sps,
            self.span, self.up, self.down, self.taps2, self.delay, soft=True,
        )
        return lut_llr(di, dq, self.lut, self.scheme.bits_per_symbol,
                       noise_var)

    def roundtrip_fused(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Noiseless bits -> bits via the two fused kernels with the
        channel-rate waveform as the only HBM intermediate."""
        k = bits.shape[-1] // self.scheme.bits_per_symbol
        return self.rx_fused(self.tx_fused(bits), k)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Noiseless bits -> bits (exact for sane configs)."""
        k = bits.shape[-1] // self.scheme.bits_per_symbol
        return self.rx(self.tx(bits), k)

    def ber(self, bits: jnp.ndarray, snr_db: float, key) -> jnp.ndarray:
        """Bit error rate with AWGN applied at the *channel* rate."""
        k = bits.shape[-1] // self.scheme.bits_per_symbol
        ci, cq = self.tx(bits)
        ci, cq = awgn(key, ci, cq, snr_db)
        dec = self.rx((ci, cq), k)
        used = bits[..., : k * self.scheme.bits_per_symbol]
        return jnp.mean((dec != used).astype(jnp.float32))


class StreamingResampledChain:
    """Block-streaming wrapper over :class:`ResampledChain`: arbitrary-size
    ``push(bits)`` calls, decisions emitted as their delay clears, ``flush()``
    drains the pipeline. Bit-identical to the one-shot chain (every stage's
    per-output accumulation order is unchanged; only block seams move).
    """

    def __init__(self, chain: ResampledChain,
                 batch_shape: tuple[int, ...] = ()):
        self.chain = chain
        self.batch = batch_shape
        self.bps = chain.scheme.bits_per_symbol
        c = chain
        kp_i = _phase_bank(c.rrc, c.sps).shape[1]
        f32 = jnp.float32

        def z(n):
            return jnp.zeros(batch_shape + (n,), f32)

        # per-rail carried state for: pulse-shaping interp, resample down,
        # resample up, matched filter
        self._interp = [z(kp_i - 1), z(kp_i - 1)]
        t1 = len(c.taps1) // c.up
        t2 = len(c.taps2) // c.down
        self._rs1 = [z(t1 - 1), z(t1 - 1)]
        self._rs2 = [z(t2 - 1), z(t2 - 1)]
        self._mf = [z(len(c.rrc) - 1), z(len(c.rrc) - 1)]
        # modem-rate samples not yet pushed into the resampler (block quantum)
        self._resid = [z(0), z(0)]
        # matched-filter output awaiting its decision instant
        self._out = [z(0), z(0)]
        self._out_start = 0  # global sample index of self._out[0][..., 0]
        self._sym_emitted = 0
        self._sym_seen = 0
        self._finished = False

    def _advance(self, bi: jnp.ndarray, bq: jnp.ndarray):
        """Push modem-rate baseband through resample -> resample -> matched
        filter, respecting the down-divisibility block quantum."""
        c = self.chain
        bi = jnp.concatenate([self._resid[0], bi], axis=-1)
        bq = jnp.concatenate([self._resid[1], bq], axis=-1)
        n = bi.shape[-1] - bi.shape[-1] % c._block_quantum()
        self._resid = [bi[..., n:], bq[..., n:]]
        if n == 0:
            return
        outs = []
        for r, x in enumerate((bi[..., :n], bq[..., :n])):
            y, self._rs1[r] = rational_resample(
                x, c.up, c.down, c.taps1, state=self._rs1[r]
            )
            y, self._rs2[r] = rational_resample(
                y, c.down, c.up, c.taps2, state=self._rs2[r]
            )
            y, self._mf[r] = fir_filter(y, c.rrc, state=self._mf[r])
            outs.append(y)
        self._out = [
            jnp.concatenate([self._out[0], outs[0]], axis=-1),
            jnp.concatenate([self._out[1], outs[1]], axis=-1),
        ]

    def _emit(self) -> jnp.ndarray:
        """Decide every symbol whose instant is inside the buffered output."""
        c = self.chain
        avail = self._out_start + self._out[0].shape[-1]
        # instants: delay + m*sps for m in [sym_emitted, sym_seen)
        hi = min(
            self._sym_seen,
            (avail - c.delay - 1) // c.sps + 1 if avail > c.delay else 0,
        )
        if hi <= self._sym_emitted:
            return jnp.zeros(self.batch + (0,), jnp.int32)
        idx = (c.delay + jnp.arange(self._sym_emitted, hi) * c.sps
               - self._out_start)
        di = self._out[0][..., idx]
        dq = self._out[1][..., idx]
        syms = lut_slice(di, dq, c.lut)
        self._sym_emitted = hi
        # trim consumed history (keep from the next undecided instant)
        keep_from = c.delay + hi * c.sps - self._out_start
        keep_from = max(min(keep_from, self._out[0].shape[-1]), 0)
        self._out = [o[..., keep_from:] for o in self._out]
        self._out_start += keep_from
        return unpack_symbols(syms, self.bps)

    def push(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., L*bps]`` bits in -> newly-finalized decided bits out."""
        if self._finished:
            raise RuntimeError("stream already flushed")
        if bits.shape[:-1] != self.batch:
            raise ValueError("batch shape is fixed at construction")
        c = self.chain
        syms = pack_bits(bits, self.bps)
        self._sym_seen += syms.shape[-1]
        mi, mq = lut_map(syms, c.lut)
        iq = jnp.stack([mi, mq], axis=-1)
        outs = []
        for r in range(2):
            y, self._interp[r] = polyphase_interp(
                iq[..., r], c.rrc, c.sps, state=self._interp[r]
            )
            outs.append(y)
        self._advance(*outs)
        return self._emit()

    def flush(self) -> jnp.ndarray:
        """Drain: span zero-IQ flush symbols through the pulse shaper, then
        zero samples until every pending decision instant has cleared."""
        c = self.chain
        zsym = jnp.zeros(self.batch + (c.span,), jnp.float32)
        outs = []
        for r in range(2):
            y, self._interp[r] = polyphase_interp(
                zsym, c.rrc, c.sps, state=self._interp[r]
            )
            outs.append(y)
        self._advance(*outs)
        # zero samples to push the last instant through the cascade + quantum
        need = c.delay + (self._sym_seen - 1) * c.sps + 1
        have = (self._out_start + self._out[0].shape[-1]
                + self._resid[0].shape[-1])
        pad = max(need - have, 0) + c._block_quantum()
        self._advance(*(jnp.zeros(self.batch + (pad,), jnp.float32),) * 2)
        out = self._emit()
        self._finished = True
        return out

"""SC-FDE: single-carrier block transmission with cyclic prefix and MMSE
frequency-domain equalization.

The third canonical CP waveform family next to plain single-carrier
(:mod:`modem_tpu.chain`) and OFDM (:mod:`modem_tpu.ofdm`), used where OFDM's
peak-to-average ratio is unaffordable (uplinks, power-limited radios:
LTE SC-FDMA, 802.11ad SC PHY are this shape). Payload symbols stay in the
time domain — constant single-carrier envelope — while equalization happens
in the frequency domain: strip CP, DFT, one-tap MMSE against the estimated
channel, IDFT back, slice. Each data symbol is spread over ALL bins, so a
spectral null costs a little SNR everywhere instead of erasing specific
symbols (the dual of OFDM's per-bin fading; contrast test in
``tests/test_scfde.py``).

TPU shaping, same rules as the OFDM modem (`ofdm.py`):

* DFT/IDFT are unitary real ``[N, N]`` MXU matmuls (cos/sin pairs from
  `_dft_rows`) — no FFT op, no complex dtype anywhere;
* CP add/strip are reshapes + static slices;
* the channel estimate comes from repeated Zadoff-Chu training blocks —
  CAZAC in both domains, so per-bin division is a constant-magnitude
  rotation (numerically ideal), and the estimator is one matmul + mean;
* MMSE weights, equalization, and the IDFT fuse into elementwise algebra
  between two matmuls; the slicer is the shared LUT min-distance slice.

The reference has no equalization at all (SURVEY.md "What the reference is
NOT"); this subsystem is new capability alongside `ofdm.py`.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp

from .ofdm import _angle, _dft_rows
from .ops.llr import lut_llr
from .ops.sync_metric import (aligned_frame_matmul, periodic_similarity,
                              template_correlate_fir)
from .ops.slicer import lut_map, lut_slice
from .utils.bits import pack_bits, unpack_symbols


@lru_cache(maxsize=8)
def _zadoff_chu(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Even-length Zadoff-Chu root-1 sequence ``x[k] = exp(-j pi k^2/n)``:
    constant amplitude in time AND frequency (CAZAC)."""
    k = np.arange(n, dtype=np.float64)
    ang = -np.pi * k * k / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


class ScFdeModem:
    """Single-carrier frequency-domain-equalized block modem.

    Frame layout (every block CP-prefixed, ``sym_len = n + cp`` samples):

        [ZC training] * n_ltf  +  [payload block] * n_blocks

    ``tx_frame(bits)`` -> ``(i, q)``; ``rx_frame(i, q, n_blocks,
    noise_var)`` -> bits, with the channel re-estimated from the frame's
    own training blocks (CP-contained multipath is equalized exactly at
    high SNR). ``noise_var`` is the per-complex-sample noise variance the
    MMSE weights assume; 0.0 degenerates to zero-forcing.
    """

    def __init__(self, scheme, n: int = 64, cp: int = 16, n_ltf: int = 2):
        if not hasattr(scheme, "lut"):
            raise ValueError("SC-FDE needs a constellation (LUT) scheme")
        if n_ltf < 1:
            raise ValueError("need n_ltf >= 1 training blocks")
        if cp >= n:
            raise ValueError("cp must be shorter than the block")
        self.scheme = scheme
        self.lut = np.asarray(scheme.lut, np.float32)
        self.bits_per_symbol = scheme.bits_per_symbol
        self.n = int(n)
        self.cp = int(cp)
        self.sym_len = self.n + self.cp
        self.n_ltf = int(n_ltf)

        # unitary full-band DFT as real matmuls: bins 0..n-1
        c, s = _dft_rows(self.n, tuple(range(self.n)))
        self._c = (c / np.sqrt(self.n)).astype(np.float32)  # [N, N]
        self._s = (s / np.sqrt(self.n)).astype(np.float32)

        zi, zq = _zadoff_chu(self.n)
        self._zc_i, self._zc_q = zi, zq
        self._es = float(np.mean(np.sum(self.lut ** 2, axis=-1)))
        # training block's frequency response (unitary DFT of the ZC)
        self._zf_i = (zi @ self._c.T + zq @ self._s.T)
        self._zf_q = (zq @ self._c.T - zi @ self._s.T)
        # |X(k)|^2 is constant 1.0 for unitary-DFT CAZAC; keep the exact
        # computed value per bin anyway (float rounding)
        self._zf_m2 = self._zf_i ** 2 + self._zf_q ** 2

        # full preamble template (CP'd ZC blocks) for blind fine timing
        self._preamble_i = np.tile(
            np.concatenate([zi[-self.cp:], zi]), self.n_ltf)
        self._preamble_q = np.tile(
            np.concatenate([zq[-self.cp:], zq]), self.n_ltf)

    # ------------------------------------------------------------------

    @property
    def preamble_len(self) -> int:
        return self.n_ltf * self.sym_len

    def frame_len(self, n_blocks: int) -> int:
        return (self.n_ltf + n_blocks) * self.sym_len

    def bits_per_frame(self, n_blocks: int) -> int:
        return n_blocks * self.n * self.bits_per_symbol

    def _add_cp(self, x: jnp.ndarray) -> jnp.ndarray:
        """``[..., B, N]`` -> ``[..., B*(cp+N)]``."""
        ext = jnp.concatenate([x[..., -self.cp:], x], axis=-1)
        return ext.reshape(ext.shape[:-2] + (-1,))

    def _strip_cp(self, x: jnp.ndarray, n_blocks: int) -> jnp.ndarray:
        """``[..., B*(cp+N)]`` -> ``[..., B, N]``."""
        b = x.reshape(x.shape[:-1] + (n_blocks, self.sym_len))
        return b[..., self.cp:]

    def _dft(self, xi: jnp.ndarray, xq: jnp.ndarray):
        return (xi @ self._c.T + xq @ self._s.T,
                xq @ self._c.T - xi @ self._s.T)

    def _idft(self, yi: jnp.ndarray, yq: jnp.ndarray):
        # unitary inverse = conjugate-transpose; C symmetric, S antisym in
        # the (k, n) exponent so reuse the same matrices with flipped sign
        return (yi @ self._c - yq @ self._s,
                yq @ self._c + yi @ self._s)

    # ------------------------------------------------------------------

    def tx_frame(self, bits: jnp.ndarray):
        """``[..., n_blocks*N*bps]`` bits -> ``(i, q)`` frame waveform."""
        syms = pack_bits(bits, self.bits_per_symbol)
        if syms.shape[-1] % self.n:
            raise ValueError(
                f"bits must fill whole {self.n}-symbol blocks")
        di, dq = lut_map(syms, self.lut)
        shape = syms.shape[:-1] + (-1, self.n)
        pi = self._add_cp(di.reshape(shape))
        pq = self._add_cp(dq.reshape(shape))
        hi = jnp.broadcast_to(jnp.asarray(self._preamble_i),
                              pi.shape[:-1] + (self.preamble_len,))
        hq = jnp.broadcast_to(jnp.asarray(self._preamble_q),
                              pq.shape[:-1] + (self.preamble_len,))
        return (jnp.concatenate([hi, pi], axis=-1),
                jnp.concatenate([hq, pq], axis=-1))

    def estimate_channel(self, i: jnp.ndarray, q: jnp.ndarray):
        """Aligned training section ``[..., n_ltf*sym_len]`` -> per-bin
        ``(hi, hq) [..., N]`` (LS, averaged over repetitions)."""
        xi = self._strip_cp(i, self.n_ltf)
        xq = self._strip_cp(q, self.n_ltf)
        yi, yq = self._dft(xi, xq)
        zi = jnp.asarray(self._zf_i)
        zq = jnp.asarray(self._zf_q)
        m2 = jnp.asarray(self._zf_m2)
        hi = jnp.mean((yi * zi + yq * zq) / m2, axis=-2)
        hq = jnp.mean((yq * zi - yi * zq) / m2, axis=-2)
        return hi, hq

    def _equalize(self, i: jnp.ndarray, q: jnp.ndarray, n_blocks: int,
                  h, noise_var: float):
        """Aligned payload ``[..., n_blocks*sym_len]`` -> time-domain
        decision points ``(di, dq, mse)``; ``mse`` is the per-symbol
        post-FDE error variance (the soft-decision noise scale)."""
        xi = self._strip_cp(i, n_blocks)
        xq = self._strip_cp(q, n_blocks)
        yi, yq = self._dft(xi, xq)
        hi, hq = h
        hi = hi[..., None, :]
        hq = hq[..., None, :]
        m2 = hi * hi + hq * hq
        # MMSE in symbol-energy units: g = noise_var / Es
        g = jnp.float32(noise_var / self._es)
        den = m2 + g
        wi = hi / den          # W = conj(H) / (|H|^2 + g)
        wq = -hq / den
        ei = yi * wi - yq * wq
        eq = yq * wi + yi * wq
        # bias removal: raw MMSE output is alpha * s + noise with
        # alpha = mean_k |H_k|^2/(|H_k|^2 + g) < 1; divide it out so the
        # min-distance slicer sees unbiased constellation points
        alpha = jnp.maximum(jnp.mean(m2 / den, axis=-1), 1e-12)  # [..., 1]
        di, dq = self._idft(ei, eq)
        di = di / alpha[..., None]
        dq = dq / alpha[..., None]
        # unbiased post-MMSE per-symbol error variance (classic result):
        # sigma_e^2 = Es * (1/alpha - 1) -- the soft demapper's noise scale
        mse = self._es * (1.0 / alpha[..., 0] - 1.0)
        return di, dq, mse

    def rx_frame(self, i: jnp.ndarray, q: jnp.ndarray, n_blocks: int,
                 noise_var: float = 0.0) -> jnp.ndarray:
        """Frame-aligned waveform -> hard bits (channel re-estimated from
        the frame's own training blocks)."""
        p = self.preamble_len
        h = self.estimate_channel(i[..., :p], q[..., :p])
        di, dq, _ = self._equalize(i[..., p:], q[..., p:], n_blocks, h,
                                   noise_var)
        syms = lut_slice(di, dq, self.lut)
        bits = unpack_symbols(syms, self.bits_per_symbol)
        return bits.reshape(bits.shape[:-2] + (-1,))

    def rx_soft_frame(self, i: jnp.ndarray, q: jnp.ndarray,
                      n_blocks: int, noise_var: float) -> jnp.ndarray:
        """Frame-aligned waveform -> max-log LLRs scaled by the post-FDE
        SNR (what downstream soft FEC expects)."""
        p = self.preamble_len
        h = self.estimate_channel(i[..., :p], q[..., :p])
        di, dq, mse = self._equalize(i[..., p:], q[..., p:], n_blocks, h,
                                     noise_var)
        llr = lut_llr(di, dq, self.lut, self.bits_per_symbol, 1.0)
        w = 2.0 / jnp.maximum(mse, 1e-12)  # per-rail var = mse/2
        llr = llr * w[..., None, None]
        return llr.reshape(llr.shape[:-2] + (-1,))


    # ------------------------------------------------------------------
    # Blind acquisition (same front end shape as OfdmModem: coarse
    # periodic-similarity timing + CFO, derotate, FIR-template fine
    # timing) -- the repeated CP'd ZC training blocks give a period of
    # exactly sym_len samples over the whole preamble.
    # ------------------------------------------------------------------

    def sc_metric(self, i: jnp.ndarray, q: jnp.ndarray, max_lag: int):
        """Periodic-similarity timing metric over lags ``[0, max_lag)``
        using the training blocks' ``sym_len`` repetition (needs
        ``n_ltf >= 2``). Returns ``(M, P_i, P_q)``, ``M in [0, 1]``."""
        if self.n_ltf < 2:
            raise ValueError("blind sync needs n_ltf >= 2 training blocks")
        return periodic_similarity(i, q, lag=self.sym_len,
                                   width=self.sym_len, max_lag=max_lag)

    def locate_frame(self, i: jnp.ndarray, q: jnp.ndarray,
                     n_blocks: int, max_lag: int,
                     aligner: str = "matmul"):
        """Blind front end: coarse timing + fractional CFO (range
        ``±0.5/sym_len`` cycles/sample -- tighter than OFDM's because the
        repetition period is a whole block), derotation, full-preamble
        FIR fine timing, aligned-frame extraction (one-hot matmul by
        default; ``aligner="gather"`` keeps the ``take_along_axis`` form
        as the A/B reference — see :func:`ops.sync_metric.
        aligned_frame_matmul`). Returns ``(fi, fq, report)``."""
        need = max_lag + self.frame_len(n_blocks)
        if i.shape[-1] < need:
            pad = jnp.zeros(i.shape[:-1] + (need - i.shape[-1],), i.dtype)
            i = jnp.concatenate([i, pad], axis=-1)
            q = jnp.concatenate([q, pad], axis=-1)
        m, ps_i, ps_q = self.sc_metric(i, q, max_lag + self.cp)
        coarse = jnp.argmax(m, axis=-1)
        pk_i = jnp.take_along_axis(ps_i, coarse[..., None], axis=-1)
        pk_q = jnp.take_along_axis(ps_q, coarse[..., None], axis=-1)
        cfo = _angle(pk_i, pk_q) / self.sym_len  # rad/sample
        n = jnp.arange(i.shape[-1], dtype=jnp.float32)
        th = -cfo * n
        c, s = jnp.cos(th), jnp.sin(th)
        ci = i * c - q * s
        cq = i * s + q * c
        cr, cj = template_correlate_fir(ci, cq, self._preamble_i,
                                        self._preamble_q, max_lag)
        start = jnp.argmax(cr * cr + cj * cj, axis=-1).astype(jnp.int32)
        flen = self.frame_len(n_blocks)
        if aligner == "matmul":
            fi, fq = aligned_frame_matmul(ci, cq, start, flen, max_lag)
        elif aligner == "gather":
            fidx = start[..., None] + jnp.arange(flen, dtype=jnp.int32)
            fi = jnp.take_along_axis(ci, fidx, axis=-1)
            fq = jnp.take_along_axis(cq, fidx, axis=-1)
        else:
            raise ValueError(f"unknown aligner {aligner!r}")
        report = {"start": start, "cfo_rad_per_sample": cfo[..., 0],
                  "sc_peak": jnp.take_along_axis(m, coarse[..., None],
                                                 axis=-1)[..., 0]}
        return fi, fq, report

    def acquire(self, i: jnp.ndarray, q: jnp.ndarray, n_blocks: int,
                max_lag: int, noise_var: float = 0.0):
        """Blind RX: unknown frame start in ``[0, max_lag)``, small CFO,
        flat gain/phase and CP-short multipath. Returns
        ``(bits, report)``."""
        fi, fq, report = self.locate_frame(i, q, n_blocks, max_lag)
        return self.rx_frame(fi, fq, n_blocks, noise_var), report


class ScFdeChain:
    """Chain-protocol adapter (same shape as :class:`modem_tpu.ofdm
    .OfdmChain`): lets :class:`modem_tpu.link.FramedLink` run over the
    SC-FDE PHY. One SC-FDE block is "a symbol" carrying ``N * bps`` bits."""

    class _Shim:
        def __init__(self, bits_per_symbol: int):
            self.bits_per_symbol = bits_per_symbol

    def __init__(self, modem: ScFdeModem):
        self.modem = modem
        self.scheme = self._Shim(modem.n * modem.bits_per_symbol)

    def tx(self, bits: jnp.ndarray):
        return self.modem.tx_frame(bits)

    def rx_soft(self, iq, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        i, q = iq
        return self.modem.rx_soft_frame(i, q, n_symbols, noise_var)

    def rx(self, iq, n_symbols: int) -> jnp.ndarray:
        i, q = iq
        return self.modem.rx_frame(i, q, n_symbols)

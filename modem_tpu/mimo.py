"""2x2 MIMO spatial multiplexing over the OFDM PHY (per-subcarrier MMSE).

New capability (nothing in the reference is multi-antenna; reference repo
equivalent: none): where :mod:`modem_tpu.stbc` spends the second antenna
on *diversity* (same data, more reliable), spatial multiplexing spends it
on *rate* — two independent symbol streams share every subcarrier and the
receiver separates them with per-bin 2x2 MMSE detection. Same airtime,
twice the bits: this is the 802.11n/LTE workhorse mode downstream of the
soft-output layer this framework produces.

Signal model per data subcarrier k (channels static over the frame, one
CP length of delay spread per path — the usual OFDM assumptions):

    [y1]   [h11 h12] [sA]
    [y2] = [h21 h22] [sB]  + noise

TPU shaping:

* The 2x2 complex MMSE solve is CLOSED FORM — ``A = H^H H + g I`` is 2x2
  Hermitian positive definite, inverted by adjugate/determinant. No
  ``linalg.solve``, no complex dtype: everything is elementwise
  split-plane algebra over ``[..., D]`` bins around the same reduced-DFT
  matmuls as :class:`modem_tpu.ofdm.OfdmModem`, batched over channels and
  symbols. ZF is the ``noise_var=0`` special case.
* Channel estimation uses time-orthogonal LTFs exactly like
  :mod:`modem_tpu.stbc`: the frame is ``[STF][LTF from A][LTF from B]``
  then simultaneous payload on both antennas, so each receive antenna
  gets standard LS estimates of its two channel entries from clean slots.
* Per-stream soft outputs carry the textbook unbiased-MMSE weights: with
  ``d_k = g [A^{-1}]_kk``, stream k's estimate is rescaled by
  ``1/(1 - d_k)`` (bias removal, same convention as
  :meth:`modem_tpu.scfde.ScFdeModem._equalize`) and its LLRs are weighted
  by the post-detection SINR ``(1 - d_k)/(d_k Es)`` — the SISO limit of
  which is exactly the ``|H|^2/noise_var`` weight the OFDM modem uses.

Frames assume timing alignment (acquire timing/CFO with the
:class:`~modem_tpu.ofdm.OfdmModem` front end first, as with STBC).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ofdm import OfdmModem, _default_grid
from .ops.llr import lut_llr
from .ops.slicer import lut_slice
from .utils.bits import unpack_symbols


class MimoOfdm:
    """2x2 spatially-multiplexed OFDM.

    ``scheme``: any constellation scheme. Each payload OFDM symbol slot
    carries TWO independent streams (``2 * bits_per_sym`` bits/slot).
    :meth:`tx` returns two antenna waveforms; :meth:`rx_frame` takes two
    receive-antenna captures.
    """

    def __init__(self, scheme, n_fft: int = 64, cp: int = 16,
                 seed: int = 2016, **modem_kwargs):
        data, pilots = _default_grid(n_fft)
        # pilotless inner modem, one LTF per antenna slot (as stbc.py)
        self.m = OfdmModem(scheme, n_fft=n_fft, cp=cp,
                           data_bins=data + pilots, pilot_bins=(),
                           n_ltf=1, seed=seed, **modem_kwargs)
        self.bits_per_slot = 2 * self.m.bits_per_sym
        self._es = float(np.mean(np.sum(
            np.asarray(self.m.lut, np.float32) ** 2, axis=-1)))

    @property
    def preamble_len(self) -> int:
        """STF + one LTF slot per transmit antenna."""
        return 3 * self.m.sym_len

    def frame_len(self, n_symbols: int) -> int:
        return self.preamble_len + n_symbols * self.m.sym_len

    def bits_per_frame(self, n_symbols: int) -> int:
        return n_symbols * self.bits_per_slot

    # ------------------------------------------------------------------

    def tx(self, bits: jnp.ndarray):
        """``[..., n_symbols*bits_per_slot]`` bits -> two antenna
        waveforms ``((ia, qa), (ib, qb))``, each ``[..., frame_len]``.

        Bit layout: slot s carries virtual symbols 2s (stream A) and
        2s+1 (stream B) of the inner modem's bit mapping.
        """
        m = self.m
        di, dq = m.map_bits(bits)                # [..., 2S, D]
        if di.shape[-2] % 2:
            raise ValueError("need an even number of virtual symbols")
        ai, aq = di[..., 0::2, :], dq[..., 0::2, :]
        bi, bq = di[..., 1::2, :], dq[..., 1::2, :]

        def frame(head_parts, xi, xq):
            ti, tq = m._payload_td(xi, xq)
            pi, pq = m._add_cp(ti, tq, m.cp)
            hi = np.concatenate([p[0] for p in head_parts]).astype(
                np.float32)
            hq = np.concatenate([p[1] for p in head_parts]).astype(
                np.float32)
            hi = jnp.broadcast_to(jnp.asarray(hi),
                                  pi.shape[:-1] + (hi.size,))
            hq = jnp.broadcast_to(jnp.asarray(hq),
                                  pq.shape[:-1] + (hq.size,))
            return (jnp.concatenate([hi, pi], axis=-1),
                    jnp.concatenate([hq, pq], axis=-1))

        def with_cp(t):
            return np.concatenate([t[-m.cp:], t])

        z = (np.zeros(m.sym_len, np.float32),) * 2
        stf = (with_cp(m._stf_ti), with_cp(m._stf_tq))
        ltf = (with_cp(m._ltf_ti), with_cp(m._ltf_tq))
        wa = frame([stf, ltf, z], ai, aq)
        wb = frame([z, z, ltf], bi, bq)
        return wa, wb

    # ------------------------------------------------------------------

    def _estimates_and_spectra(self, i: jnp.ndarray, q: jnp.ndarray,
                               n_symbols: int):
        """One receive antenna's aligned capture -> its two LS channel
        estimates (vs TX A and TX B) on the data bins + payload spectra."""
        m = self.m
        sl = m.sym_len
        ha = m.estimate_channel(i[..., sl:2 * sl], q[..., sl:2 * sl])
        hb = m.estimate_channel(i[..., 2 * sl:3 * sl],
                                q[..., 2 * sl:3 * sl])
        off = self.preamble_len
        xi, xq = m._strip_cp(i[..., off:], q[..., off:], n_symbols)
        rc = jnp.asarray(m._rx_cd)
        rs = jnp.asarray(m._rx_sd)
        yi = xi @ rc + xq @ rs                   # [..., S, D]
        yq = xq @ rc - xi @ rs
        didx = m._data_in_used
        sel = lambda h: (h[0][..., didx], h[1][..., didx])  # noqa: E731
        return sel(ha), sel(hb), yi, yq

    def detect(self, i1, q1, i2, q2, n_symbols: int,
               noise_var: float = 0.0):
        """Two aligned receive captures -> per-stream decision points.

        Returns ``(di, dq, w)``: unbiased MMSE estimates interleaved back
        to the virtual-symbol stream ``[..., 2S, D]`` plus the per-stream
        LLR weights ``w [..., 2, D]`` (post-detection SINR / Es;
        ``noise_var=0`` is zero-forcing, whose weights are meaningful
        only for hard slicing).
        """
        (h11i, h11q), (h12i, h12q), y1i, y1q = \
            self._estimates_and_spectra(i1, q1, n_symbols)
        (h21i, h21q), (h22i, h22q), y2i, y2q = \
            self._estimates_and_spectra(i2, q2, n_symbols)
        g = jnp.float32(noise_var / self._es)
        # A = H^H H + g I (2x2 Hermitian PD), per data bin [..., D]
        a11 = h11i * h11i + h11q * h11q + h21i * h21i + h21q * h21q + g
        a22 = h12i * h12i + h12q * h12q + h22i * h22i + h22q * h22q + g
        a12i = h11i * h12i + h11q * h12q + h21i * h22i + h21q * h22q
        a12q = h11i * h12q - h11q * h12i + h21i * h22q - h21q * h22i
        det = jnp.maximum(a11 * a22 - (a12i * a12i + a12q * a12q), 1e-24)
        # z = H^H y, broadcast channel [..., 1, D] against symbols
        def bc(x):
            return x[..., None, :]
        z1i = (bc(h11i) * y1i + bc(h11q) * y1q
               + bc(h21i) * y2i + bc(h21q) * y2q)
        z1q = (bc(h11i) * y1q - bc(h11q) * y1i
               + bc(h21i) * y2q - bc(h21q) * y2i)
        z2i = (bc(h12i) * y1i + bc(h12q) * y1q
               + bc(h22i) * y2i + bc(h22q) * y2q)
        z2q = (bc(h12i) * y1q - bc(h12q) * y1i
               + bc(h22i) * y2q - bc(h22q) * y2i)
        # s = A^{-1} z via the 2x2 adjugate
        ddet = bc(det)
        s1i = (bc(a22) * z1i - (bc(a12i) * z2i - bc(a12q) * z2q)) / ddet
        s1q = (bc(a22) * z1q - (bc(a12i) * z2q + bc(a12q) * z2i)) / ddet
        s2i = (bc(a11) * z2i - (bc(a12i) * z1i + bc(a12q) * z1q)) / ddet
        s2q = (bc(a11) * z2q - (bc(a12i) * z1q - bc(a12q) * z1i)) / ddet
        # bias removal + SINR weights: d_k = g [A^{-1}]_kk
        d1 = jnp.clip(g * a22 / det, 0.0, 1.0 - 1e-6)
        d2 = jnp.clip(g * a11 / det, 0.0, 1.0 - 1e-6)
        s1i = s1i / bc(1.0 - d1)
        s1q = s1q / bc(1.0 - d1)
        s2i = s2i / bc(1.0 - d2)
        s2q = s2q / bc(1.0 - d2)
        w1 = (1.0 - d1) / (jnp.maximum(d1, 1e-12) * self._es)
        w2 = (1.0 - d2) / (jnp.maximum(d2, 1e-12) * self._es)
        # interleave streams back to the virtual-symbol order [..., 2S, D]
        gi = jnp.stack([s1i, s2i], axis=-2)      # [..., S, 2, D]
        gq = jnp.stack([s1q, s2q], axis=-2)
        shp = gi.shape[:-3] + (2 * gi.shape[-3],) + gi.shape[-1:]
        w = jnp.stack([w1, w2], axis=-2)         # [..., 2, D]
        return gi.reshape(shp), gq.reshape(shp), w

    def rx_frame(self, i1, q1, i2, q2, n_symbols: int,
                 noise_var: float = 0.0) -> jnp.ndarray:
        """Two frame-aligned receive captures -> hard bits
        ``[..., n_symbols*bits_per_slot]``."""
        di, dq, _ = self.detect(i1, q1, i2, q2, n_symbols, noise_var)
        syms = lut_slice(di, dq, self.m.lut)
        bits = unpack_symbols(syms, self.m.bits_per_symbol)
        return bits.reshape(bits.shape[:-2] + (-1,))

    def rx_soft_frame(self, i1, q1, i2, q2, n_symbols: int,
                      noise_var: float) -> jnp.ndarray:
        """Two frame-aligned receive captures -> SINR-weighted max-log
        LLRs (per-stream weights; what downstream soft FEC expects)."""
        m = self.m
        di, dq, w = self.detect(i1, q1, i2, q2, n_symbols, noise_var)
        llr = lut_llr(di, dq, m.lut, m.bits_per_symbol, 1.0)
        wb = jnp.repeat(w, m.bits_per_symbol, axis=-1,
                        total_repeat_length=m.bits_per_sym)  # [..., 2, B]
        s = di.shape[-2] // 2
        wb = jnp.tile(wb, (1,) * (wb.ndim - 2) + (s, 1))     # [..., 2S, B]
        llr = llr * wb
        return llr.reshape(llr.shape[:-2] + (-1,))

    def as_link_chain(self):
        """Chain-protocol adapter so :class:`modem_tpu.link.FramedLink`
        runs over the MIMO PHY (one "symbol" = one payload slot =
        ``bits_per_slot`` bits). The waveform is the opaque pair of
        antenna streams; ``rx``/``rx_soft`` take the pair of aligned
        receive captures ``(i1, q1, i2, q2)``."""
        return _MimoChain(self)


class _MimoScheme:
    def __init__(self, bits_per_symbol: int):
        self.bits_per_symbol = bits_per_symbol


class _MimoChain:
    """FramedLink adapter for :class:`MimoOfdm`."""

    def __init__(self, mimo: MimoOfdm):
        self.mimo = mimo
        self.scheme = _MimoScheme(mimo.bits_per_slot)

    def tx(self, bits: jnp.ndarray):
        return self.mimo.tx(bits)

    def rx_soft(self, y, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        i1, q1, i2, q2 = y
        return self.mimo.rx_soft_frame(i1, q1, i2, q2, n_symbols,
                                       noise_var=noise_var)

    def rx(self, y, n_symbols: int) -> jnp.ndarray:
        i1, q1, i2, q2 = y
        return self.mimo.rx_frame(i1, q1, i2, q2, n_symbols)

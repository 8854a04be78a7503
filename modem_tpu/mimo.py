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


# ---------------------------------------------------------------------------
# N x N spatial multiplexing: split-plane small-matrix MMSE (round 4)
# ---------------------------------------------------------------------------
#
# Complex matrices are (re, im) array pairs with two trailing static
# dims [..., m, n]; products are HIGHEST-precision einsums over those
# small dims (batched over bins/channels), and the Hermitian-PD inverse
# is a RECURSIVE SCHUR COMPLEMENT bottoming out at the 1x1/2x2 adjugate
# closed forms — every leading block of a Hermitian PD matrix is itself
# PD, so the recursion never needs pivoting. No linalg.solve, no complex
# dtype, no per-bin loop: the 4x4 (or any nt) MMSE is pure elementwise/
# small-einsum algebra over [..., D, nt, nt] tensors, exactly the shape
# XLA fuses well on TPU.

import jax as _jax


def _hp():
    return _jax.lax.Precision.HIGHEST


def _cmm(a, b):
    """(re, im) matmul over the two trailing dims."""
    ar, ai = a
    br, bi = b
    rr = (jnp.einsum("...ik,...kj->...ij", ar, br, precision=_hp())
          - jnp.einsum("...ik,...kj->...ij", ai, bi, precision=_hp()))
    ri = (jnp.einsum("...ik,...kj->...ij", ar, bi, precision=_hp())
          + jnp.einsum("...ik,...kj->...ij", ai, br, precision=_hp()))
    return rr, ri


def _chermt(a):
    ar, ai = a
    return (jnp.swapaxes(ar, -1, -2), -jnp.swapaxes(ai, -1, -2))


def _csub(a, b):
    return a[0] - b[0], a[1] - b[1]


def _cinv_h(a, n: int):
    """Inverse of a Hermitian positive-definite (re, im) matrix pair.

    ``n`` is the static size. Base cases by adjugate (determinants are
    real for Hermitian input, clamped away from 0); larger sizes split
    ``[[P, Q], [Q^H, S]]`` and recurse on P and the Schur complement.
    """
    ar, ai = a
    if n == 1:
        d = jnp.maximum(ar[..., 0, 0], 1e-24)
        return (1.0 / d)[..., None, None], jnp.zeros_like(ai)
    if n == 2:
        p = ar[..., 0, 0]
        s = ar[..., 1, 1]
        br, bi = ar[..., 0, 1], ai[..., 0, 1]
        det = jnp.maximum(p * s - (br * br + bi * bi), 1e-24)
        rr = jnp.stack([
            jnp.stack([s, -br], axis=-1),
            jnp.stack([-br, p], axis=-1)], axis=-2) / det[..., None, None]
        ri = jnp.stack([
            jnp.stack([jnp.zeros_like(bi), -bi], axis=-1),
            jnp.stack([bi, jnp.zeros_like(bi)], axis=-1)],
            axis=-2) / det[..., None, None]
        return rr, ri
    m = n // 2
    blk = lambda x, r0, r1, c0, c1: x[..., r0:r1, c0:c1]  # noqa: E731
    p = (blk(ar, 0, m, 0, m), blk(ai, 0, m, 0, m))
    q = (blk(ar, 0, m, m, n), blk(ai, 0, m, m, n))
    s = (blk(ar, m, n, m, n), blk(ai, m, n, m, n))
    pi = _cinv_h(p, m)
    b = _cmm(pi, q)                       # P^{-1} Q, [.., m, n-m]
    t = _cinv_h(_csub(s, _cmm(_chermt(q), b)), n - m)
    bt = _cmm(b, t)
    tl = (pi[0] + _cmm(bt, _chermt(b))[0], pi[1] + _cmm(bt, _chermt(b))[1])
    tr = (-bt[0], -bt[1])
    bl = _chermt(tr)
    rr = jnp.concatenate([
        jnp.concatenate([tl[0], tr[0]], axis=-1),
        jnp.concatenate([bl[0], t[0]], axis=-1)], axis=-2)
    ri = jnp.concatenate([
        jnp.concatenate([tl[1], tr[1]], axis=-1),
        jnp.concatenate([bl[1], t[1]], axis=-1)], axis=-2)
    return rr, ri


class MimoOfdmN:
    """``nt x nr`` spatially-multiplexed OFDM (nt streams, nr >= nt
    receive antennas), per-subcarrier MMSE — the N-antenna
    generalization of :class:`MimoOfdm` (5G operates this at 4x4).

    Frame: ``[STF][LTF slot per TX antenna][payload]``; payload slot s
    carries ``nt`` independent streams (``nt * bits_per_sym`` bits).
    Detection inverts ``A = H^H H + g I`` (``nt x nt`` Hermitian PD per
    data bin) by recursive Schur complement in split I/Q planes (see
    module notes above); bias removal and the post-detection-SINR LLR
    weights follow the same unbiased-MMSE convention as the 2x2 class
    and the SISO chain, so downstream FEC sees consistently scaled
    beliefs. Antenna axes are stacked tensors ``[..., nt|nr, samples]``.
    """

    def __init__(self, scheme, nt: int = 4, n_fft: int = 64, cp: int = 16,
                 seed: int = 2016, **modem_kwargs):
        if nt < 1:
            raise ValueError("nt must be >= 1")
        data, pilots = _default_grid(n_fft)
        self.nt = int(nt)
        self.m = OfdmModem(scheme, n_fft=n_fft, cp=cp,
                           data_bins=data + pilots, pilot_bins=(),
                           n_ltf=1, seed=seed, **modem_kwargs)
        self.bits_per_slot = self.nt * self.m.bits_per_sym
        self._es = float(np.mean(np.sum(
            np.asarray(self.m.lut, np.float32) ** 2, axis=-1)))

    @property
    def preamble_len(self) -> int:
        return (1 + self.nt) * self.m.sym_len

    def frame_len(self, n_symbols: int) -> int:
        return self.preamble_len + n_symbols * self.m.sym_len

    def bits_per_frame(self, n_symbols: int) -> int:
        return n_symbols * self.bits_per_slot

    # ------------------------------------------------------------------

    def tx(self, bits: jnp.ndarray):
        """``[..., n_symbols*bits_per_slot]`` bits -> antenna waveforms
        ``(i, q)``, each ``[..., nt, frame_len]``."""
        m, nt = self.m, self.nt
        di, dq = m.map_bits(bits)                 # [..., nt*S, D]
        if di.shape[-2] % nt:
            raise ValueError(f"virtual symbol count must divide by {nt}")
        sl = m.sym_len

        def with_cp(t):
            return np.concatenate([t[-m.cp:], t])

        stf_i, stf_q = with_cp(m._stf_ti), with_cp(m._stf_tq)
        ltf_i, ltf_q = with_cp(m._ltf_ti), with_cp(m._ltf_tq)
        outs_i, outs_q = [], []
        for a in range(nt):
            xi = di[..., a::nt, :]
            xq = dq[..., a::nt, :]
            ti, tq = m._payload_td(xi, xq)
            pi, pq = m._add_cp(ti, tq, m.cp)
            head_i = np.zeros((1 + nt, sl), np.float32)
            head_q = np.zeros((1 + nt, sl), np.float32)
            if a == 0:   # STF from antenna 0 only (as the 2x2 class)
                head_i[0], head_q[0] = stf_i, stf_q
            head_i[1 + a], head_q[1 + a] = ltf_i, ltf_q
            hi = jnp.broadcast_to(jnp.asarray(head_i.reshape(-1)),
                                  pi.shape[:-1] + ((1 + nt) * sl,))
            hq = jnp.broadcast_to(jnp.asarray(head_q.reshape(-1)),
                                  pq.shape[:-1] + ((1 + nt) * sl,))
            outs_i.append(jnp.concatenate([hi, pi], axis=-1))
            outs_q.append(jnp.concatenate([hq, pq], axis=-1))
        return jnp.stack(outs_i, axis=-2), jnp.stack(outs_q, axis=-2)

    # ------------------------------------------------------------------

    def detect(self, yi: jnp.ndarray, yq: jnp.ndarray, n_symbols: int,
               noise_var: float = 0.0):
        """``[..., nr, frame_len]`` aligned captures -> per-stream
        decision points ``(di, dq, w)``: unbiased MMSE estimates in
        virtual-symbol order ``[..., nt*S, D]`` and LLR weights
        ``w [..., nt, D]``."""
        m, nt = self.m, self.nt
        nr = yi.shape[-2]
        if nr < nt:
            raise ValueError(f"need nr >= nt receive antennas ({nr} < {nt})")
        sl = m.sym_len
        hs_i, hs_q, sp_i, sp_q = [], [], [], []
        for j in range(nr):
            i_j, q_j = yi[..., j, :], yq[..., j, :]
            row_i, row_q = [], []
            for a in range(nt):
                ha = m.estimate_channel(
                    i_j[..., (1 + a) * sl:(2 + a) * sl],
                    q_j[..., (1 + a) * sl:(2 + a) * sl])
                row_i.append(ha[0][..., m._data_in_used])
                row_q.append(ha[1][..., m._data_in_used])
            hs_i.append(jnp.stack(row_i, axis=-1))   # [..., D, nt]
            hs_q.append(jnp.stack(row_q, axis=-1))
            off = self.preamble_len
            xi, xq = m._strip_cp(i_j[..., off:], q_j[..., off:], n_symbols)
            rc = jnp.asarray(m._rx_cd)
            rs = jnp.asarray(m._rx_sd)
            sp_i.append(xi @ rc + xq @ rs)           # [..., S, D]
            sp_q.append(xq @ rc - xi @ rs)
        h = (jnp.stack(hs_i, axis=-2), jnp.stack(hs_q, axis=-2))
        # h: [..., D, nr, nt]; y: [..., S, D, nr, 1]
        y = (jnp.stack(sp_i, axis=-1)[..., None],
             jnp.stack(sp_q, axis=-1)[..., None])
        g = jnp.float32(noise_var / self._es)
        hh = _chermt(h)
        ar, ai = _cmm(hh, h)                         # [..., D, nt, nt]
        eye = jnp.eye(nt, dtype=ar.dtype)
        ar = ar + g * eye
        ainv = _cinv_h((ar, ai), nt)
        z = _cmm((hh[0][..., None, :, :, :], hh[1][..., None, :, :, :]), y)
        s_hat = _cmm((ainv[0][..., None, :, :, :],
                      ainv[1][..., None, :, :, :]), z)  # [..., S, D, nt, 1]
        # bias removal + SINR weights: d_k = g [A^{-1}]_kk (real)
        diag = jnp.einsum("...kk->...k", ainv[0])    # [..., D, nt]
        d = jnp.clip(g * diag, 0.0, 1.0 - 1e-6)
        si = s_hat[0][..., 0] / (1.0 - d)[..., None, :, :]
        sq = s_hat[1][..., 0] / (1.0 - d)[..., None, :, :]
        w = (1.0 - d) / (jnp.maximum(d, 1e-12) * self._es)
        w = jnp.swapaxes(w, -1, -2)                  # [..., nt, D]
        # [..., S, D, nt] -> virtual-symbol order [..., nt*S, D]
        gi = jnp.swapaxes(si, -1, -2)                # [..., S, nt, D]
        gq = jnp.swapaxes(sq, -1, -2)
        shp = gi.shape[:-3] + (gi.shape[-3] * nt,) + gi.shape[-1:]
        return gi.reshape(shp), gq.reshape(shp), w

    def rx_frame(self, yi, yq, n_symbols: int,
                 noise_var: float = 0.0) -> jnp.ndarray:
        """Aligned captures -> hard bits ``[..., n_symbols*bits_per_slot]``."""
        di, dq, _ = self.detect(yi, yq, n_symbols, noise_var)
        syms = lut_slice(di, dq, self.m.lut)
        bits = unpack_symbols(syms, self.m.bits_per_symbol)
        return bits.reshape(bits.shape[:-2] + (-1,))

    def rx_soft_frame(self, yi, yq, n_symbols: int,
                      noise_var: float) -> jnp.ndarray:
        """Aligned captures -> SINR-weighted max-log LLRs."""
        m = self.m
        di, dq, w = self.detect(yi, yq, n_symbols, noise_var)
        llr = lut_llr(di, dq, m.lut, m.bits_per_symbol, 1.0)
        wb = jnp.repeat(w, m.bits_per_symbol, axis=-1,
                        total_repeat_length=m.bits_per_sym)
        s = di.shape[-2] // self.nt
        wb = jnp.tile(wb, (1,) * (wb.ndim - 2) + (s, 1))
        llr = llr * wb
        return llr.reshape(llr.shape[:-2] + (-1,))

    def as_link_chain(self):
        """FramedLink adapter (one "symbol" = one slot of nt streams);
        the waveform is the stacked antenna pair ``(i, q)``."""
        return _MimoChainN(self)


class _MimoChainN:
    def __init__(self, mimo: MimoOfdmN):
        self.mimo = mimo
        self.scheme = _MimoScheme(mimo.bits_per_slot)

    def tx(self, bits: jnp.ndarray):
        return self.mimo.tx(bits)

    def rx_soft(self, y, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        yi, yq = y
        return self.mimo.rx_soft_frame(yi, yq, n_symbols,
                                       noise_var=noise_var)

    def rx(self, y, n_symbols: int) -> jnp.ndarray:
        yi, yq = y
        return self.mimo.rx_frame(yi, yq, n_symbols)

"""Alamouti 2x1 space-time block coding over the OFDM PHY.

New capability (nothing in the reference is multi-antenna): transmit
diversity defeats exactly the failure mode the deep-fade tests document —
a spectral null in ONE path wipes out those subcarriers no matter the
SNR. With two transmit antennas sending the Alamouti code per subcarrier,
the effective gain is ``|H_A|^2 + |H_B|^2``: both channels must fade at
the same bin simultaneously for data to be lost.

Per subcarrier and per symbol *pair* (s1, s2):

    antenna A sends [ s1, -conj(s2) ]      (symbols 2m, 2m+1)
    antenna B sends [ s2,  conj(s1) ]

and the single-antenna receiver combines

    s1_hat = (conj(H_A) Y1 + H_B conj(Y2)) / (|H_A|^2 + |H_B|^2)
    s2_hat = (conj(H_B) Y1 - H_A conj(Y2)) / (|H_A|^2 + |H_B|^2)

which is exact when the channels are static over the pair — one CP
length of delay spread per path, like the one-tap equalizer.

TPU shaping: everything is elementwise algebra on ``[..., S/2, D]``
split-plane tensors around the same reduced-DFT matmuls as
:class:`modem_tpu.ofdm.OfdmModem`; the pair structure is one reshape.
Channel estimation uses *time-orthogonal* LTFs — the frame is
``[STF][LTF from A][LTF from B][payload pairs]``, so each antenna's
channel is a standard LS estimate on its own slot. The inner modem is
built pilotless (combining already tracks both channels; residual-CFO
tracking for STBC frames is future work — acquire CFO first with
:meth:`OfdmModem.acquire`'s front end).

Reference for the scheme: Alamouti 1998 (public knowledge); reference
repo equivalent: none.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ofdm import OfdmModem, _default_grid
from .ops.llr import lut_llr
from .ops.slicer import lut_slice
from .utils.bits import unpack_symbols


class AlamoutiOfdm:
    """2x1 Alamouti STBC over an OFDM grid.

    ``scheme``: any constellation scheme. Frames carry an even number of
    payload symbols (``n_pairs`` pairs). :meth:`tx` returns TWO antenna
    waveforms; the receiver sees their channel-weighted sum.
    """

    def __init__(self, scheme, n_fft: int = 64, cp: int = 16,
                 seed: int = 2016, **modem_kwargs):
        data, pilots = _default_grid(n_fft)
        # pilotless inner modem with a single LTF per antenna slot;
        # extra kwargs (e.g. channel_denoise=True) pass through
        self.m = OfdmModem(scheme, n_fft=n_fft, cp=cp,
                           data_bins=data + pilots, pilot_bins=(),
                           n_ltf=1, seed=seed, **modem_kwargs)
        self.bits_per_pair = 2 * self.m.bits_per_sym

    @property
    def preamble_len(self) -> int:
        """STF + one LTF slot per antenna."""
        return 3 * self.m.sym_len

    def frame_len(self, n_pairs: int) -> int:
        return self.preamble_len + 2 * n_pairs * self.m.sym_len

    def bits_per_frame(self, n_pairs: int) -> int:
        return n_pairs * self.bits_per_pair

    # ------------------------------------------------------------------

    def tx(self, bits: jnp.ndarray):
        """``[..., n_pairs*bits_per_pair]`` bits -> two antenna waveforms
        ``((ia, qa), (ib, qb))``, each ``[..., frame_len]``."""
        m = self.m
        di, dq = m.map_bits(bits)            # [..., 2P, D]
        s = di.shape[-2]
        if s % 2:
            raise ValueError("STBC needs an even number of OFDM symbols")
        i1, q1 = di[..., 0::2, :], dq[..., 0::2, :]
        i2, q2 = di[..., 1::2, :], dq[..., 1::2, :]

        def interleave(e_i, e_q, o_i, o_q):
            gi = jnp.stack([e_i, o_i], axis=-2)  # [..., P, 2, D]
            gq = jnp.stack([e_q, o_q], axis=-2)
            return (gi.reshape(di.shape), gq.reshape(dq.shape))

        ai, aq = interleave(i1, q1, -i2, q2)      # A: [s1, -conj(s2)]
        bi, bq = interleave(i2, q2, i1, -q1)      # B: [s2,  conj(s1)]

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
                               n_pairs: int):
        m = self.m
        sl = m.sym_len
        ha = m.estimate_channel(i[..., sl:2 * sl], q[..., sl:2 * sl])
        hb = m.estimate_channel(i[..., 2 * sl:3 * sl],
                                q[..., 2 * sl:3 * sl])
        off = self.preamble_len
        xi, xq = m._strip_cp(i[..., off:], q[..., off:], 2 * n_pairs)
        rc = jnp.asarray(m._rx_cd)
        rs = jnp.asarray(m._rx_sd)
        yi = xi @ rc + xq @ rs               # [..., 2P, D]
        yq = xq @ rc - xi @ rs
        didx = m._data_in_used
        sel = lambda h: (h[0][..., didx], h[1][..., didx])  # noqa: E731
        return sel(ha), sel(hb), yi, yq

    def decision_points(self, i: jnp.ndarray, q: jnp.ndarray,
                        n_pairs: int):
        """Frame-aligned waveform -> combined decision points
        ``(di, dq, g)`` with ``g = |H_A|^2 + |H_B|^2`` per data bin (the
        diversity gain, also the LLR weight)."""
        (hai, haq), (hbi, hbq), yi, yq = self._estimates_and_spectra(
            i, q, n_pairs)
        p2 = yi.shape[-2]
        shp = yi.shape[:-2] + (p2 // 2, 2) + yi.shape[-1:]
        yi = yi.reshape(shp)
        yq = yq.reshape(shp)
        y1i, y1q = yi[..., 0, :], yq[..., 0, :]
        y2i, y2q = yi[..., 1, :], yq[..., 1, :]
        hai, haq = hai[..., None, :], haq[..., None, :]
        hbi, hbq = hbi[..., None, :], hbq[..., None, :]
        g = jnp.maximum(hai * hai + haq * haq + hbi * hbi + hbq * hbq,
                        1e-24)
        # s1 = (conj(Ha) y1 + Hb conj(y2)) / g
        s1i = (hai * y1i + haq * y1q) + (hbi * y2i + hbq * y2q)
        s1q = (hai * y1q - haq * y1i) + (hbq * y2i - hbi * y2q)
        # s2 = (conj(Hb) y1 - Ha conj(y2)) / g
        s2i = (hbi * y1i + hbq * y1q) - (hai * y2i + haq * y2q)
        s2q = (hbi * y1q - hbq * y1i) - (haq * y2i - hai * y2q)
        # re-interleave pairs back to the symbol stream [..., 2P, D]
        gi = jnp.stack([s1i / g, s2i / g], axis=-2)
        gq = jnp.stack([s1q / g, s2q / g], axis=-2)
        out_shape = gi.shape[:-3] + (p2,) + gi.shape[-1:]
        return gi.reshape(out_shape), gq.reshape(out_shape), g[..., 0, :]

    def rx(self, i: jnp.ndarray, q: jnp.ndarray,
           n_pairs: int) -> jnp.ndarray:
        """Frame-aligned combined waveform -> hard bits."""
        di, dq, _ = self.decision_points(i, q, n_pairs)
        syms = lut_slice(di, dq, self.m.lut)
        bits = unpack_symbols(syms, self.m.bits_per_symbol)
        return bits.reshape(bits.shape[:-2] + (-1,))

    def as_link_chain(self):
        """Chain-protocol adapter so :class:`modem_tpu.link.FramedLink`
        runs over the STBC PHY (one "symbol" = one Alamouti pair =
        ``bits_per_pair`` bits). The link's waveform stays the adapter's
        opaque pair of antenna streams until the user's channel combines
        them; ``rx`` takes the combined single-antenna capture."""
        return _StbcChain(self)

    def rx_soft(self, i: jnp.ndarray, q: jnp.ndarray, n_pairs: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        """Diversity-weighted max-log LLRs: after combining, the
        effective per-bin noise variance is ``noise_var / g``."""
        m = self.m
        di, dq, g = self.decision_points(i, q, n_pairs)
        llr = lut_llr(di, dq, m.lut, m.bits_per_symbol, 1.0)
        w = jnp.repeat(g / jnp.float32(noise_var), m.bits_per_symbol,
                       axis=-1, total_repeat_length=m.bits_per_sym)
        llr = llr * w[..., None, :]
        return llr.reshape(llr.shape[:-2] + (-1,))


class _StbcScheme:
    def __init__(self, bits_per_symbol: int):
        self.bits_per_symbol = bits_per_symbol


class _StbcChain:
    """FramedLink adapter for :class:`AlamoutiOfdm` (see
    :meth:`AlamoutiOfdm.as_link_chain`)."""

    def __init__(self, stbc: AlamoutiOfdm):
        self.stbc = stbc
        self.scheme = _StbcScheme(stbc.bits_per_pair)

    def tx(self, bits: jnp.ndarray):
        return self.stbc.tx(bits)

    def rx_soft(self, iq, n_pairs: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        i, q = iq
        return self.stbc.rx_soft(i, q, n_pairs, noise_var=noise_var)

    def rx(self, iq, n_pairs: int) -> jnp.ndarray:
        i, q = iq
        return self.stbc.rx(i, q, n_pairs)

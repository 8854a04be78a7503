"""OFDM modem: multicarrier TX/RX as MXU matmuls over real I/Q planes.

New capability (the reference is strictly single-carrier — its 13 schemes all
ride one NCO carrier, `/root/reference/src/modem/digital/mod.rs:1-18`; a
modern deployment of the same constellation math is multicarrier). This
module reuses the framework's constellation layer (scheme LUTs,
:func:`modem_tpu.ops.slicer.lut_slice`, :func:`modem_tpu.ops.llr.lut_llr`)
and puts an OFDM PHY around it.

TPU shaping — the same playbook as the channelizer
(:mod:`modem_tpu.ops.channelizer`):

* **No FFT op, no complex dtype, no scatter.** The IDFT/DFT run as *reduced*
  real matmuls: subcarrier-to-bin mapping is folded into the DFT matrix by
  keeping only the used bins' rows, so TX is ``[S, D] @ [D, N]`` and RX is
  ``[S, N] @ [N, U]`` — dense MXU work with static shapes (at N=256 the
  matrices are exactly the hardware tile; for the classic N=64 grid XLA
  tiles them fine). The pilot overlay is a rank-1 add of a precomputed
  time-domain row, not a scatter.
* **Cyclic prefix = slicing + reshape.** Symbols are processed as an
  ``[..., S, N]`` matrix; serialization to/from the sample stream is one
  concat + reshape.
* **Acquisition is prefix sums + one static-gather correlation**, exactly
  like :func:`modem_tpu.sync.frame_sync`: the Schmidl&Cox metric uses the
  STF's half-symbol periodicity (cumulative sums, no loops), its angle gives
  the fractional CFO closed-form, and fine timing is a ``[max_lag, N]``
  correlation against the known LTF — all batched over channels.
* **Equalization is elementwise.** CP longer than the channel's delay
  spread turns multipath into one complex gain per bin; LS estimation from
  the LTF pair and the one-tap equalizer are a handful of elementwise ops,
  with pilot-based common-phase/gain tracking per symbol (the OFDM analog
  of :func:`modem_tpu.sync.dd_phase_track`).

Frame layout (every symbol ``n_fft + cp`` samples)::

    [ STF ] [ LTF x n_ltf ] [ payload symbol ] ... [ payload symbol ]

The STF occupies every 4th bin, so its time waveform has period ``n_fft/4``
— the CP extends the periodic region to the full symbol, giving the S&C
metric a wide stable plateau and the CFO estimator range ±2 subcarriers.
LTFs are a known BPSK loading of all used bins (data + pilots), repeated
``n_ltf`` times and averaged for the LS channel estimate.

Like every block in this framework, frames are the streaming quantum: the
modem is stateless across frames, so chunked operation is trivially
bit-exact (one frame per chunk) and the acquisition path tolerates unknown
inter-frame gaps.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .ops.fir import fir_filter
from .ops.llr import lut_llr
from .ops.sync_metric import (aligned_frame_matmul, periodic_similarity,
                              template_correlate_fir)
from .ops.slicer import lut_map, lut_slice
from .utils.bits import pack_bits, unpack_symbols


def _angle(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(im, re)


@lru_cache(maxsize=16)
def _dft_rows(n_fft: int, bins: tuple) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin rows of the N-point DFT for the given bins: ``[B, N]`` each,
    ``C[b, n] = cos(2*pi*bins[b]*n/N)`` (bins may be negative)."""
    k = np.asarray(bins, np.int64)[:, None]
    n = np.arange(n_fft, dtype=np.int64)[None, :]
    ang = 2.0 * np.pi * ((k * n) % n_fft) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _default_grid(n_fft: int) -> tuple[tuple, tuple]:
    """(data_bins, pilot_bins) for an 802.11a-style loading: 52 used bins
    ±(1..26) with pilots at ±7, ±21, scaled to other FFT sizes."""
    half = (n_fft * 26) // 64
    pil = ((n_fft * 7) // 64, (n_fft * 21) // 64)
    used = [b for b in range(-half, half + 1) if b != 0]
    pilots = tuple(sorted((-pil[1], -pil[0], pil[0], pil[1])))
    data = tuple(b for b in used if b not in pilots)
    return data, pilots


class OfdmModem:
    """OFDM PHY around any constellation scheme of this framework.

    Parameters
    ----------
    scheme: a LUT scheme from :func:`modem_tpu.models.make_scheme` (PSK/QAM/
        APSK/ASK families — anything with a ``.lut``).
    n_fft, cp: FFT size and cyclic-prefix length (``cp`` must exceed the
        channel's delay spread for the one-tap equalizer to be exact).
    data_bins, pilot_bins: signed bin indices; default is the classic
        52-used-bin grid (48 data + 4 pilots at N=64, scaled otherwise).
    n_ltf: number of repeated long-training symbols averaged into the LS
        channel estimate.
    channel_denoise: project the LS channel estimate onto the <= cp-tap
        delay subspace (see :meth:`estimate_channel`) — ~5 dB of
        estimator SNR for free on CP-equalizable channels; off by
        default to keep the estimator assumption-free.
    pilot_tracking: what the per-symbol pilot fit corrects —
        ``"cpe"`` (default): common phase/gain per symbol (residual CFO)
        via the complex pilot sum — robust at low SNR;
        ``"sfo"``: weighted least-squares fit of ``phase = cpe +
        slope * bin`` across the pilots, correcting sampling-clock drift
        (which advances the per-bin linear phase a little every symbol)
        on top of the CPE. Needs per-pilot angles to stay inside
        (-pi, pi) over the frame — reacquire rather than track across
        very long frames.
    """

    def __init__(self, scheme, n_fft: int = 64, cp: int = 16,
                 data_bins: tuple | None = None,
                 pilot_bins: tuple | None = None,
                 n_ltf: int = 2, seed: int = 2016,
                 pilot_tracking: str = "cpe",
                 channel_denoise: bool = False):
        if not hasattr(scheme, "lut"):
            raise ValueError("OFDM needs a constellation (LUT) scheme")
        if n_fft % 4:
            raise ValueError("n_fft must divide by 4 (STF periodicity)")
        if data_bins is None and pilot_bins is None:
            data_bins, pilot_bins = _default_grid(n_fft)
        if data_bins is None:
            raise ValueError(
                "data_bins is required when pilot_bins is given (pass "
                "both, or neither for the default grid)")
        if n_ltf < 1:
            raise ValueError("need n_ltf >= 1 (the LS channel estimate "
                             "averages over the LTF repetitions)")
        if pilot_tracking not in ("cpe", "sfo"):
            raise ValueError("pilot_tracking must be 'cpe' or 'sfo'")
        self.channel_denoise = bool(channel_denoise)
        if pilot_tracking == "sfo" and len(pilot_bins or ()) < 2:
            raise ValueError("sfo tracking needs >= 2 pilot bins to fit "
                             "a phase slope")
        self.pilot_tracking = pilot_tracking
        data_bins = tuple(int(b) for b in data_bins)
        pilot_bins = tuple(int(b) for b in (pilot_bins or ()))
        if set(data_bins) & set(pilot_bins):
            raise ValueError("data and pilot bins overlap")
        for b in data_bins + pilot_bins:
            if not -n_fft // 2 < b < n_fft // 2 or b == 0:
                raise ValueError(f"bin {b} outside (-{n_fft//2}, {n_fft//2})"
                                 " or DC")
        self.scheme = scheme
        self.lut = np.asarray(scheme.lut, np.float32)
        self.bits_per_symbol = scheme.bits_per_symbol
        self.n_fft = int(n_fft)
        self.cp = int(cp)
        self.sym_len = self.n_fft + self.cp
        self.data_bins = data_bins
        self.pilot_bins = pilot_bins
        self.used_bins = tuple(sorted(data_bins + pilot_bins))
        self.n_data = len(data_bins)
        self.n_ltf = int(n_ltf)
        self.bits_per_sym = self.n_data * self.bits_per_symbol

        rng = np.random.default_rng(seed)
        # Pilot loading: fixed BPSK per pilot bin, polarity flipped per
        # OFDM symbol by a fixed PN sequence (breaks pilot-tone lines).
        self._pilot_vals = (2.0 * rng.integers(0, 2, len(pilot_bins))
                            - 1.0).astype(np.float32)
        self._polarity_pn = (2.0 * rng.integers(0, 2, 4096)
                             - 1.0).astype(np.float32)
        # LTF loading: BPSK on every used bin.
        self._ltf_vals = (2.0 * rng.integers(0, 2, len(self.used_bins))
                          - 1.0).astype(np.float32)
        # STF loading: QPSK on every 4th bin (|bin| = 4, 8, ... within the
        # used span) -> time period n_fft/4; boosted to match payload power.
        stf_bins = tuple(b for b in self.used_bins if b % 4 == 0)
        if not stf_bins:
            raise ValueError("no bins divisible by 4 for the STF")
        ph = rng.uniform(0.0, 2.0 * np.pi, len(stf_bins))
        boost = np.sqrt(len(self.used_bins) / len(stf_bins))
        self._stf_bins = stf_bins
        self._stf_i = (boost * np.cos(ph)).astype(np.float32)
        self._stf_q = (boost * np.sin(ph)).astype(np.float32)

        n = self.n_fft
        scale = np.float32(1.0 / np.sqrt(n))
        cd, sd = _dft_rows(n, data_bins)
        cp_, sp_ = _dft_rows(n, pilot_bins) if pilot_bins else (
            np.zeros((0, n), np.float32), np.zeros((0, n), np.float32))
        cu, su = _dft_rows(n, self.used_bins)
        self._tx_c = (cd * scale).astype(np.float32)   # [D, N]
        self._tx_s = (sd * scale).astype(np.float32)
        self._rx_c = (cu.T * scale).astype(np.float32)  # [N, U]
        self._rx_s = (su.T * scale).astype(np.float32)
        # Separate data/pilot RX matrices (transposes of the TX rows): the
        # payload path computes the data-bin and pilot-bin spectra as two
        # direct matmuls instead of one used-bin matmul + per-payload
        # selection gathers (gathers lose to MXU algebra on this device —
        # see ops.slicer.lut_map).
        self._rx_cd = self._tx_c.T.copy()               # [N, D]
        self._rx_sd = self._tx_s.T.copy()
        self._rx_cp = (cp_.T * scale).astype(np.float32)  # [N, P]
        self._rx_sp = (sp_.T * scale).astype(np.float32)
        # Precomputed time-domain overlays/preambles (numpy, host-side).
        self._pilot_ti = scale * (self._pilot_vals @ cp_)
        self._pilot_tq = scale * (self._pilot_vals @ sp_)
        self._ltf_ti = scale * (self._ltf_vals @ cu)
        self._ltf_tq = scale * (self._ltf_vals @ su)
        cs_, ss_ = _dft_rows(n, stf_bins)
        self._stf_ti = scale * (self._stf_i @ cs_ - self._stf_q @ ss_)
        self._stf_tq = scale * (self._stf_i @ ss_ + self._stf_q @ cs_)
        # Index of each data/pilot bin within used_bins (static permutes).
        self._data_in_used = np.asarray(
            [self.used_bins.index(b) for b in data_bins], np.int64)
        self._pilot_in_used = np.asarray(
            [self.used_bins.index(b) for b in pilot_bins], np.int64)
        # Delay-subspace projector for channel-estimate denoising: any
        # physical channel the CP can absorb has <= cp taps, so the true
        # H lives in the cp-dimensional column space of F[u, l] =
        # e^{-j 2 pi k_u l / N}. P = F (F^H F)^-1 F^H projects the LS
        # estimate onto it — one Hermitian [U, U] matmul that averages
        # the per-bin estimation noise down by ~U/cp (~5 dB at the
        # default grid).
        ku = np.asarray(self.used_bins, np.float64)[:, None]
        ll = np.arange(self.cp, dtype=np.float64)[None, :]
        f = np.exp(-2j * np.pi * ku * ll / n)
        proj = f @ np.linalg.pinv(f)
        self._denoise_re = np.ascontiguousarray(
            proj.T.real.astype(np.float32))
        self._denoise_im = np.ascontiguousarray(
            proj.T.imag.astype(np.float32))
        # The full CP-extended preamble (STF + n_ltf x LTF) — ONE copy,
        # shared by tx_frame and acquire's fine-timing template so the
        # two can never desynchronize.
        def head(parts):
            return np.concatenate(
                [np.concatenate([t[-self.cp:], t]) for t in parts]
            ).astype(np.float32)
        self._preamble_i = head([self._stf_ti] + [self._ltf_ti] * n_ltf)
        self._preamble_q = head([self._stf_tq] + [self._ltf_tq] * n_ltf)

    # ------------------------------------------------------------------
    # Frame geometry
    # ------------------------------------------------------------------

    @property
    def preamble_len(self) -> int:
        """Samples before the first payload symbol in a full frame."""
        return (1 + self.n_ltf) * self.sym_len

    def frame_len(self, n_symbols: int) -> int:
        return self.preamble_len + n_symbols * self.sym_len

    def bits_per_frame(self, n_symbols: int) -> int:
        return n_symbols * self.bits_per_sym

    def _polarity(self, n_symbols: int) -> np.ndarray:
        pn = self._polarity_pn
        if n_symbols > pn.size:
            pn = np.tile(pn, -(-n_symbols // pn.size))
        return pn[:n_symbols]

    # ------------------------------------------------------------------
    # TX
    # ------------------------------------------------------------------

    def map_bits(self, bits: jnp.ndarray):
        """``[..., S*bits_per_sym]`` bits -> data-bin I/Q ``[..., S, D]``."""
        if bits.shape[-1] % self.bits_per_sym:
            raise ValueError(
                f"bit count {bits.shape[-1]} must divide by "
                f"{self.bits_per_sym} (= {self.n_data} data bins x "
                f"{self.bits_per_symbol} bits)")
        syms = pack_bits(bits, self.bits_per_symbol)
        s = syms.shape[-1] // self.n_data
        syms = syms.reshape(syms.shape[:-1] + (s, self.n_data))
        # one-hot matmul, not a gather (ops.slicer.lut_map: 4x on TPU)
        return lut_map(syms, self.lut)

    def _payload_td(self, di: jnp.ndarray, dq: jnp.ndarray):
        """Data-bin I/Q ``[..., S, D]`` -> time-domain symbol matrix
        ``[..., S, N]`` (pilot overlay added, no CP yet)."""
        tc = jnp.asarray(self._tx_c)
        ts = jnp.asarray(self._tx_s)
        xi = di @ tc - dq @ ts
        xq = di @ ts + dq @ tc
        if self.pilot_bins:
            pol = jnp.asarray(self._polarity(di.shape[-2]))[..., :, None]
            xi = xi + pol * jnp.asarray(self._pilot_ti)
            xq = xq + pol * jnp.asarray(self._pilot_tq)
        return xi, xq

    @staticmethod
    def _add_cp(xi: jnp.ndarray, xq: jnp.ndarray, cp: int):
        """``[..., S, N]`` -> serialized ``[..., S*(N+cp)]``."""
        def one(x):
            xcp = jnp.concatenate([x[..., -cp:], x], axis=-1)
            return xcp.reshape(xcp.shape[:-2] + (-1,))
        return one(xi), one(xq)

    def tx_payload(self, bits: jnp.ndarray):
        """Bits -> payload sample stream (no preamble), ``[..., S*sym_len]``."""
        di, dq = self.map_bits(bits)
        xi, xq = self._payload_td(di, dq)
        return self._add_cp(xi, xq, self.cp)

    def tx_frame(self, bits: jnp.ndarray):
        """Bits -> full frame: STF + n_ltf x LTF + payload."""
        pi, pq = self.tx_payload(bits)
        hi = jnp.broadcast_to(jnp.asarray(self._preamble_i),
                              pi.shape[:-1] + (self._preamble_i.size,))
        hq = jnp.broadcast_to(jnp.asarray(self._preamble_q),
                              pq.shape[:-1] + (self._preamble_q.size,))
        return (jnp.concatenate([hi, pi], axis=-1),
                jnp.concatenate([hq, pq], axis=-1))

    # ------------------------------------------------------------------
    # RX (frame-aligned)
    # ------------------------------------------------------------------

    def _strip_cp(self, i: jnp.ndarray, q: jnp.ndarray, n_symbols: int):
        """Aligned sample stream -> ``[..., S, N]`` FFT windows."""
        need = n_symbols * self.sym_len
        if i.shape[-1] < need:
            raise ValueError(f"need {need} samples, got {i.shape[-1]}")
        def one(x):
            x = x[..., :need].reshape(x.shape[:-1] + (n_symbols,
                                                      self.sym_len))
            return x[..., self.cp:]
        return one(i), one(q)

    def _dft_used(self, xi: jnp.ndarray, xq: jnp.ndarray):
        """``[..., N]`` time windows -> used-bin spectra ``[..., U]``."""
        rc = jnp.asarray(self._rx_c)
        rs = jnp.asarray(self._rx_s)
        yi = xi @ rc + xq @ rs
        yq = xq @ rc - xi @ rs
        return yi, yq

    def estimate_channel(self, i: jnp.ndarray, q: jnp.ndarray,
                         denoise: bool | None = None):
        """LS channel estimate from the aligned LTF section.

        ``i, q [..., n_ltf*sym_len]`` starting at LTF symbol 0's CP.
        Returns per-used-bin ``(hi, hq) [..., U]`` (averaged over the
        repetitions; the LTF loading is BPSK so conj(L)/|L|^2 == L).

        ``denoise=True`` projects the estimate onto the subspace of
        channels with <= ``cp`` delay taps (one [U, U] matmul): exact for
        every channel the CP can equalize anyway, and it averages the
        per-bin estimation noise down by ~U/cp — worth ~5 dB of
        estimator SNR at the default grid.
        """
        if denoise is None:
            denoise = self.channel_denoise
        xi, xq = self._strip_cp(i, q, self.n_ltf)
        yi, yq = self._dft_used(xi, xq)
        li = jnp.asarray(self._ltf_vals)
        hi = jnp.mean(yi * li, axis=-2)
        hq = jnp.mean(yq * li, axis=-2)
        if denoise:
            pr = jnp.asarray(self._denoise_re)
            pi_ = jnp.asarray(self._denoise_im)
            hi, hq = hi @ pr - hq @ pi_, hi @ pi_ + hq @ pr
        return hi, hq

    def _equalize(self, i: jnp.ndarray, q: jnp.ndarray, n_symbols: int,
                  h=None):
        """Aligned payload stream -> equalized data-bin decision points
        ``(di, dq, m2)`` with ``m2 [..., D]`` = |H|^2 at the data bins
        (the LLR weighting). ``h``: (hi, hq) from
        :meth:`estimate_channel`; None = ideal channel."""
        xi, xq = self._strip_cp(i, q, n_symbols)

        def dft(rc, rs):
            rc, rs = jnp.asarray(rc), jnp.asarray(rs)
            return xi @ rc + xq @ rs, xq @ rc - xi @ rs

        yi, yq = dft(self._rx_cd, self._rx_sd)  # data bins [..., S, D]
        if h is None:
            hdi = jnp.ones(yi.shape[:-2] + (1, self.n_data), yi.dtype)
            hdq = jnp.zeros_like(hdi)
            hpi = jnp.ones(yi.shape[:-2] + (1, len(self.pilot_bins)),
                           yi.dtype)
            hpq = jnp.zeros_like(hpi)
        else:
            # H comes per used bin (one estimate per frame): the two tiny
            # selections here run once, not per payload symbol.
            hi, hq = h
            hdi = hi[..., self._data_in_used][..., None, :]
            hdq = hq[..., self._data_in_used][..., None, :]
            hpi = hi[..., self._pilot_in_used][..., None, :]
            hpq = hq[..., self._pilot_in_used][..., None, :]
        if self.pilot_bins:
            # Per-symbol pilot fit. ri + j*rq is the expected pilot after
            # the channel (R = H_p * P_p * pol_s); ei + j*eq = Y * conj(R)
            # is each pilot's residual rotation, |R|^2-weighted.
            ypi, ypq = dft(self._rx_cp, self._rx_sp)  # [..., S, P]
            pv = jnp.asarray(self._pilot_vals)
            pol = jnp.asarray(self._polarity(n_symbols))[..., :, None]
            ri = hpi * pv * pol
            rq = hpq * pv * pol
            ei = ypi * ri + ypq * rq
            eq = ypq * ri - ypi * rq
            wgt = ri * ri + rq * rq
            e = jnp.sum(wgt, axis=-1, keepdims=True)
            if self.pilot_tracking == "sfo":
                # Weighted LS of phase = cpe + slope*bin across pilots:
                # sampling-clock drift advances the per-bin linear phase
                # each symbol; the slope term takes it out.
                phi = jnp.arctan2(eq, ei)
                kp = jnp.asarray(np.asarray(self.pilot_bins, np.float32))
                s1 = jnp.sum(wgt * kp, axis=-1, keepdims=True)
                s2 = jnp.sum(wgt * kp * kp, axis=-1, keepdims=True)
                b0 = jnp.sum(wgt * phi, axis=-1, keepdims=True)
                b1 = jnp.sum(wgt * kp * phi, axis=-1, keepdims=True)
                det = jnp.maximum(e * s2 - s1 * s1, 1e-24)
                cpe = (s2 * b0 - s1 * b1) / det
                slope = (e * b1 - s1 * b0) / det
                amp = jnp.maximum(
                    jnp.sum(jnp.sqrt(ei * ei + eq * eq), axis=-1,
                            keepdims=True) / jnp.maximum(e, 1e-24),
                    1e-12)
                kd = jnp.asarray(np.asarray(self.data_bins, np.float32))
                th = cpe + slope * kd  # [..., S, D]
                c_, s_ = jnp.cos(th), jnp.sin(th)
                yi, yq = ((yi * c_ + yq * s_) / amp,
                          (yq * c_ - yi * s_) / amp)
            else:
                # Common phase/gain per symbol: c_s = sum_p Y conj(R) /
                # sum_p |R|^2, then divide the symbol by c_s (robust
                # complex-sum form — no per-pilot angles).
                ci = jnp.sum(ei, axis=-1, keepdims=True)
                cq = jnp.sum(eq, axis=-1, keepdims=True)
                m2c = jnp.maximum(ci * ci + cq * cq, 1e-24)
                # divide by (c/e): y *= conj(c) * e / |c|^2
                yi, yq = ((yi * ci + yq * cq) * e / m2c,
                          (yq * ci - yi * cq) * e / m2c)
        m2 = jnp.maximum(hdi * hdi + hdq * hdq, 1e-24)
        return ((yi * hdi + yq * hdq) / m2,
                (yq * hdi - yi * hdq) / m2, m2[..., 0, :])

    def rx_payload(self, i: jnp.ndarray, q: jnp.ndarray, n_symbols: int,
                   h=None) -> jnp.ndarray:
        """Aligned payload stream -> hard bits ``[..., S*bits_per_sym]``."""
        di, dq, _ = self._equalize(i, q, n_symbols, h)
        syms = lut_slice(di, dq, self.lut)
        bits = unpack_symbols(syms, self.bits_per_symbol)
        return bits.reshape(bits.shape[:-2] + (-1,))

    def rx_soft_payload(self, i: jnp.ndarray, q: jnp.ndarray,
                        n_symbols: int, h=None,
                        noise_var: float = 1.0) -> jnp.ndarray:
        """Aligned payload stream -> max-log LLRs, channel-weighted.

        After the one-tap equalizer the per-bin noise variance is
        ``noise_var / |H_k|^2``, so each bin's LLRs scale by ``|H_k|^2``
        — weak (faded) bins contribute proportionally weak beliefs, which
        is what downstream soft FEC (:mod:`modem_tpu.fec`) expects.
        """
        di, dq, m2 = self._equalize(i, q, n_symbols, h)
        llr = lut_llr(di, dq, self.lut, self.bits_per_symbol, 1.0)
        w = jnp.repeat(m2 / jnp.float32(noise_var), self.bits_per_symbol,
                       axis=-1, total_repeat_length=self.bits_per_sym)
        llr = llr * w[..., None, :]
        return llr.reshape(llr.shape[:-2] + (-1,))

    def rx_frame(self, i: jnp.ndarray, q: jnp.ndarray,
                 n_symbols: int) -> jnp.ndarray:
        """Frame-aligned stream (at the STF's first sample) -> bits."""
        off = self.sym_len  # skip STF
        nl = self.n_ltf * self.sym_len
        h = self.estimate_channel(i[..., off:off + nl],
                                  q[..., off:off + nl])
        off += nl
        return self.rx_payload(i[..., off:], q[..., off:], n_symbols, h)

    # ------------------------------------------------------------------
    # Blind acquisition (Schmidl & Cox + LTF fine timing)
    # ------------------------------------------------------------------

    def sc_metric(self, i: jnp.ndarray, q: jnp.ndarray, max_lag: int):
        """Schmidl&Cox timing metric over lags ``[0, max_lag)``.

        Uses the STF's period-``L`` self-similarity (L = n_fft/4):
        ``P(d) = sum_m conj(r[d+m]) r[d+m+L]`` over a window of
        ``sym_len - L`` (the full STF symbol incl. CP — a short window
        would also score 1.0 on the incidental L-lag repetition at each
        LTF-core -> next-CP junction), and ``R(d)`` the matching energy;
        returns ``(M, Pi, Pq)`` with ``M = |P|^2 / R^2``. All windowed
        sums are cumsum differences — O(T) with no loops.
        """
        l = self.n_fft // 4
        return periodic_similarity(i, q, lag=l, width=self.sym_len - l,
                                   max_lag=max_lag)

    def _preamble_correlate(self, ci: jnp.ndarray, cq: jnp.ndarray,
                            max_lag: int, correlator: str):
        """Complex correlation of the capture against the known preamble
        at lags ``[0, max_lag)``: ``C(d) = sum_k conj(tpl[k]) r[d+k]``.
        Returns ``(cr, cj) [..., max_lag]``.

        ``correlator``:

        * ``"fir"`` (default) — four causal FIR passes with the
          *reversed* template as taps (correlation == convolution with the
          flipped kernel, read at offset ``P-1``). XLA lowers the
          convolutions onto the MXU and never materializes a window
          tensor. This follows round 2's gather rule (BENCH.md): never
          build ``[max_lag, P]`` overlapping windows.
        * ``"gather"`` — the materialized ``[max_lag, P]`` window gather +
          reduce (round-2 form, kept as the A/B reference).
        """
        tpl_i = np.asarray(self._preamble_i, np.float32)
        tpl_q = np.asarray(self._preamble_q, np.float32)
        if correlator == "fir":
            return template_correlate_fir(ci, cq, tpl_i, tpl_q, max_lag)
        if correlator != "gather":
            raise ValueError(f"unknown correlator {correlator!r}")
        lags = jnp.arange(max_lag, dtype=jnp.int32)[:, None]
        ks = jnp.arange(self.preamble_len, dtype=jnp.int32)[None, :]
        idx = lags + ks  # [max_lag, preamble_len]
        wi, wq = ci[..., idx], cq[..., idx]
        ti, tq = jnp.asarray(tpl_i), jnp.asarray(tpl_q)
        cr = jnp.sum(wi * ti + wq * tq, axis=-1)
        cj = jnp.sum(wq * ti - wi * tq, axis=-1)
        return cr, cj

    def locate_frame(self, i: jnp.ndarray, q: jnp.ndarray,
                     n_symbols: int, max_lag: int,
                     correlator: str = "fir", aligner: str = "matmul"):
        """The blind front end shared by :meth:`acquire` and
        :meth:`acquire_soft`: S&C coarse timing + closed-form fractional
        CFO, derotation, full-preamble fine timing, and the aligned-frame
        extraction. Returns ``(fi, fq, report)`` — the CFO-corrected
        frame at the located start plus the sync report.

        ``aligner``: ``"matmul"`` (default) extracts the located frame
        with the banded one-hot matmul (`ops.sync_metric.
        aligned_frame_matmul`) — the per-channel ``take_along_axis``
        gather it replaces was measured at ~82% of the whole acquire
        pass (BENCH.md round 3). ``"gather"`` keeps that form as the
        A/B reference."""
        need = max_lag + self.frame_len(n_symbols)
        if i.shape[-1] < need:
            pad = jnp.zeros(i.shape[:-1] + (need - i.shape[-1],), i.dtype)
            i = jnp.concatenate([i, pad], axis=-1)
            q = jnp.concatenate([q, pad], axis=-1)
        # 1) coarse timing + fractional CFO from the STF periodicity
        l = self.n_fft // 4
        m, ps_i, ps_q = self.sc_metric(i, q, max_lag + self.cp)
        coarse = jnp.argmax(m, axis=-1)
        pk_i = jnp.take_along_axis(ps_i, coarse[..., None], axis=-1)
        pk_q = jnp.take_along_axis(ps_q, coarse[..., None], axis=-1)
        cfo = _angle(pk_i, pk_q) / l  # rad/sample, range ±pi/L = ±2 bins
        # 2) derotate the whole capture
        n = jnp.arange(i.shape[-1], dtype=jnp.float32)
        th = -cfo * n
        c, s = jnp.cos(th), jnp.sin(th)
        ci = i * c - q * s
        cq = i * s + q * c
        # 3) fine timing: correlate against the ENTIRE known preamble
        #    (STF + all LTFs, CPs included) over all candidate lags.
        #    Repeated LTFs alone would leave sym_len-offset ambiguities
        #    (two equal peaks); the full template scores every repetition
        #    coherently only at the true start. The CFO is already
        #    corrected, so the long coherent window is safe.
        cr, cj = self._preamble_correlate(ci, cq, max_lag, correlator)
        start = jnp.argmax(cr * cr + cj * cj, axis=-1).astype(jnp.int32)
        # 4) extract the frame at the located start and run the aligned RX
        flen = self.frame_len(n_symbols)
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

    def acquire(self, i: jnp.ndarray, q: jnp.ndarray, n_symbols: int,
                max_lag: int, correlator: str = "fir"):
        """Blind RX: unknown frame start in ``[0, max_lag)``, CFO up to
        ±2 subcarriers, flat gain/phase and any CP-short multipath.

        Returns ``(bits, report)``; ``report`` carries the located frame
        start, the fractional-CFO estimate (rad/sample), and the S&C
        metric peak. Waveforms shorter than the last candidate frame end
        are zero-padded (silence after the frame).
        """
        fi, fq, report = self.locate_frame(i, q, n_symbols, max_lag,
                                           correlator)
        return self.rx_frame(fi, fq, n_symbols), report

    def acquire_soft(self, i: jnp.ndarray, q: jnp.ndarray,
                     n_symbols: int, max_lag: int,
                     noise_var: float = 1.0, correlator: str = "fir"):
        """Blind RX to channel-weighted LLRs (the soft twin of
        :meth:`acquire`): locate, estimate the channel from the frame's
        own LTFs, and return ``(llrs, report)`` for downstream FEC."""
        fi, fq, report = self.locate_frame(i, q, n_symbols, max_lag,
                                           correlator)
        off = self.sym_len
        h = self.estimate_channel(fi[..., off:self.preamble_len],
                                  fq[..., off:self.preamble_len])
        llrs = self.rx_soft_payload(fi[..., self.preamble_len:],
                                    fq[..., self.preamble_len:],
                                    n_symbols, h, noise_var=noise_var)
        return llrs, report


class _OfdmSchemeShim:
    def __init__(self, bits_per_symbol: int):
        self.bits_per_symbol = bits_per_symbol


class OfdmChain:
    """Chain-protocol adapter: lets :class:`modem_tpu.link.FramedLink`
    (CRC/scramble/RS/conv-or-LDPC framing) run over an OFDM PHY.

    The link sees one OFDM symbol as "a symbol" carrying
    ``modem.bits_per_sym`` bits (``scheme.bits_per_symbol`` shim), so its
    size solving works unchanged; ``tx`` emits a full frame (preamble +
    payload) and ``rx_soft`` re-estimates the channel from the frame's own
    LTFs before producing the |H|^2-weighted LLRs the link decodes.
    Requires frame-aligned waveforms (use :meth:`OfdmModem.acquire`'s
    timing/CFO front end first for over-the-air captures).
    """

    def __init__(self, modem: OfdmModem):
        self.modem = modem
        self.scheme = _OfdmSchemeShim(modem.bits_per_sym)

    def tx(self, bits: jnp.ndarray):
        return self.modem.tx_frame(bits)

    def rx_soft(self, iq, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        i, q = iq
        m = self.modem
        off = m.sym_len
        h = m.estimate_channel(i[..., off:m.preamble_len],
                               q[..., off:m.preamble_len])
        return m.rx_soft_payload(i[..., m.preamble_len:],
                                 q[..., m.preamble_len:], n_symbols, h,
                                 noise_var=noise_var)

    def rx(self, iq, n_symbols: int) -> jnp.ndarray:
        i, q = iq
        return self.modem.rx_frame(i, q, n_symbols)

class OfdmStreamReceiver:
    """Continuous blind burst receiver over an unbounded OFDM sample stream.

    :meth:`OfdmModem.acquire` handles one frame in one capture; a deployed
    receiver sees an endless stream with bursts at unknown times separated
    by noise or silence. This class is the streaming front end around it:

    * ``push(i, q)`` accepts arbitrary-size sample chunks (any size,
      including empty) and returns the frames completed so far, each as
      ``(bits, report)`` with the frame start as a *global* stream index;
    * detection is the Schmidl&Cox metric (:meth:`OfdmModem.sc_metric`)
      thresholded over the leading ``max_lag`` lags of a rolling window —
      the plateau only forms on a real STF, so noise and silence advance
      the window without a decode;
    * each detected burst runs the full blind chain
      (:meth:`OfdmModem.locate_frame` fine timing + :meth:`OfdmModem
      .rx_frame`), so per-burst CFO, flat gain/phase, and CP-short
      multipath are handled per frame.

    TPU shaping: every device call is one of two fixed-shape jitted
    programs (the ``[win]`` detector and the ``[win]`` decoder), so the
    unbounded stream compiles exactly twice; the only host decision per
    window step is one scalar metric fetch (control plane, same streaming
    quantum as the framed link). Single stream by design — run one
    receiver per channel behind :class:`modem_tpu.Channelizer` /
    :class:`modem_tpu.WidebandModem` for banks.

    Guarantees (tested in ``tests/test_ofdm_stream.py``): frames decoded
    by the stream receiver are bit-identical to ``acquire`` on an aligned
    capture, independent of how the stream is chunked.
    """

    def __init__(self, modem: OfdmModem, n_symbols: int,
                 max_lag: int | None = None, threshold: float = 0.6):
        self.modem = modem
        self.n_symbols = int(n_symbols)
        self.frame_len = modem.frame_len(n_symbols)
        # detection range per window step; >= one symbol so a frame
        # starting just past the range still fully enters the next window
        self.max_lag = int(max_lag) if max_lag else 2 * modem.sym_len
        if self.max_lag > self.frame_len:
            # With max_lag <= frame_len at most ONE frame start fits in the
            # detection range (non-overlapping frames are >= frame_len
            # apart), so the fine-timing argmax cannot pick a later burst
            # and silently skip an earlier one.
            raise ValueError(
                f"max_lag ({self.max_lag}) must be <= frame_len "
                f"({self.frame_len}): a larger detection range could hold "
                "two bursts and the argmax would drop one")
        self.win = self.max_lag + self.frame_len
        self.threshold = float(threshold)
        self._buf_i = jnp.zeros((0,), jnp.float32)
        self._buf_q = jnp.zeros((0,), jnp.float32)
        self._pos = 0  # global stream index of _buf[0]

        m = modem

        @jax.jit
        def detect(i, q):
            met, _, _ = m.sc_metric(i, q, self.max_lag)
            c = jnp.argmax(met, axis=-1)
            return met[c], c

        @jax.jit
        def decode(i, q):
            fi, fq, rep = m.locate_frame(i, q, self.n_symbols,
                                         self.max_lag)
            return m.rx_frame(fi, fq, self.n_symbols), rep

        self._detect = detect
        self._decode = decode

    def push(self, i: jnp.ndarray, q: jnp.ndarray) -> list:
        """Append a chunk; returns ``[(bits, report), ...]`` for every
        frame whose samples are now fully buffered. ``report`` is the
        :meth:`OfdmModem.locate_frame` report with ``start`` converted to
        the global stream index (host int) and an ``sc_detect`` score."""
        self._buf_i = jnp.concatenate(
            [self._buf_i, jnp.asarray(i, jnp.float32)], -1)
        self._buf_q = jnp.concatenate(
            [self._buf_q, jnp.asarray(q, jnp.float32)], -1)
        return self._drain(final=False)

    def flush(self) -> list:
        """End of stream: zero-pad the residue to one last full window and
        drain any final frame whose preamble is already buffered. The
        receiver then resets to a FRESH stream — a subsequent ``push``
        starts a new stream with global indices from 0."""
        if self._buf_i.shape[-1] > self.modem.preamble_len:
            pad = jnp.zeros((self.win,), jnp.float32)
            self._buf_i = jnp.concatenate([self._buf_i, pad], -1)
            self._buf_q = jnp.concatenate([self._buf_q, pad], -1)
        out = self._drain(final=True)
        self._buf_i = jnp.zeros((0,), jnp.float32)
        self._buf_q = jnp.zeros((0,), jnp.float32)
        self._pos = 0
        return out

    def _advance(self, n: int) -> None:
        self._buf_i = self._buf_i[..., n:]
        self._buf_q = self._buf_q[..., n:]
        self._pos += n

    def _drain(self, final: bool) -> list:
        frames = []
        while self._buf_i.shape[-1] >= self.win:
            wi = self._buf_i[..., :self.win]
            wq = self._buf_q[..., :self.win]
            peak, coarse = self._detect(wi, wq)
            if float(peak) < self.threshold:
                # no STF plateau in the leading lags: skip ahead, keeping
                # one symbol of lookback for a plateau cut at the seam
                self._advance(self.max_lag - self.modem.sym_len
                              if self.max_lag > self.modem.sym_len
                              else self.max_lag)
                continue
            c = int(coarse)
            if c > self.max_lag - self.modem.sym_len and not final:
                # plateau near the edge of the detection range: realign so
                # the burst sits early in the next window (its tail may
                # not be buffered yet)
                self._advance(max(1, c - self.modem.cp))
                continue
            bits, rep = self._decode(wi, wq)
            start = int(rep["start"])
            rep = dict(rep)
            rep["start"] = self._pos + start
            rep["sc_detect"] = float(peak)
            frames.append((bits, rep))
            self._advance(start + self.frame_len)
        return frames

"""Frequency-hopping spread spectrum behind the polyphase channelizer.

The dual of :mod:`modem_tpu.dsss`: instead of spreading every symbol over
PN chips in time, the carrier *hops* across the channelizer's M channels
on a known schedule — a partial-band jammer only touches the dwells that
land on its channel, and an interceptor without the hop sequence sees
fragments.

TPU shaping — the hop is ALGEBRA, not control flow:

* TX: each dwell's chain waveform (any bits->bits chain of this
  framework at channel rate) is placed on its hop channel by one
  einsum with the one-hot hop matrix ``[D, M]`` (the same
  gather-free one-hot trick as :func:`modem_tpu.ops.slicer.lut_map`),
  then the synthesis bank (:class:`modem_tpu.ops.channelizer.Channelizer`)
  makes one wideband stream;
* RX: analysis bank -> the SAME one-hot einsum contracts the hopped
  channels back into the dwell stream -> chain RX. No dwell-indexed
  gathers anywhere;
* the banks' group delay and passband gain are calibrated ONCE at
  first use by probing the synthesis->analysis cascade with an impulse
  (delay) and a DC tone (complex gain) — device-independent, cached.

Dwells are separated by a guard of bank-transient length so hops cannot
smear into each other. Reference equivalent: none (single fixed carrier,
`modulate.rs:71`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ops.channelizer import Channelizer


class FhssModem:
    """Frequency hopper: ``chain`` (any bits->bits chain with ``tx``/
    ``rx(n_symbols)`` at channel rate), ``m`` channels, and a static
    ``hop_seq [n_dwells]`` of channel indices. Each dwell carries
    ``dwell_symbols`` symbols.
    """

    def __init__(self, chain, m: int, hop_seq, dwell_symbols: int,
                 taps_per_phase: int = 12):
        hop = np.asarray(hop_seq, np.int64)
        if hop.ndim != 1 or hop.size < 1:
            raise ValueError("hop_seq must be a 1-D channel-index list")
        if hop.min() < 0 or hop.max() >= m:
            raise ValueError(f"hop indices must lie in [0, {m})")
        self.chain = chain
        self.m = int(m)
        self.hop = hop
        self.n_dwells = hop.size
        self.dwell_symbols = int(dwell_symbols)
        self.bank = Channelizer(m, taps_per_phase)
        # one-hot hop matrix [D, M] — the "gather" both directions
        self._hop_onehot = np.zeros((hop.size, m), np.float32)
        self._hop_onehot[np.arange(hop.size), hop] = 1.0
        # chain waveform length per dwell + a guard of bank-transient
        # length so consecutive hops cannot smear into each other.
        # Probed abstractly (eval_shape: no device work) rather than
        # assumed, so ANY chain-protocol object works — e.g. a DSSS
        # chain emits (symbols*L + span)*sps samples per dwell, not
        # (symbols + span)*sps.
        probe = jax.ShapeDtypeStruct(
            (1, dwell_symbols * chain.scheme.bits_per_symbol), jnp.int32)
        out = jax.eval_shape(chain.tx, probe)
        wave = jax.tree.leaves(out)[0]
        self._wave_len = int(wave.shape[-1])
        self._guard = 2 * taps_per_phase
        self._dwell_len = self._wave_len + self._guard
        self._cal = None  # (delay, gi, gq), probed lazily

    @property
    def bits_per_dwell(self) -> int:
        return self.dwell_symbols * self.chain.scheme.bits_per_symbol

    def bits_per_frame(self) -> int:
        return self.n_dwells * self.bits_per_dwell

    def _calibrate(self):
        """Group delay (impulse argmax) and passband complex gain (DC
        steady state) of synthesis->analysis on one channel."""
        if self._cal is not None:
            return self._cal
        n = 16 * self.bank.taps_per_phase
        t0 = n // 2
        zi = np.zeros((self.m, n), np.float32)
        imp = zi.copy()
        imp[0, t0] = 1.0
        wi, wq = self.bank.synthesize(jnp.asarray(imp), jnp.asarray(zi))
        yi, yq = self.bank.analyze(wi, wq)
        mag = np.asarray(yi)[0] ** 2 + np.asarray(yq)[0] ** 2
        delay = int(np.argmax(mag)) - t0
        if delay < 0:
            raise RuntimeError("bank calibration found a negative group "
                               "delay — probe window too short?")
        dc = zi.copy()
        dc[0, :] = 1.0
        wi, wq = self.bank.synthesize(jnp.asarray(dc), jnp.asarray(zi))
        yi, yq = self.bank.analyze(wi, wq)
        mid = n // 2 + delay
        gi = float(np.asarray(yi)[0, mid])
        gq = float(np.asarray(yq)[0, mid])
        self._cal = (delay, gi, gq)
        return self._cal

    # ------------------------------------------------------------------

    def tx(self, bits: jnp.ndarray):
        """``[..., n_dwells*bits_per_dwell]`` -> one wideband I/Q stream
        at ``M x`` the channel rate."""
        if bits.shape[-1] != self.bits_per_frame():
            raise ValueError(
                f"expected {self.bits_per_frame()} bits "
                f"({self.n_dwells} dwells x {self.bits_per_dwell})")
        d = self.n_dwells
        b = bits.reshape(bits.shape[:-1] + (d, self.bits_per_dwell))
        wi, wq = self.chain.tx(b)          # [..., D, wave_len]
        z = jnp.zeros(wi.shape[:-1] + (self._guard,), wi.dtype)
        si = jnp.concatenate([wi, z], axis=-1)  # [..., D, dwell_len]
        sq = jnp.concatenate([wq, z], axis=-1)
        hop = jnp.asarray(self._hop_onehot)
        # channel grid [..., M, D*dwell_len]: channel m carries dwell d's
        # stream iff hop[d] == m
        gi = jnp.einsum("...dt,dm->...mdt", si, hop)
        gq = jnp.einsum("...dt,dm->...mdt", sq, hop)
        gi = gi.reshape(gi.shape[:-2] + (d * self._dwell_len,))
        gq = gq.reshape(gq.shape[:-2] + (d * self._dwell_len,))
        return self.bank.synthesize(gi, gq)

    def rx(self, wi: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
        """Wideband stream -> bits, following the hop schedule."""
        delay, gi_, gq_ = self._calibrate()
        yi, yq = self.bank.analyze(wi, wq)  # [..., M, K]
        pad = jnp.zeros(yi.shape[:-1] + (max(0, delay),), yi.dtype)
        yi = jnp.concatenate([yi[..., delay:], pad], axis=-1)
        yq = jnp.concatenate([yq[..., delay:], pad], axis=-1)
        d = self.n_dwells
        need = d * self._dwell_len
        shp = yi.shape[:-1] + (d, self._dwell_len)
        yi = yi[..., :need].reshape(yi.shape[:-2] + (self.m,) + shp[-2:])
        yq = yq[..., :need].reshape(yq.shape[:-2] + (self.m,) + shp[-2:])
        hop = jnp.asarray(self._hop_onehot)
        si = jnp.einsum("...mdt,dm->...dt", yi, hop)
        sq = jnp.einsum("...mdt,dm->...dt", yq, hop)
        # undo the banks' passband complex gain
        g2 = max(gi_ * gi_ + gq_ * gq_, 1e-24)
        ri = (si * gi_ + sq * gq_) / g2
        rq = (sq * gi_ - si * gq_) / g2
        out = self.chain.rx((ri[..., :self._wave_len],
                             rq[..., :self._wave_len]),
                            self.dwell_symbols)   # [..., D, bpd]
        return out.reshape(out.shape[:-2] + (-1,))

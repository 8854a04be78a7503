"""Direct-sequence spread spectrum around any constellation chain.

New capability (the reference is narrowband-only): each symbol is
multiplied by a ±1 PN sequence of ``spread_factor`` chips, spreading its
energy over ``L``x the bandwidth; the receiver's correlator concentrates
it back (processing gain ``L``) while narrowband interference — the
classic jammer — stays spread and is rejected by the same factor.

TPU shaping: spreading happens in the I/Q domain — map symbols through
the constellation (one-hot matmul, :func:`modem_tpu.ops.slicer.lut_map`),
tile each point over its ``L`` chips, multiply by the PN plane — then the
chip stream rides the standard RRC pulse-shaping machinery
(:func:`modem_tpu.chain.shape_iq`) at chip rate. Despreading is ONE
``[K, L] @ [L]`` matmul over the matched-filter chip decisions. No new
kernels: the whole scheme is the existing chain with a rank-expanding
multiply on one side and a contracting matmul on the other, so fused
TX/RX kernels, sharding, and soft output compose unchanged.

``Rates`` here is the CHIP rate config (``samples_per_symbol`` samples
per chip); the actual symbol rate is ``baud / spread_factor``.

Reference equivalent: none (`modulate.rs` has no spreading); the PN is a
seeded Bernoulli sequence — drop in a standard's code (Gold/Barker) by
passing ``pn``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .chain import matched_decision_points, shape_iq
from .config import Rates
from .ops.filters import rrc_taps
from .ops.llr import lut_llr
from .ops.slicer import lut_map, lut_slice
from .utils.bits import pack_bits, unpack_symbols


class DsssChain:
    """Spread-spectrum bits->bits chain over any LUT scheme.

    ``spread_factor``: chips per symbol (the processing gain). ``pn``:
    optional explicit ±1 chip sequence ``[spread_factor]``; defaults to a
    seeded random sequence.
    """

    def __init__(self, scheme, rates: Rates, spread_factor: int,
                 span_symbols: int = 8, beta: float = 0.35,
                 pn: np.ndarray | None = None, seed: int = 7):
        if not hasattr(scheme, "lut"):
            raise TypeError("DsssChain needs a constellation-LUT scheme")
        if spread_factor < 2:
            raise ValueError("spread_factor must be >= 2")
        self.scheme = scheme
        self.rates = rates
        self.l = int(spread_factor)
        self.span = span_symbols
        self.sps = rates.samples_per_symbol  # samples per CHIP
        self.rrc = rrc_taps(self.sps, span_symbols, beta)
        self.lut = np.asarray(scheme.lut, np.float32)
        if pn is None:
            rng = np.random.default_rng(seed)
            pn = 2.0 * rng.integers(0, 2, self.l) - 1.0
        pn = np.asarray(pn, np.float32)
        if pn.shape != (self.l,) or not np.all(np.abs(pn) == 1.0):
            raise ValueError(f"pn must be ±1 of length {self.l}")
        self.pn = pn

    # ------------------------------------------------------------------

    def _spread(self, bits: jnp.ndarray):
        syms = pack_bits(bits, self.scheme.bits_per_symbol)
        mi, mq = lut_map(syms, self.lut)           # [..., K]
        pn = jnp.asarray(self.pn)
        ci = (mi[..., None] * pn).reshape(mi.shape[:-1] + (-1,))
        cq = (mq[..., None] * pn).reshape(mq.shape[:-1] + (-1,))
        return ci, cq                                # [..., K*L] chips

    def tx(self, bits: jnp.ndarray):
        """bits -> chip-rate RRC baseband, ``(K*L + span) * sps`` samples."""
        ci, cq = self._spread(bits)
        return shape_iq(jnp.stack([ci, cq], axis=-1), self.rrc, self.sps,
                        self.span, polyphase=False)

    def _despread(self, i: jnp.ndarray, q: jnp.ndarray, n_symbols: int):
        """Waveform -> symbol decision points: matched filter at chip
        instants, then the PN correlator (one [K, L] @ [L] matmul)."""
        di, dq = matched_decision_points(
            i, q, self.rrc, self.sps, self.span, n_symbols * self.l,
            polyphase=False)
        pn = jnp.asarray(self.pn / self.l)
        shp = di.shape[:-1] + (n_symbols, self.l)
        return di.reshape(shp) @ pn, dq.reshape(shp) @ pn

    def rx(self, rx_wave, n_symbols: int) -> jnp.ndarray:
        i, q = rx_wave
        di, dq = self._despread(i, q, n_symbols)
        syms = lut_slice(di, dq, self.lut)
        return unpack_symbols(syms, self.scheme.bits_per_symbol)

    def rx_soft(self, rx_wave, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        """``noise_var`` is the per-rail chip-level variance; the
        correlator averages it down by the processing gain L."""
        i, q = rx_wave
        di, dq = self._despread(i, q, n_symbols)
        return lut_llr(di, dq, self.lut, self.scheme.bits_per_symbol,
                       noise_var / self.l)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        return self.rx(self.tx(bits), bits.shape[-1]
                       // self.scheme.bits_per_symbol)

"""GMSK: Gaussian minimum-shift keying, bits -> constant-envelope waveform.

New capability (the reference's closest scheme is MSK, `msk.rs:12-35` —
rectangular frequency pulses; GMSK is its Gaussian-filtered refinement,
deployed in GSM/AIS/satellite telemetry, trading controlled ISI for a much
tighter spectrum).

TPU-first design — the phase integral is decomposed so that nothing ever
drifts and nothing is sequential:

    theta[n] = (pi/2/sps) * sum_k a_k * G[n - k*sps],   G = cumsum(g)

with ``g`` the Gaussian frequency pulse (``sum g = sps``: every symbol
still contributes exactly a quarter turn, like MSK). ``G`` splits into

* ``G_sat``: the delayed MSK ramp (0 -> sps over one symbol) — its
  contribution is the **integer-exact MSK phase backbone**: a cumulative
  sum of ±1 symbol signs in units of ``pi/2/sps``, carried mod ``4*sps``
  across blocks exactly like the PhaseProgram schemes
  (:mod:`modem_tpu.models.base`) — bit-stable on unbounded streams, no
  f32 phase accumulation;
* ``G_tr = G - G_sat``: a **compact** (one pulse length) transient that
  returns to zero after every symbol — so its contribution is a plain
  causal FIR over the zero-stuffed symbol impulses, bounded by
  construction, with the framework's standard FIR tail as streaming
  state. No cumsum of the Gaussian tail ever happens.

In the MSK limit (``g = ones(sps)``) the transient vanishes and the chain
degenerates to the exact MSK phase ramp.

RX is the FSK-family discriminator (config #3 pattern,
:class:`modem_tpu.chain.FskChain`): instantaneous frequency, per-symbol
window means at the pulse's group delay, sign decisions. The Gaussian ISI
keeps the noiseless eye open for all BT >= 0.25 (the dominant-tap phase
advance exceeds the neighbors' combined pull), so noiseless decisions are
exact — tested at BT 0.3 (GSM) and 0.5.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp

from .config import Rates
from .ops.fir import fir_filter
from .ops.slicer import fm_discriminate


@lru_cache(maxsize=16)
def gmsk_pulse(bt: float, sps: int, span: int):
    """(g, G_tr, D): Gaussian frequency pulse ``g`` (length span*sps,
    ``sum g = sps``), the compact cumsum transient ``G_tr``, and the
    backbone delay ``D`` in samples.

    ``g = rect(sps) * gauss(BT)`` with the Gaussian's sigma =
    ``sps * sqrt(ln 2) / (2*pi*BT)`` (the standard GMSK premodulation
    filter), truncated to ``span`` symbols and renormalized.
    """
    if span < 2:
        raise ValueError("GMSK needs span >= 2 symbols of pulse support")
    sigma = sps * np.sqrt(np.log(2.0)) / (2.0 * np.pi * bt)
    m = (span - 1) * sps
    t = np.arange(m + 1, dtype=np.float64) - m / 2.0
    h = np.exp(-0.5 * (t / sigma) ** 2)
    h /= h.sum()
    g = np.convolve(np.ones(sps), h)          # length span*sps
    g *= sps / g.sum()
    gc = np.cumsum(g)
    l = g.size
    d = (l - sps) // 2
    ramp = np.clip(np.arange(1, l + 1, dtype=np.float64) - d, 0, sps)
    g_tr = (gc - ramp).astype(np.float32)
    return g.astype(np.float32), g_tr, d


class GmskChain:
    """GMSK bits->bits chain with streaming state (1 bit/symbol).

    ``bt``: 3-dB-bandwidth x symbol-time product of the Gaussian filter
    (0.3 = GSM, 0.5 = DECT-ish; larger -> closer to MSK). ``span``: pulse
    support in symbols. :meth:`tx` appends ``span`` flush symbols so the
    last bit's pulse fully lands in the waveform.
    """

    bits_per_symbol = 1

    def __init__(self, rates: Rates, bt: float = 0.3, span: int = 4,
                 amplitude: float = 1.0, guard: int = 1):
        sps = rates.samples_per_symbol
        if guard < 1 or guard >= sps:
            raise ValueError("need 1 <= guard < samples_per_symbol")
        self.rates = rates
        self.bt = float(bt)
        self.span = int(span)
        self.amplitude = float(amplitude)
        self.guard = int(guard)
        self.sps = sps
        _, self._g_tr, self._delay = gmsk_pulse(self.bt, sps, self.span)

    # ------------------------------------------------------------------

    def init_state(self, batch_shape: tuple = ()) -> dict:
        """Streaming state: integer backbone phase (units of pi/2/sps,
        mod 4*sps), the delayed-backbone buffer, and the transient FIR
        tail — a serializable pytree like every state in this framework."""
        d, l = self._delay, self._g_tr.size
        return {
            "u": jnp.zeros(batch_shape, jnp.int32),
            "ubuf": jnp.zeros(batch_shape + (d,), jnp.int32),
            "fir": jnp.zeros(batch_shape + (l - 1,), jnp.float32),
        }

    def _core(self, a: jnp.ndarray, state: dict):
        """Signs ``a [..., K]`` (int32, 0 allowed for flush) -> I/Q
        ``[..., K*sps]`` + new state."""
        sps = self.sps
        k = a.shape[-1]
        n = k * sps
        r = jnp.repeat(a, sps, axis=-1, total_repeat_length=n)
        u = (state["u"][..., None] + jnp.cumsum(r, axis=-1)) % (4 * sps)
        ud = jnp.concatenate([state["ubuf"], u], axis=-1)
        stuffed = jnp.concatenate(
            [a[..., None].astype(jnp.float32),
             jnp.zeros(a.shape + (sps - 1,), jnp.float32)],
            axis=-1).reshape(a.shape[:-1] + (n,))
        delta, fir = fir_filter(stuffed, self._g_tr, state["fir"])
        theta = (ud[..., :n].astype(jnp.float32) + delta) * jnp.float32(
            np.pi / 2.0 / sps)
        new_state = {"u": u[..., -1], "ubuf": ud[..., n:], "fir": fir}
        return (self.amplitude * jnp.cos(theta),
                self.amplitude * jnp.sin(theta), new_state)

    def tx_stream(self, bits: jnp.ndarray, state: dict):
        """``[..., K]`` bits -> ``(i, q, new_state)``, ``K*sps`` samples.
        Chunked == one-shot bit-exact (integer backbone + FIR tails)."""
        a = (2 * bits.astype(jnp.int32) - 1)
        return self._core(a, state)

    def tx(self, bits: jnp.ndarray):
        """One-shot TX with ``span`` flush symbols appended (zero signs:
        the backbone holds, the transient FIR drains), so RX sees every
        symbol's full pulse. ``[..., (K+span)*sps]`` samples."""
        st = self.init_state(bits.shape[:-1])
        i0, q0, st = self.tx_stream(bits, st)
        flush = jnp.zeros(bits.shape[:-1] + (self.span,), jnp.int32)
        i1, q1, _ = self._core(flush, st)
        return (jnp.concatenate([i0, i1], axis=-1),
                jnp.concatenate([q0, q1], axis=-1))

    # ------------------------------------------------------------------

    def _symbol_means(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        sps, d = self.sps, self._delay
        k = i.shape[-1] // sps - self.span
        if k < 1:
            raise ValueError("waveform shorter than the flush tail")
        inst = fm_discriminate(i, q)
        x = inst[..., d:d + k * sps].reshape(inst.shape[:-1] + (k, sps))
        return jnp.mean(x[..., self.guard:], axis=-1)

    def rx(self, i: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """Waveform (as produced by :meth:`tx`) -> decided bits: FM
        discriminator, per-symbol window means at the pulse delay, sign."""
        return (self._symbol_means(i, q) > 0).astype(jnp.int32)

    def rx_soft(self, i: jnp.ndarray, q: jnp.ndarray,
                noise_var: float = 1.0) -> jnp.ndarray:
        """Waveform -> per-bit LLRs (positive = bit 0, the framework
        convention): binary discriminator-domain LLR ``-2*mu*m/nv`` with
        ``mu = pi/2/sps`` the per-sample frequency of a lone bit.
        Sign-of-LLR == :meth:`rx` decisions."""
        mu = np.pi / 2.0 / self.sps
        return -2.0 * mu * self._symbol_means(i, q) / jnp.float32(noise_var)

    def roundtrip(self, bits: jnp.ndarray) -> jnp.ndarray:
        i, q = self.tx(bits)
        return self.rx(i, q)

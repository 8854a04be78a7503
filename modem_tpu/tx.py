"""Block modulator: the TX driver.

Replaces the reference's per-sample iterator chain (`DigitalModulator`,
`/root/reference/src/modem/modulator.rs:64-101`) with a jittable block
transform over ``[channels, n]`` tensors:

    bits -> pack to symbols -> scheme.program (LUT gathers / prefix sums)
         -> synthesize (one fused elementwise pass) -> NCO mix to passband

All streaming state (sample counters reduced mod their static periods, plus
per-scheme phase accumulators) is an explicit pytree, so long streams are
processed block-by-block with bit-stable continuity — the "checkpointable
carry" design from SURVEY.md section 5.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .config import Rates
from .models.base import Scheme, synthesize
from .ops.nco import carrier_phase, mix_up
from .utils.bits import pack_bits

#: Reference driver indexing quirk: phasor timestamps lead the carrier phase by
#: one sample (`carrier.rs:21-26` post-increment vs `modulator.rs:85-100`).
REF_TIME_OFFSET = 1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TxState:
    """Streaming carry: sample index mod the carrier period and mod the
    scheme's phase denominator, plus the scheme's own accumulator pytree."""

    s_mod_sr: jnp.ndarray  # int32 scalar
    s_mod_den: jnp.ndarray  # int32 scalar
    scheme: Any

    def tree_flatten(self):
        return (self.s_mod_sr, self.s_mod_den, self.scheme), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class Modulator:
    """Digital block modulator for one scheme + rate + carrier configuration.

    ``carrier_hz`` may be None for pure-baseband (--iq mode) use; passband
    methods then raise. The object itself is static configuration; call
    :meth:`init_state` for the runtime carry.
    """

    def __init__(self, scheme: Scheme, rates: Rates, carrier_hz: int | None = None):
        self.scheme = scheme
        self.rates = rates
        self.carrier_hz = carrier_hz
        if carrier_hz is not None and not carrier_hz < rates.sample_rate / 2:
            raise ValueError("carrier must satisfy Nyquist")  # `modulate.rs:68`
        self.den = scheme.den if scheme.den else rates.sample_rate

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> TxState:
        return TxState(
            s_mod_sr=jnp.zeros((), jnp.int32),
            s_mod_den=jnp.zeros((), jnp.int32),
            scheme=self.scheme.init_state(batch_shape),
        )

    def _advance(self, state: TxState, n: int) -> TxState:
        return TxState(
            s_mod_sr=(state.s_mod_sr + n % self.rates.sample_rate)
            % self.rates.sample_rate,
            s_mod_den=(state.s_mod_den + n % self.den) % self.den,
            scheme=state.scheme,
        )

    def baseband(
        self, bits: jnp.ndarray, state: TxState
    ) -> tuple[tuple[jnp.ndarray, jnp.ndarray], TxState]:
        """bits ``[..., K*bps]`` -> baseband I/Q ``[..., K*sps]`` (--iq mode,
        `modulate.rs:109-116`)."""
        symbols = pack_bits(bits, self.scheme.bits_per_symbol)
        prog, scheme_state = self.scheme.program(
            symbols, state.scheme, self.rates, state.s_mod_den
        )
        i, q = synthesize(
            prog, self.rates.samples_per_symbol, state.s_mod_den, REF_TIME_OFFSET
        )
        n = symbols.shape[-1] * self.rates.samples_per_symbol
        new_state = self._advance(
            TxState(state.s_mod_sr, state.s_mod_den, scheme_state), n
        )
        return (i, q), new_state

    def passband(
        self, bits: jnp.ndarray, state: TxState
    ) -> tuple[jnp.ndarray, TxState]:
        """bits -> real passband waveform (`modulate.rs:128-133`):
        re = i*cos(theta_c) - q*sin(theta_c)."""
        if self.carrier_hz is None:
            raise ValueError("passband output requires a carrier")
        (i, q), new_state = self.baseband(bits, state)
        theta = carrier_phase(
            self.carrier_hz, self.rates.sample_rate, i.shape[-1], state.s_mod_sr
        )
        re, _ = mix_up(i, q, theta)
        return re, new_state

    def preamble(self, cycles: int, state: TxState) -> tuple[jnp.ndarray, TxState]:
        """Carrier sync tone: ``sr/cf * cycles - 1`` samples of cos(theta(s))
        (`modulate.rs:118-126`; the Raw phasor is (A, 0), `phasor.rs:5-24`).
        Advances the sample counter so the digital stream continues the
        preamble's phase seamlessly (`modulate.rs:71,120,128`)."""
        if self.carrier_hz is None:
            raise ValueError("preamble requires a carrier")
        sr = self.rates.sample_rate
        if sr % self.carrier_hz != 0:
            raise ValueError("preamble requires sr % carrier == 0")  # `modulate.rs:62`
        n = sr // self.carrier_hz * cycles - 1
        theta = carrier_phase(self.carrier_hz, sr, n, state.s_mod_sr)
        return jnp.cos(theta), self._advance(state, n)

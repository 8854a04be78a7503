"""Block demodulator: reference-parity coherent RX.

Mirrors the reference receive path (`/root/reference/src/modem/demodulator.rs:7-57`
and the `demodulate` binary, `src/bin/demodulate.rs:15-43`):

    i16 passband -> Hilbert FIR -> analytic signal        (lock only)
    -> 64-sample PLL acquisition (phase frozen afterwards)
    -> product detector: i = 2*LPF(x*cos(theta+phi)), q = 2*LPF(-x*sin(theta+phi))

as jittable block transforms with an explicit RxState pytree (carrier counter,
acquired phase, FIR tails). The modern bits->bits chain with matched filtering
and slicing lives in :mod:`modem_tpu.chain`.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from .ops import filters
from .ops.fir import fir_filter, fir_init_state
from .ops.nco import carrier_phase, mix_down
from .ops.pll import LOCK_SAMPLES, pll_lock


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RxState:
    s_mod_sr: jnp.ndarray  # carrier sample counter mod sr
    phase_offset: jnp.ndarray  # acquired PLL offset (f32, [...])
    hilbert: jnp.ndarray  # Hilbert FIR tail
    lpi: jnp.ndarray  # I lowpass tail
    lpq: jnp.ndarray  # Q lowpass tail

    def tree_flatten(self):
        return (self.s_mod_sr, self.phase_offset, self.hilbert, self.lpi,
                self.lpq), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class Demodulator:
    """Coherent product-detector demodulator for one carrier configuration.

    Defaults reproduce the reference binary: 23-tap Hilbert transformer and a
    64-tap lowpass (passband 0-1 kHz, stopband 1.5-5 kHz at 10 kHz)
    (`demodulate.rs:10,36,46-150`) — designed to spec, not copied.
    """

    def __init__(
        self,
        carrier_hz: int,
        sample_rate: int,
        lowpass=None,
        hilbert=None,
        fir_backend: str = "direct",
    ):
        self.carrier_hz = carrier_hz
        self.sample_rate = sample_rate
        self.lowpass = (
            jnp.asarray(lowpass, jnp.float32)
            if lowpass is not None
            else jnp.asarray(filters.lowpass_taps(sample_rate=sample_rate))
        )
        self.hilbert = (
            jnp.asarray(hilbert, jnp.float32)
            if hilbert is not None
            else jnp.asarray(filters.hilbert_taps())
        )
        self.fir_backend = fir_backend

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> RxState:
        return RxState(
            s_mod_sr=jnp.zeros((), jnp.int32),
            phase_offset=jnp.zeros(batch_shape, jnp.float32),
            hilbert=fir_init_state(self.hilbert, batch_shape),
            lpi=fir_init_state(self.lowpass, batch_shape),
            lpq=fir_init_state(self.lowpass, batch_shape),
        )

    def analytic(self, x: jnp.ndarray, state: RxState):
        """Analytic-signal planes ``(x, H(x))`` (`demodulate.rs:31-34`) — kept
        as two real tensors; complex dtypes never enter the TPU path. The
        reference applies no group-delay compensation to the Hilbert arm;
        neither do we."""
        h, tail = fir_filter(x, self.hilbert, state.hilbert, self.fir_backend)
        return (x, h), tail

    def lock_phase(self, x: jnp.ndarray, state: RxState) -> RxState:
        """Consume ``LOCK_SAMPLES`` passband samples and acquire the carrier
        phase offset (`demodulator.rs:32-36`). ``x``: ``[..., 64]``."""
        if x.shape[-1] != LOCK_SAMPLES:
            raise ValueError(f"lock_phase needs exactly {LOCK_SAMPLES} samples")
        (si, sq), htail = self.analytic(x, state)
        theta = carrier_phase(
            self.carrier_hz, self.sample_rate, LOCK_SAMPLES, state.s_mod_sr
        )
        phi = state.phase_offset + pll_lock(si, sq, theta)
        return RxState(
            s_mod_sr=(state.s_mod_sr + LOCK_SAMPLES) % self.sample_rate,
            phase_offset=phi,
            hilbert=htail,
            lpi=state.lpi,
            lpq=state.lpq,
        )

    def demodulate(
        self, x: jnp.ndarray, state: RxState
    ) -> tuple[tuple[jnp.ndarray, jnp.ndarray], RxState]:
        """Steady-state product detection (`demodulator.rs:44-56`):
        per sample, i = 2*LPF(x*cos(theta+phi)), q = 2*LPF(-x*sin(theta+phi)).
        """
        n = x.shape[-1]
        theta = carrier_phase(self.carrier_hz, self.sample_rate, n, state.s_mod_sr)
        total = theta + state.phase_offset[..., None]
        mi, mq = mix_down(x, total)
        yi, lpi = fir_filter(mi, self.lowpass, state.lpi, self.fir_backend)
        yq, lpq = fir_filter(mq, self.lowpass, state.lpq, self.fir_backend)
        new_state = RxState(
            s_mod_sr=(state.s_mod_sr + n % self.sample_rate) % self.sample_rate,
            phase_offset=state.phase_offset,
            hilbert=state.hilbert,
            lpi=lpi,
            lpq=lpq,
        )
        return (2.0 * yi, 2.0 * yq), new_state

    def demodulate_fused(
        self, x: jnp.ndarray, state: RxState, x_tail: jnp.ndarray | None = None
    ):
        """Steady-state product detection as one Pallas kernel
        (:func:`modem_tpu.ops.pallas_demod.fused_product_detect`): the
        reference's RX hot loop (`demodulator.rs:44-56`) — exact integer NCO
        + acquired phase, mix, both lowpass rails — in a single VMEM pass.

        ``x_tail`` is the previous block's last ``len(lowpass)-1`` passband
        samples (``None`` = zero FIR history, the stream start). Returns
        ``((i, q), new_state, new_x_tail)``; outputs equal
        :meth:`demodulate` to f32 rounding, and ``new_state`` keeps the
        staged path's mixed-input FIR tails up to date so the two
        implementations can be mixed mid-stream.
        """
        from .ops.pallas_demod import fused_product_detect

        lb = self.lowpass.shape[0] - 1
        n = x.shape[-1]
        if x_tail is None:
            x_tail = jnp.zeros(x.shape[:-1] + (lb,), jnp.float32)
        xt = jnp.concatenate([x_tail, x], axis=-1)
        base = (state.s_mod_sr - lb) % self.sample_rate
        yi, yq = fused_product_detect(
            xt, self.carrier_hz, self.sample_rate, self.lowpass,
            phase_offset=state.phase_offset, s_mod_sr=base,
        )
        # staged-path interop: the lowpass tails are the last lb *mixed*
        # samples — recompute them from the passband tail (cheap, symbol-free)
        theta = carrier_phase(
            self.carrier_hz, self.sample_rate, lb,
            (state.s_mod_sr + (n - lb)) % self.sample_rate,
        )
        mi, mq = mix_down(xt[..., -lb:], theta + state.phase_offset[..., None])
        new_state = RxState(
            s_mod_sr=(state.s_mod_sr + n % self.sample_rate) % self.sample_rate,
            phase_offset=state.phase_offset,
            hilbert=state.hilbert,
            lpi=mi,
            lpq=mq,
        )
        return (yi[..., lb:], yq[..., lb:]), new_state, xt[..., -lb:]

"""Amplitude-shift keying."""

from __future__ import annotations

import numpy as np

from .base import IQProgram, Scheme
import jax.numpy as jnp


class BASK(Scheme):
    """Binary ASK: i = b*A, q = 0 (`/root/reference/src/modem/digital/bask.rs:18-24`)."""

    bits_per_symbol = 1

    def __init__(self, amplitude: float):
        self.amplitude = amplitude
        #: 2-point constellation table — lets BASK ride every LUT-driven
        #: surface (PulseShapedChain, OFDM, STBC, slicers, LLRs)
        self.lut = np.array([[0.0, 0.0], [amplitude, 0.0]], np.float32)

    def program(self, symbols, state, rates, t0_mod):
        i = symbols.astype(jnp.float32) * jnp.float32(self.amplitude)
        return IQProgram(i=i, q=jnp.zeros_like(i)), state

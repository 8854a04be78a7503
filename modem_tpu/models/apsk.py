"""Amplitude-and-phase-shift keying over concentric rings."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import TWO_PI
from ..utils.bits import max_symbol
from .base import Scheme
from .psk import _lut_gather


@dataclasses.dataclass(frozen=True)
class Ring:
    """Symbols [start, end) on a ring of given radius and phase offset
    (`/root/reference/src/modem/digital/apsk.rs:60-82`)."""

    start: int
    end: int
    radius: float
    phase: float

    def __post_init__(self):
        if not 0.0 <= self.radius <= 1.0:
            raise ValueError("radius must be in [0, 1]")


class APSK(Scheme):
    """APSK (`apsk.rs:12-57`): symbol -> (ring radius, angle within ring),
    angle = 2*pi*(sym - start)/(end - start) + ring.phase. The per-symbol ring
    search collapses into a precomputed LUT; ring coverage is validated at
    construction exactly like `apsk.rs:85-97`.
    """

    def __init__(self, amplitude: float, bits_per_symbol: int, rings: list[Ring]):
        self.bits_per_symbol = bits_per_symbol
        prev = 0
        for ring in rings:
            if ring.start != prev:
                raise ValueError("rings must be contiguous from symbol 0")
            prev = ring.end
        if prev != max_symbol(bits_per_symbol) + 1:
            raise ValueError("rings must cover all symbols")

        n = 1 << bits_per_symbol
        lut = np.zeros((n, 2), np.float32)
        for ring in rings:
            sym = np.arange(ring.start, ring.end)
            ph = TWO_PI * (sym - ring.start) / (ring.end - ring.start) + ring.phase
            lut[sym, 0] = amplitude * ring.radius * np.cos(ph)
            lut[sym, 1] = amplitude * ring.radius * np.sin(ph)
        self.lut = lut

    def program(self, symbols, state, rates, t0_mod):
        return _lut_gather(self.lut, symbols), state

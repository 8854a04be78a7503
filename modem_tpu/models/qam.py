"""Quadrature amplitude modulation (square grids, e.g. 16-QAM / 256-QAM)."""

from __future__ import annotations

import math

import numpy as np

from ..utils.bits import max_symbol
from .base import Scheme
from .psk import _lut_gather


class QAM(Scheme):
    """Square-grid QAM (`/root/reference/src/modem/digital/qam.rs:14-60`).

    The symbol splits into MSB/LSB halves; each half maps to a grid level
    ``2*s - max`` scaled by ``A/max/2``, then the (I, Q) pair is rotated by
    ``phase``: i = a*(pos(msb)*cos - pos(lsb)*sin), q = a*(pos(lsb)*cos +
    pos(msb)*sin). Compiled to a full 2^bps-point LUT.

    ``gray=True`` Gray-codes each rail (``level_index = s ^ (s >> 1)``)
    before the level map, so adjacent constellation points differ in ONE
    bit — the production mapping (an adjacent-level slip costs 1 bit
    instead of the natural-binary average, see
    :func:`modem_tpu.harness.natural_binary_flip_factor`). Default stays
    the reference's natural-binary map (`qam.rs:32-38`) for parity.
    """

    def __init__(self, bits_per_symbol: int, phase: float,
                 amplitude: float, gray: bool = False):
        if bits_per_symbol <= 1:
            raise ValueError("QAM needs at least one bit per carrier")
        self.bits_per_symbol = bits_per_symbol
        self.phase = phase
        self.amplitude = amplitude
        self.gray = bool(gray)
        cs = bits_per_symbol // 2
        ms = float(max_symbol(cs))
        a = amplitude / ms / 2.0
        sym = np.arange(1 << bits_per_symbol)
        msb = sym >> (bits_per_symbol - cs)
        lsb = sym & max_symbol(bits_per_symbol - cs)
        if gray:
            # inverse Gray per rail: bit pattern g -> level index s with
            # s ^ (s >> 1) == g, so adjacent levels differ in one bit
            def inv_gray(g):
                s = g.copy()
                shift = 1
                while (1 << shift) <= int(g.max(initial=1)):
                    s = s ^ (s >> shift)
                    shift *= 2
                return s
            msb = inv_gray(msb)
            lsb = inv_gray(lsb)
        pos_m = 2.0 * msb - ms
        pos_l = 2.0 * lsb - ms
        c, s = math.cos(phase), math.sin(phase)
        self.lut = np.stack(
            [a * (pos_m * c - pos_l * s), a * (pos_l * c + pos_m * s)], axis=-1
        ).astype(np.float32)

    def program(self, symbols, state, rates, t0_mod):
        return _lut_gather(self.lut, symbols), state

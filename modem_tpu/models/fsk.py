"""Frequency-shift keying family: BFSK, MFSK, CPFSK, MSK.

These are the schemes whose per-symbol ``update()`` carries a phase-continuity
accumulator in the reference (`bfsk.rs:43-55`, `mfsk.rs:68-75`; CPFSK is
continuous by construction, `cpfsk.rs:17-31`). Each compiles to a
:class:`~modem_tpu.models.base.PhaseProgram` whose phase arithmetic is *exact*
integer math in units of ``1/sr`` turns: every continuity correction is an
integer multiple of ``dev_hz * t / sr`` turns, so the sequential accumulators
become modular prefix sums (:func:`modem_tpu.utils.scan.cummod`) with zero
drift — the parallel-prefix inversion of SURVEY.md section 3.4.

Boundary times: the reference driver calls ``update(carrier.sample, bits)``
*after* the carrier post-increments (`modulator.rs:85-97`), so the k-th symbol
boundary (sample ``k*sps``) observes timestamp ``t_k = k*sps + 1``; per-sample
evaluation likewise sees ``t = s + 1``. ``PhaseProgram`` reproduces this via
``time_offset=1``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import Rates
from ..utils.bits import max_symbol, unpack_symbols
from ..utils.scan import cummod
from .base import PhaseProgram, Scheme, stagger_bit_planes

_INT32_MAX = 2**31 - 1


def _check_range(max_fnum: int, den: int):
    if max_fnum * den > _INT32_MAX:
        raise ValueError(
            f"fnum*den = {max_fnum}*{den} would overflow int32 phase arithmetic"
        )


def _boundary_times(k: int, sps: int, sr: int, t0_mod) -> jnp.ndarray:
    """t_k = (t0 + k*sps + 1) mod sr for k in [0, K)."""
    idx = (jnp.arange(k, dtype=jnp.int32) * jnp.int32(sps % sr)) % sr
    return (jnp.asarray(t0_mod, jnp.int32) + idx + 1) % sr


class BFSK(Scheme):
    """Binary FSK: theta = b*w_dev*t + phi (`bfsk.rs:23-29`), with phi adjusted
    for phase continuity on each bit flip (`bfsk.rs:43-55`): flip to 1 subtracts
    ``w_dev*t_k``, flip to 0 adds ``w_dev*(t_k - 1)``.
    """

    bits_per_symbol = 1

    def __init__(self, deviation_hz: int, sample_rate: int, amplitude: float):
        self.dev = int(deviation_hz)
        self.den = int(sample_rate)
        self.amplitude = amplitude
        _check_range(self.dev, self.den)

    def init_state(self, batch_shape=()):
        return {
            "prev": jnp.zeros(batch_shape, jnp.int32),  # `bfsk.rs:19` prev = 0
            "pnum": jnp.zeros(batch_shape, jnp.int32),  # phase, units of 1/sr turn
        }

    def program(self, symbols, state, rates, t0_mod):
        sr, dev = self.den, self.dev
        k = symbols.shape[-1]
        t_k = _boundary_times(k, rates.samples_per_symbol, sr, t0_mod)
        b = symbols.astype(jnp.int32)
        prev = jnp.concatenate(
            [jnp.broadcast_to(state["prev"][..., None], b.shape[:-1] + (1,)),
             b[..., :-1]],
            axis=-1,
        )
        flip_to_1 = (b == 1) & (prev == 0)
        flip_to_0 = (b == 0) & (prev == 1)
        delta = jnp.where(
            flip_to_1,
            (-dev * t_k) % sr,
            jnp.where(flip_to_0, (dev * (t_k - 1)) % sr, 0),
        )
        pnum = (state["pnum"][..., None] + cummod(delta, sr)) % sr
        amp = jnp.full(b.shape, self.amplitude, jnp.float32)
        prog = PhaseProgram(gi=amp, gq=amp, fnum=b * dev, pnum=pnum, den=sr)
        new_state = {"prev": b[..., -1], "pnum": pnum[..., -1]}
        return prog, new_state


class MFSK(Scheme):
    """M-ary FSK: theta = coef(sym)*w_dev*t + phi (`mfsk.rs:60-82`), with
    continuity phi += (coef_prev - coef_new)*w_dev*t_k at each boundary
    (`mfsk.rs:68-75`). ``symbol_map`` selects the coefficient mapping:
    'default' = 2s - max (bipolar, `mfsk.rs:13-27`), 'increase' = 2s
    (`mfsk.rs:29-35`).
    """

    def __init__(self, bits_per_symbol: int, deviation_hz: int, sample_rate: int,
                 amplitude: float, symbol_map: str = "default"):
        self.bits_per_symbol = bits_per_symbol
        self.dev = int(deviation_hz)
        self.den = int(sample_rate)
        self.amplitude = amplitude
        if symbol_map not in ("default", "increase"):
            raise ValueError(f"unknown symbol map {symbol_map!r}")
        self.symbol_map = symbol_map
        self.max_sym = max_symbol(bits_per_symbol)
        _check_range(2 * self.max_sym * self.dev, self.den)

    def coef(self, symbols: jnp.ndarray) -> jnp.ndarray:
        s = symbols.astype(jnp.int32)
        if self.symbol_map == "increase":
            return 2 * s
        return 2 * s - self.max_sym

    def init_state(self, batch_shape=()):
        return {
            "cur_coef": jnp.zeros(batch_shape, jnp.int32),  # `mfsk.rs:57` starts 0
            "pnum": jnp.zeros(batch_shape, jnp.int32),
        }

    def program(self, symbols, state, rates, t0_mod):
        sr, dev = self.den, self.dev
        k = symbols.shape[-1]
        t_k = _boundary_times(k, rates.samples_per_symbol, sr, t0_mod)
        coef = self.coef(symbols)
        cprev = jnp.concatenate(
            [jnp.broadcast_to(state["cur_coef"][..., None], coef.shape[:-1] + (1,)),
             coef[..., :-1]],
            axis=-1,
        )
        # |cprev - coef| * dev * t_k <= 2*max_sym*dev*(sr-1) < 2^31 (checked in
        # __init__), so the product is exact in int32; cummod reduces mod sr.
        delta = (cprev - coef) * dev * t_k
        pnum = (state["pnum"][..., None] + cummod(delta, sr)) % sr
        amp = jnp.full(coef.shape, self.amplitude, jnp.float32)
        prog = PhaseProgram(gi=amp, gq=amp, fnum=coef * dev, pnum=pnum, den=sr)
        new_state = {"cur_coef": coef[..., -1], "pnum": pnum[..., -1]}
        return prog, new_state


class CPFSK(Scheme):
    """Continuous-phase FSK: theta = 2*sym*w*t with w from
    ``Freq(deviation*baud/2, sr)`` (`cpfsk.rs:17-31`). Stateless: the
    per-symbol phase advance is an integer number of turns, so phase is
    continuous at boundaries by construction.
    """

    def __init__(self, bits_per_symbol: int, rates: Rates, amplitude: float,
                 deviation: int):
        self.bits_per_symbol = bits_per_symbol
        self.dev_hz = deviation * rates.baud_rate // 2  # `cpfsk.rs:20-21`
        self.den = rates.sample_rate
        self.amplitude = amplitude
        _check_range(2 * max_symbol(bits_per_symbol) * self.dev_hz, self.den)

    def program(self, symbols, state, rates, t0_mod):
        fnum = 2 * symbols.astype(jnp.int32) * self.dev_hz
        amp = jnp.full(symbols.shape, self.amplitude, jnp.float32)
        prog = PhaseProgram(
            gi=amp, gq=amp, fnum=fnum, pnum=jnp.zeros_like(fnum), den=self.den
        )
        return prog, state


class MSK(Scheme):
    """Minimum-shift keying: half-sine weighting on staggered bit planes
    (`msk.rs:12-35`): i = A*sign(b0)*cos(pi*t/(2*spb)),
    q = -A*sign(b1)*sin(pi*t/(2*spb)) with spb = sps/2 and the b1 plane
    staggered half a symbol by `EvenOddOffset` (`modulate.rs:101-107`).

    The envelope has period 4*spb samples, so den = 2*sps and fnum = 1.
    """

    bits_per_symbol = 2

    def __init__(self, amplitude: float, samples_per_symbol: int):
        if samples_per_symbol % 2 != 0:
            raise ValueError("MSK requires even samples_per_symbol")  # `msk.rs:13`
        self.amplitude = amplitude
        self.den = 2 * samples_per_symbol  # = 4 * samples_per_bit

    def init_state(self, batch_shape=()):
        return jnp.zeros(batch_shape, jnp.int32)  # previous block's last b1

    def program(self, symbols, state, rates, t0_mod):
        bits = unpack_symbols(symbols, 2)
        b0, b1 = bits[..., 0::2], bits[..., 1::2]
        b0s, b1s, carry = stagger_bit_planes(b0, b1, state)
        amp = jnp.float32(self.amplitude)
        gi = (2 * b0s - 1).astype(jnp.float32) * amp
        gq = -(2 * b1s - 1).astype(jnp.float32) * amp
        ones = jnp.ones(b0s.shape, jnp.int32)
        prog = PhaseProgram(
            gi=gi, gq=gq, fnum=ones, pnum=jnp.zeros_like(ones), den=self.den,
            slots_per_symbol=2,
        )
        return prog, carry

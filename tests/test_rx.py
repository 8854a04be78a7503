"""Block demodulator vs a per-sample golden receiver.

The golden RX mirrors `demodulator.rs:7-57` + `demodulate.rs:29-43`: Hilbert
FIR -> analytic signal, 64-sample PLL lock, then per-sample product detection
through two lowpass FIRs. Both sides use the same (spec-designed) taps.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Modulator, Rates, make_scheme
from modem_tpu.ops import filters
from modem_tpu.ops.pll import LOCK_SAMPLES, PLL_GAIN
from modem_tpu.rx import Demodulator

from golden import golden_modulate, mod_trig

SR = 10000
BR = 500
CF = 1000


class GoldenFIR:
    """Direct-form FIR, one sample at a time (mirrors `fir.rs:10-34`)."""

    def __init__(self, taps):
        self.taps = np.asarray(taps, np.float64)
        self.hist = np.zeros(len(self.taps))

    def add(self, x):
        self.hist = np.roll(self.hist, 1)
        self.hist[0] = x
        return float(np.dot(self.taps, self.hist))


def golden_demodulate(x, cf, sr, lowpass, hilbert):
    """Returns (i, q) arrays of length len(x) - LOCK_SAMPLES."""
    wc = 2 * math.pi * cf / sr
    hfir = GoldenFIR(hilbert)
    analytic = [complex(v, hfir.add(v)) for v in x]
    phi = 0.0
    for s in range(LOCK_SAMPLES):
        theta = mod_trig(wc * s)
        err = np.angle(analytic[s] * np.exp(-1j * (theta + phi)))
        phi += PLL_GAIN * err
    lpi, lpq = GoldenFIR(lowpass), GoldenFIR(lowpass)
    out = []
    for k, s in enumerate(range(LOCK_SAMPLES, len(x))):
        theta = mod_trig(wc * s) + phi
        out.append((
            2.0 * lpi.add(x[s] * math.cos(theta)),
            2.0 * lpq.add(x[s] * -math.sin(theta)),
        ))
    return np.asarray(out)


def _tx_passband(name="qpsk", n_sym=48, preamble_cycles=8, seed=5):
    rng = np.random.default_rng(seed)
    rates = Rates(BR, SR)
    scheme = make_scheme(name, rates)
    bits = rng.integers(0, 2, size=n_sym * scheme.bits_per_symbol)
    return golden_modulate(name, bits, SR, BR, CF, mode="passband",
                           preamble_cycles=preamble_cycles), bits


def test_demodulator_matches_golden():
    x, _ = _tx_passband()
    lowpass = filters.lowpass_taps(sample_rate=SR)
    hilbert = filters.hilbert_taps()
    want = golden_demodulate(x, CF, SR, lowpass, hilbert)

    demod = Demodulator(CF, SR, lowpass=lowpass, hilbert=hilbert)
    state = demod.init_state()
    xj = jnp.asarray(x, jnp.float32)
    state = jax.jit(demod.lock_phase)(xj[:LOCK_SAMPLES], state)
    (i, q), _ = jax.jit(demod.demodulate)(xj[LOCK_SAMPLES:], state)
    got = np.stack([np.asarray(i), np.asarray(q)], axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_demodulator_streaming_chunks():
    x, _ = _tx_passband(seed=6)
    demod = Demodulator(CF, SR)
    xj = jnp.asarray(x, jnp.float32)
    state = jax.jit(demod.lock_phase)(xj[:LOCK_SAMPLES], demod.init_state())
    (i1, q1), _ = jax.jit(demod.demodulate)(xj[LOCK_SAMPLES:], state)

    rest = xj[LOCK_SAMPLES:]
    n = rest.shape[-1]
    cut = (n // 2) // 4 * 4
    outs = []
    st = state
    for part in (rest[:cut], rest[cut:]):
        (i, q), st = demod.demodulate(part, st)
        outs.append(np.stack([np.asarray(i), np.asarray(q)], -1))
    got = np.concatenate(outs)
    want = np.stack([np.asarray(i1), np.asarray(q1)], -1)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("backend", ["direct", "matmul", "fft"])
def test_demodulator_backends_agree(backend):
    x, _ = _tx_passband(seed=7)
    xj = jnp.asarray(x, jnp.float32)
    base = Demodulator(CF, SR, fir_backend="direct")
    other = Demodulator(CF, SR, fir_backend=backend)
    s0 = base.lock_phase(xj[:LOCK_SAMPLES], base.init_state())
    s1 = other.lock_phase(xj[:LOCK_SAMPLES], other.init_state())
    (i0, q0), _ = base.demodulate(xj[LOCK_SAMPLES:], s0)
    (i1, q1), _ = other.demodulate(xj[LOCK_SAMPLES:], s1)
    np.testing.assert_allclose(np.asarray(i0), np.asarray(i1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=1e-4)

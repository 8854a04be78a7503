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


# ---- fused product detector (ops/pallas_demod.py) ----

class TestFusedDemod:
    def _setup(self):
        import dataclasses

        dem = Demodulator(carrier_hz=2000, sample_rate=10000)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
        st = dem.init_state((2,))
        st = dataclasses.replace(
            st, phase_offset=jnp.asarray([0.5, -0.9], jnp.float32))
        return dem, x, st

    def test_matches_staged(self):
        dem, x, st = self._setup()
        (i_s, q_s), st_s = dem.demodulate(x, st)
        (i_f, q_f), st_f, _ = dem.demodulate_fused(x, st)
        np.testing.assert_allclose(i_f, i_s, atol=1e-5)
        np.testing.assert_allclose(q_f, q_s, atol=1e-5)
        # state interop: identical counter and (recomputed) FIR tails
        assert int(st_f.s_mod_sr) == int(st_s.s_mod_sr)
        np.testing.assert_allclose(st_f.lpi, st_s.lpi, atol=1e-6)

    def test_streaming_matches_one_shot(self):
        dem, x, st0 = self._setup()
        (i_one, q_one), _, _ = dem.demodulate_fused(x, st0)
        st, tail = st0, None
        outs = []
        for s, e in [(0, 1000), (1000, 1700), (1700, 4000)]:
            (ii, _), st, tail = dem.demodulate_fused(x[..., s:e], st, tail)
            outs.append(np.asarray(ii))
        np.testing.assert_array_equal(
            np.concatenate(outs, -1), np.asarray(i_one))

    def test_mixed_staged_fused_stream(self):
        dem, x, st0 = self._setup()
        (i_s, _), _ = dem.demodulate(x, st0)
        (i1, _), st, _ = dem.demodulate_fused(x[..., :2000], st0)
        (i2, _), _ = dem.demodulate(x[..., 2000:], st)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(i1), np.asarray(i2)], -1),
            np.asarray(i_s), atol=1e-5)

    def test_locked_pipeline_parity(self):
        """lock_phase (staged) + fused steady state reproduces the golden
        RX product on a real modulated waveform."""
        from modem_tpu import Modulator, Rates, make_scheme

        rates = Rates(1250, 10000)
        mod = Modulator(make_scheme("qpsk", rates), rates, carrier_hz=2000)
        rng = np.random.default_rng(8)
        bits = jnp.asarray(rng.integers(0, 2, (1, 2 * 400)).astype(np.int32))
        wave, _ = mod.passband(bits, mod.init_state((1,)))
        dem = Demodulator(carrier_hz=2000, sample_rate=10000)
        st = dem.init_state((1,))
        st = dem.lock_phase(wave[..., :64], st)
        (i_s, q_s), _ = dem.demodulate(wave[..., 64:], st)
        (i_f, q_f), _, _ = dem.demodulate_fused(wave[..., 64:], st)
        np.testing.assert_allclose(i_f, i_s, atol=1e-5)
        np.testing.assert_allclose(q_f, q_s, atol=1e-5)

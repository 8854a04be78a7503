"""Sampling-clock-offset (SFO) timing tracking for single-carrier
streams (sync.varying_delay / sync.sfo_track): the per-sample resampler,
slope recovery, and the end-to-end burst-receiver rescue."""

import numpy as np

import jax
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import apply_gain_phase, farrow_delay
from modem_tpu.sync import AcquiringReceiver, sfo_track, varying_delay

RATES = Rates(1250, 10000)
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def _resample(x: np.ndarray, ppm: float) -> np.ndarray:
    """Simulate a slow RX clock: rx[n] = x(n / (1 + ppm*1e-6))."""
    n = x.shape[-1]
    t = np.arange(n) / (1.0 + ppm * 1e-6)
    return np.stack([np.interp(t, np.arange(n), row)
                     for row in x.reshape(-1, n)]).reshape(x.shape
                                                           ).astype(np.float32)


class TestVaryingDelay:
    def test_constant_delay_matches_farrow(self):
        """A constant delay of 1 + mu reproduces farrow_delay exactly
        (same Lagrange basis, same taps)."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 400)).astype(np.float32)
        y = rng.standard_normal((2, 400)).astype(np.float32)
        mu = 0.37
        d = jnp.full((2, 400), 1.0 + mu, jnp.float32)
        yi, yq = varying_delay(jnp.asarray(x), jnp.asarray(y), d, max_int=4)
        fi = farrow_delay(jnp.asarray(x), mu)
        fq = farrow_delay(jnp.asarray(y), mu)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(fi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(yq), np.asarray(fq),
                                   atol=1e-5)

    def test_integer_steps_shift_exactly(self):
        """Integer delays select pure shifts (one-hot path): delay j
        reproduces x[n - j] away from the edge transient."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((300,)).astype(np.float32)
        for j in (0, 3, 7):
            d = jnp.full((300,), float(j), jnp.float32)
            yi, _ = varying_delay(jnp.asarray(x), jnp.asarray(x), d,
                                  max_int=8)
            got = np.asarray(yi)[j + 4:]
            want = x[4:300 - j]
            np.testing.assert_allclose(got, want, atol=1e-5)


class TestSfoTrack:
    def _burst(self, n_payload, seed=2):
        chain = qpsk_reference_chain(RATES)
        # long payloads need the decision-directed phase tracker: the
        # one-shot preamble CFO estimate's small bias accumulates over
        # thousands of symbols (documented in sync.dd_phase_track)
        rxr = AcquiringReceiver(chain, PRE, max_lag=160, track_block=32,
                                track_order=2)
        rng = np.random.default_rng(seed)
        bits = jnp.asarray(
            rng.integers(0, 2, (2, n_payload * 2)), jnp.int32)
        i, q = rxr.tx_burst(bits)
        return rxr, bits, np.asarray(i), np.asarray(q)

    def test_slope_recovery(self):
        rxr, bits, i, q = self._burst(4096)
        ppm = 300.0
        ri = jnp.asarray(_resample(i, ppm))
        rq = jnp.asarray(_resample(q, ppm))
        _, _, rep = sfo_track(ri, rq, sps=8, block_len=4096,
                              max_delay=32)
        got = np.asarray(rep["sfo_ppm"])
        assert np.all(np.abs(got - ppm) < 0.15 * ppm), got

    def test_burst_receiver_rescued(self):
        """300 ppm SFO over a 4096-symbol payload walks the decision
        grid ~10 samples: the one-shot receiver fails outright; after
        sfo_track the same receiver recovers every payload bit."""
        rxr, bits, i, q = self._burst(4096)
        ppm = 300.0
        ri = jnp.asarray(_resample(i, ppm))
        rq = jnp.asarray(_resample(q, ppm))
        ri, rq = apply_gain_phase(ri, rq, gain=0.8, phase=0.4)
        ri, rq = awgn(jax.random.key(3), ri, rq, 30.0)
        direct = rxr.rx(ri, rq, 4096)
        direct_errs = int(jnp.sum(direct != bits))
        assert direct_errs > 100, direct_errs
        ci, cq, rep = sfo_track(ri, rq, sps=8, block_len=4096,
                                max_delay=32)
        out = rxr.rx(ci, cq, 4096)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_piecewise_fit(self):
        """The piecewise fit handles the same linear drift (it must be
        at least as general as the linear fit)."""
        rxr, bits, i, q = self._burst(2048, seed=4)
        ri = jnp.asarray(_resample(i, 250.0))
        rq = jnp.asarray(_resample(q, 250.0))
        ci, cq, _ = sfo_track(ri, rq, sps=8, block_len=2048,
                              max_delay=24, fit="piecewise")
        out = rxr.rx(ci, cq, 2048)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_validation(self):
        import pytest
        x = jnp.zeros((2, 8192), jnp.float32)
        with pytest.raises(ValueError):
            sfo_track(x, x, sps=8, block_len=100)   # not multiple of sps
        with pytest.raises(ValueError):
            sfo_track(x, x, sps=8, block_len=8192)  # one block only

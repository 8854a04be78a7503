"""Feedforward acquisition: timing/CFO/phase/frame estimators and the
composed AcquiringReceiver (modem_tpu/sync.py, ops/impairments.py).

The reference's only acquisition is a 64-sample PLL against a clean preamble
tone (`demodulator.rs:32-36`); these tests cover the production surface it
lacks: unknown delay (integer + fractional), CFO, phase, gain — each
estimator alone against known truth, then the full burst receiver
recovering exact payload bits under all impairments at once.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import (
    apply_cfo, apply_gain_phase, apply_static_delay, farrow_delay,
    multipath_fir, sinc_delay_taps,
)
from modem_tpu.sync import (
    AcquiringReceiver, correct_timing, frame_sync, mth_power_cfo,
    oerder_meyr_timing, preamble_cfo_phase_gain, viterbi_viterbi_phase,
)

RATES = Rates(baud_rate=1250, sample_rate=10000)  # sps = 8
SPS = RATES.samples_per_symbol
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def _burst(n_payload=256, channels=2, seed=0):
    chain = qpsk_reference_chain(RATES)
    rxr = AcquiringReceiver(chain, PRE, max_lag=160)
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(
        rng.integers(0, 2, (channels, n_payload * 2)), jnp.int32)
    i, q = rxr.tx_burst(bits)
    return chain, rxr, bits, i, q


def _circ_err(a, b, period):
    d = (a - b) % period
    return min(d, period - d)


class TestImpairments:
    def test_sinc_delay_is_pure_delay_on_bandlimited_input(self):
        # A bandlimited tone delayed by 31 + mu samples.
        mu = 0.37
        n = np.arange(512, dtype=np.float32)
        f = 0.11  # cycles/sample, well inside the sinc filter's passband
        x = jnp.asarray(np.cos(2 * np.pi * f * n))
        y, _ = apply_static_delay(x, x, mu)
        expect = np.cos(2 * np.pi * f * (n - 31 - mu))
        np.testing.assert_allclose(
            np.asarray(y)[64:448], expect[64:448], atol=2e-3)

    def test_farrow_matches_sinc_delay(self):
        # farrow_delay(x, mu) ~= x(n - 1 - mu) on a bandlimited signal.
        mu = 0.62
        n = np.arange(512, dtype=np.float32)
        x = jnp.asarray(np.cos(2 * np.pi * 0.05 * n))
        y = farrow_delay(x, jnp.float32(mu))
        expect = np.cos(2 * np.pi * 0.05 * (n - 1 - mu))
        np.testing.assert_allclose(np.asarray(y)[8:500], expect[8:500],
                                   atol=5e-3)

    def test_cfo_then_inverse_is_identity(self):
        rng = np.random.default_rng(3)
        i = jnp.asarray(rng.normal(size=(2, 256)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(2, 256)), jnp.float32)
        fi, fq = apply_cfo(i, q, 37.0, 10000, phase0=0.9)
        bi, bq = apply_cfo(fi, fq, -37.0, 10000, phase0=-0.9)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(i), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bq), np.asarray(q), atol=1e-5)

    def test_multipath_single_tap_is_gain_phase(self):
        rng = np.random.default_rng(4)
        i = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
        g, ph = 0.8, 0.6
        hi = np.array([g * math.cos(ph)], np.float32)
        hq = np.array([g * math.sin(ph)], np.float32)
        mi, mq = multipath_fir(i, q, hi, hq)
        gi, gq = apply_gain_phase(i, q, g, ph)
        np.testing.assert_allclose(np.asarray(mi), np.asarray(gi), atol=1e-5)
        np.testing.assert_allclose(np.asarray(mq), np.asarray(gq), atol=1e-5)


class TestEstimators:
    def test_oerder_meyr_finds_fractional_timing(self):
        _, _, _, i, q = _burst()
        mu = 0.3
        di, dq = apply_static_delay(i, q, mu)
        t0 = oerder_meyr_timing(di, dq, SPS)
        # TX decision instants sit on the symbol grid (n % sps == 0); the
        # sinc filter delays by 31 + mu -> expected offset (31 + mu) % sps.
        want = (31 + mu) % SPS
        for v in np.asarray(t0).ravel():
            assert _circ_err(float(v), want, SPS) < 0.05

    def test_oerder_meyr_is_cfo_invariant(self):
        _, _, _, i, q = _burst()
        fi, fq = apply_cfo(i, q, 50.0, RATES.sample_rate, phase0=1.0)
        t0 = oerder_meyr_timing(i, q, SPS)
        t1 = oerder_meyr_timing(fi, fq, SPS)
        for a, b in zip(np.asarray(t0).ravel(), np.asarray(t1).ravel()):
            assert _circ_err(float(a), float(b), SPS) < 0.02

    def test_mth_power_cfo_on_synthetic_qpsk(self):
        rng = np.random.default_rng(7)
        k = rng.integers(0, 4, 512)
        cfo = 0.013  # rad/symbol
        ang = 2 * np.pi * k / 4 + cfo * np.arange(512) + 0.4
        di = jnp.asarray(np.cos(ang), jnp.float32)
        dq = jnp.asarray(np.sin(ang), jnp.float32)
        est = float(mth_power_cfo(di, dq, 4))
        assert abs(est - cfo) < 1e-3

    def test_viterbi_viterbi_phase_on_synthetic_qpsk(self):
        rng = np.random.default_rng(8)
        k = rng.integers(0, 4, 512)
        phase = 0.21  # < pi/4: inside the M-fold ambiguity cell
        ang = 2 * np.pi * k / 4 + phase
        di = jnp.asarray(np.cos(ang), jnp.float32)
        dq = jnp.asarray(np.sin(ang), jnp.float32)
        est = float(viterbi_viterbi_phase(di, dq, 4))
        assert abs(est - phase) < 1e-3

    def test_preamble_cfo_phase_gain(self):
        pre_iq = np.stack(
            [np.cos(2 * np.pi * PRE / 4 + np.pi / 4),
             np.sin(2 * np.pi * PRE / 4 + np.pi / 4)], axis=-1
        ).astype(np.float32)
        cfo, phase, gain = 0.02, 0.7, 0.85
        k = np.arange(len(PRE))
        ang = 2 * np.pi * PRE / 4 + np.pi / 4 + cfo * k + phase
        di = jnp.asarray(gain * np.cos(ang), jnp.float32)
        dq = jnp.asarray(gain * np.sin(ang), jnp.float32)
        ec, ep, eg = preamble_cfo_phase_gain(di, dq, pre_iq)
        assert abs(float(ec) - cfo) < 1e-4
        assert abs(float(ep) - phase) < 1e-3
        assert abs(float(eg) - gain) < 1e-3


class TestAcquiringReceiver:
    def test_clean_burst_with_integer_delay(self):
        chain, rxr, bits, i, q = _burst()
        z = jnp.zeros((i.shape[0], 13), i.dtype)
        i = jnp.concatenate([z, i], axis=-1)
        q = jnp.concatenate([z, q], axis=-1)
        out = rxr.rx(i, q, 256)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_full_impairment_stack_recovers_exact_bits(self):
        chain, rxr, bits, i, q = _burst()
        mu = 0.37
        i, q = apply_static_delay(i, q, mu)  # +31.37 samples
        i, q = apply_cfo(i, q, 8.0, RATES.sample_rate, phase0=1.1)
        i, q = apply_gain_phase(i, q, gain=0.8)
        i, q = awgn(jax.random.key(0), i, q, snr_db=30.0)
        (ri, rq), rep = rxr.acquire(i, q, 256)
        out = rxr.rx(i, q, 256)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        # Estimator sanity against the imposed truth:
        want_cfo = 2 * np.pi * 8.0 * SPS / RATES.sample_rate  # rad/symbol
        for v in np.asarray(rep["cfo_rad_per_symbol"]).ravel():
            assert abs(float(v) - want_cfo) < 0.1 * want_cfo + 2e-3
        for v in np.asarray(rep["gain"]).ravel():
            assert abs(float(v) - 0.8) < 0.05
        for v in np.asarray(rep["timing"]).ravel():
            assert _circ_err(float(v), (31 + mu) % SPS, SPS) < 0.1

    def test_acquisition_is_jittable(self):
        chain, _, bits, i, q = _burst(n_payload=64)
        rxr = AcquiringReceiver(chain, PRE, max_lag=160, eq_taps=5,
                                track_block=16)
        fn = jax.jit(lambda a, b: rxr.rx(a, b, 64))
        out = fn(i, q)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_mild_multipath(self):
        # A -20 dB echo 3 samples out: slicer margin absorbs it after
        # acquisition (gain/phase estimated on the same channel).
        chain, rxr, bits, i, q = _burst()
        hi = np.array([1.0, 0, 0, 0.1], np.float32)
        hq = np.array([0.0, 0, 0, 0.05], np.float32)
        i, q = multipath_fir(i, q, hi, hq)
        out = rxr.rx(i, q, 256)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


@pytest.mark.parametrize("mu", [0.0, 0.25, 0.75])
def test_correct_timing_lands_on_grid(mu):
    _, _, _, i, q = _burst(n_payload=128, channels=1)
    di, dq = apply_static_delay(i, q, mu)
    t0 = oerder_meyr_timing(di, dq, SPS)
    ci, cq = correct_timing(di, dq, t0)
    t1 = oerder_meyr_timing(ci, cq, SPS)
    # After correction the residual fractional offset is ~0 (mod 1).
    frac = float(np.asarray(t1).ravel()[0]) % 1.0
    assert min(frac, 1.0 - frac) < 0.05


class TestEqualizer:
    # 3-ray channel: echoes at fractional symbol delays (samples 4 and 12 at
    # sps=8) — ISI at the decision points that the matched filter cannot
    # remove (integer-symbol echoes land on raised-cosine nulls; these don't).
    HI = np.array([1, 0, 0, 0, 0.3, 0, 0, 0, 0, 0, 0, 0, 0.45], np.float32)
    HQ = np.array([0, 0, 0, 0, -0.2, 0, 0, 0, 0, 0, 0, 0, 0.25], np.float32)

    def test_train_and_apply_inverts_known_isi(self):
        from modem_tpu.ops.equalizer import apply_equalizer, train_lmmse

        rng = np.random.default_rng(11)
        k = rng.integers(0, 4, 256)
        a = np.stack([np.cos(2 * np.pi * k / 4 + np.pi / 4),
                      np.sin(2 * np.pi * k / 4 + np.pi / 4)], -1)
        # Symbol-rate channel: d_k = a_k + (0.3+0.15j) * a_{k-1}
        di = jnp.asarray(a[:, 0] + 0.3 * np.roll(a[:, 0], 1)
                         - 0.15 * np.roll(a[:, 1], 1), jnp.float32)
        dq = jnp.asarray(a[:, 1] + 0.3 * np.roll(a[:, 1], 1)
                         + 0.15 * np.roll(a[:, 0], 1), jnp.float32)
        wr, wi = train_lmmse(di, dq, a.astype(np.float32), 7, ridge=1e-4)
        yi, yq = apply_equalizer(di, dq, wr, wi)
        err = np.max(np.abs(np.asarray(yi)[4:250] - a[4:250, 0]))
        assert err < 0.05

    def _impaired(self, rxr, seed=5):
        rng = np.random.default_rng(seed)
        bits = jnp.asarray(rng.integers(0, 2, (2, 512)), jnp.int32)
        i, q = rxr.tx_burst(bits)
        i, q = multipath_fir(i, q, self.HI, self.HQ)
        i, q = awgn(jax.random.key(2), i, q, snr_db=35.0)
        return bits, i, q

    def test_strong_multipath_defeats_tracking_alone(self):
        # ISI biases the preamble carrier estimate AND corrupts decisions:
        # both the plain receiver and phase-tracking-only fail here.
        chain = qpsk_reference_chain(RATES)
        plain = AcquiringReceiver(chain, PRE, max_lag=160)
        tracked = AcquiringReceiver(chain, PRE, max_lag=160, track_block=16)
        bits, i, q = self._impaired(plain)
        assert int(jnp.sum(plain.rx(i, q, 256) != bits)) > 0
        assert int(jnp.sum(tracked.rx(i, q, 256) != bits)) > 0

    def test_equalized_receiver_recovers_exact_bits(self):
        # ... and the preamble-trained LMMSE equalizer + decision-directed
        # phase tracking recovers every bit.
        chain = qpsk_reference_chain(RATES)
        rxr = AcquiringReceiver(chain, PRE, max_lag=160, eq_taps=7,
                                track_block=16)
        bits, i, q = self._impaired(rxr)
        out = rxr.rx(i, q, 256)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_tracking_fixes_residual_cfo_drift(self):
        # A milder fractional-delay echo: the spurious CFO the ISI induces in
        # the preamble estimate accumulates over 256 payload symbols and
        # breaks the untracked receiver; block DD tracking recovers exactly.
        hi = np.zeros(13, np.float32)
        hq = np.zeros(13, np.float32)
        hi[0], hi[12], hq[12] = 1.0, 0.35, 0.175
        chain = qpsk_reference_chain(RATES)
        plain = AcquiringReceiver(chain, PRE, max_lag=160)
        tracked = AcquiringReceiver(chain, PRE, max_lag=160, track_block=16)
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, (2, 512)), jnp.int32)
        i, q = plain.tx_burst(bits)
        i, q = multipath_fir(i, q, hi, hq)
        i, q = apply_static_delay(i, q, 0.2)
        i, q = apply_cfo(i, q, 5.0, RATES.sample_rate, phase0=0.5)
        i, q = awgn(jax.random.key(2), i, q, snr_db=32.0)
        assert int(jnp.sum(plain.rx(i, q, 256) != bits)) > 0
        out = tracked.rx(i, q, 256)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_sharded_acquisition_matches_single_device():
    from modem_tpu.parallel import make_modem_mesh, sharded_acquire_fn

    chain = qpsk_reference_chain(RATES)
    rxr = AcquiringReceiver(chain, PRE, max_lag=128, eq_taps=5,
                            track_block=16)
    rng = np.random.default_rng(21)
    bits = jnp.asarray(rng.integers(0, 2, (8, 128)), jnp.int32)
    i, q = rxr.tx_burst(bits)
    i, q = apply_static_delay(i, q, 0.4)
    i, q = apply_cfo(i, q, 6.0, RATES.sample_rate, phase0=0.3)
    i, q = awgn(jax.random.key(4), i, q, snr_db=30.0)
    want = rxr.rx(i, q, 64)
    mesh = make_modem_mesh(ch=8, time=1)
    got = sharded_acquire_fn(rxr, mesh, 64)(i, q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(bits))


class TestDopplerMultipath:
    """Time-varying (Doppler-beating) multipath model
    (ops/impairments.doppler_multipath)."""

    H_I = np.array([0.9, 0.0, 0.3], np.float32)
    H_Q = np.array([0.0, 0.2, -0.1], np.float32)

    def test_zero_doppler_degenerates_to_static_fir(self):
        rng = np.random.default_rng(0)
        i = jnp.asarray(rng.normal(size=(2, 500)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(2, 500)), jnp.float32)
        from modem_tpu.ops.impairments import doppler_multipath
        yi, yq = doppler_multipath(i, q, self.H_I, self.H_Q,
                                   np.zeros(3), 10000)
        ri, rq = multipath_fir(i, q, self.H_I, self.H_Q)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(ri),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(yq), np.asarray(rq),
                                   atol=1e-5)

    def test_single_tap_equals_cfo_rotation(self):
        rng = np.random.default_rng(1)
        i = jnp.asarray(rng.normal(size=(300,)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(300,)), jnp.float32)
        from modem_tpu.ops.impairments import doppler_multipath
        yi, yq = doppler_multipath(i, q, np.ones(1), np.zeros(1),
                                   np.array([37.0]), 10000)
        ri, rq = apply_cfo(i, q, 37.0, 10000)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(ri),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(yq), np.asarray(rq),
                                   atol=1e-5)

    def test_streaming_n0_continuity(self):
        rng = np.random.default_rng(2)
        i = jnp.asarray(rng.normal(size=(800,)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(800,)), jnp.float32)
        from modem_tpu.ops.impairments import doppler_multipath
        fd = np.array([11.0, -7.0, 23.0])
        yi, yq = doppler_multipath(i, q, self.H_I, self.H_Q, fd, 10000)
        # chunked: the delay-line history is short (L-1=2), so feed a
        # little overlap and compare the interior
        y2i, y2q = doppler_multipath(i[..., 400 - 8:], q[..., 400 - 8:],
                                     self.H_I, self.H_Q, fd, 10000,
                                     n0=392)
        np.testing.assert_allclose(np.asarray(y2i[..., 8:]),
                                   np.asarray(yi[..., 400:]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(y2q[..., 8:]),
                                   np.asarray(yq[..., 400:]), atol=1e-4)

    def test_ofdm_rides_a_slowly_beating_channel(self):
        """Per-frame LS estimation + pilot CPE absorb a two-path channel
        whose taps beat at different Doppler shifts, as long as the
        shape drift within one frame is small — exact decisions."""
        from modem_tpu import OfdmModem, make_scheme
        from modem_tpu.ops.impairments import doppler_multipath

        m = OfdmModem(make_scheme("qpsk", RATES))
        rng = np.random.default_rng(3)
        bits = jnp.asarray(
            rng.integers(0, 2, (2, m.bits_per_frame(12))), jnp.int32)
        i, q = m.tx_frame(bits)
        yi, yq = doppler_multipath(
            i, q, np.array([0.9, 0.0, 0.3], np.float32),
            np.array([0.0, 0.2, -0.1], np.float32),
            np.array([2e-5, -1.5e-5, 2.5e-5]), 1)
        out = m.rx_frame(yi, yq, 12)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

"""AGC (ops/agc.py) and the second-order carrier loop (sync.dd_carrier_track).

The AGC must converge to the target level from a cold start and after a
mid-stream gain step, with chunked streaming bit-identical to one-shot.
The second-order loop must remove the steady-state phase lag the
first-order tracker keeps under residual CFO, and its frequency state must
estimate the true slope.
"""

import numpy as np

import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.ops.agc import Agc, normalize_rms
from modem_tpu.ops.impairments import apply_cfo
from modem_tpu.sync import AcquiringReceiver, dd_carrier_track, dd_phase_track

RATES = Rates(baud_rate=1250, sample_rate=10000)
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def _tone(n, scale, seed=0):
    rng = np.random.default_rng(seed)
    i = scale * rng.normal(size=n).astype(np.float32)
    q = scale * rng.normal(size=n).astype(np.float32)
    return jnp.asarray(i), jnp.asarray(q)


class TestAgc:
    def test_feedforward_normalize(self):
        i, q = _tone(4096, 3.7)
        yi, yq = normalize_rms(i, q, target_rms=1.0)
        rms = float(jnp.sqrt(jnp.mean(yi**2 + yq**2)))
        assert abs(rms - 1.0) < 1e-5

    def test_converges_from_cold_start(self):
        agc = Agc(target_rms=1.0, loop_gain=0.25, sub_block=64)
        i, q = _tone(64 * 60, 0.1)  # 20 dB low
        (yi, yq), state = agc.process(i, q, agc.init_state())
        tail_i, tail_q = yi[-1024:], yq[-1024:]
        rms = float(jnp.sqrt(jnp.mean(tail_i**2 + tail_q**2)))
        assert abs(rms - 1.0) < 0.05
        # log-gain ~ log(1 / (0.1*sqrt(2))): target is complex-magnitude RMS
        assert abs(float(state) - np.log(1.0 / (0.1 * np.sqrt(2)))) < 0.05

    def test_reconverges_after_gain_step(self):
        agc = Agc(loop_gain=0.3, sub_block=64)
        i, q = _tone(64 * 40, 1.0)
        (yi, yq), st = agc.process(i, q, agc.init_state())
        i2, q2 = _tone(64 * 40, 8.0, seed=1)  # +18 dB step
        (yi2, yq2), st2 = agc.process(i2, q2, st)
        rms = float(jnp.sqrt(jnp.mean(yi2[-512:] ** 2 + yq2[-512:] ** 2)))
        assert abs(rms - 1.0) < 0.05

    def test_chunked_equals_oneshot(self):
        agc = Agc(loop_gain=0.2, sub_block=32)
        i, q = _tone(32 * 24, 0.5)
        (one_i, one_q), _ = agc.process(i, q, agc.init_state())
        st = agc.init_state()
        outs = []
        for a in range(0, i.shape[-1], 32 * 6):
            (ci, cq), st = agc.process(i[a:a + 192], q[a:a + 192], st)
            outs.append((ci, cq))
        got_i = jnp.concatenate([o[0] for o in outs], -1)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(one_i))

    def test_independent_channels(self):
        agc = Agc(loop_gain=0.3, sub_block=64)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 64 * 50)).astype(np.float32)
        x[0] *= 0.2
        x[1] *= 5.0
        i = jnp.asarray(x)
        (yi, yq), st = agc.process(i, i, agc.init_state((2,)))
        for ch in range(2):
            rms = float(jnp.sqrt(jnp.mean(yi[ch, -512:] ** 2
                                          + yq[ch, -512:] ** 2)))
            assert abs(rms - 1.0) < 0.06
        assert float(st[0]) > 0 > float(st[1])


class TestCarrierTrack:
    def _ramped_points(self, slope, n=1024, seed=3, noise=0.02):
        chain = qpsk_reference_chain(RATES)
        lut = np.asarray(chain.lut)
        rng = np.random.default_rng(seed)
        syms = rng.integers(0, 4, n)
        pts = lut[syms]  # [n, 2]
        th = slope * np.arange(n)
        c, s = np.cos(th), np.sin(th)
        i = pts[:, 0] * c - pts[:, 1] * s + noise * rng.normal(size=n)
        q = pts[:, 0] * s + pts[:, 1] * c + noise * rng.normal(size=n)
        return (chain, syms, jnp.asarray(i.astype(np.float32)),
                jnp.asarray(q.astype(np.float32)), th)

    def test_second_order_removes_cfo_lag(self):
        # dd_phase_track corrects each block by its own measured mean error,
        # so the first-order residual under CFO is the *within-block ramp*
        # (rms ~ slope*block/sqrt(12) per symbol); the second-order loop
        # derotates with the per-symbol slope and removes it.
        slope = 0.01  # rad/symbol residual CFO
        chain, syms, i, q, th = self._ramped_points(slope, noise=0.01)
        lut = np.asarray(chain.lut)
        ref = lut[syms]

        def tail_rms_angle(yi, yq):
            ri = np.asarray(yi)[-256:]
            rq = np.asarray(yq)[-256:]
            a = ref[-256:]
            er = ri * a[:, 0] + rq * a[:, 1]
            ei = rq * a[:, 0] - ri * a[:, 1]
            return float(np.sqrt(np.mean(np.arctan2(ei, er) ** 2)))

        yi1, yq1, _ = dd_phase_track(i, q, lut, block=16)
        yi2, yq2, rep = dd_carrier_track(i, q, lut, block=16)
        e1 = tail_rms_angle(yi1, yq1)
        e2 = tail_rms_angle(yi2, yq2)
        assert e1 > 0.03  # ~ 0.01*16/sqrt(12) = 0.046 expected
        assert e2 < e1 / 2
        f = float(np.asarray(rep["freq"])[-1])
        assert abs(f - slope) < slope * 0.1

    def test_acquiring_receiver_second_order_under_cfo(self):
        chain = qpsk_reference_chain(RATES)
        rxr2 = AcquiringReceiver(chain, PRE, max_lag=160, track_block=16,
                                 track_order=2)
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (2, 512 * 2)), jnp.int32)
        i, q = rxr2.tx_burst(bits)
        # CFO small enough for frame sync, big enough that the one-shot
        # preamble estimate leaves a noticeable residual over 512 symbols.
        i, q = apply_cfo(i, q, 6.0, RATES.sample_rate, phase0=0.7)
        out = rxr2.rx(i, q, 512)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        (_, _), rep = rxr2.acquire(i, q, 512)
        assert "tracked_freq" in rep

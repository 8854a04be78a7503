"""Polyphase channelizer (ops/channelizer.py): tone selectivity and the
full wideband story — M modulated bursts synthesized into one wideband
stream, channelized back, and blindly acquired per channel with exact bits.
"""

import numpy as np

import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.ops.channelizer import Channelizer
from modem_tpu.sync import AcquiringReceiver

RATES = Rates(baud_rate=1250, sample_rate=10000)
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def _tone(freq, n):
    t = np.arange(n)
    return (jnp.asarray(np.cos(2 * np.pi * freq * t), jnp.float32),
            jnp.asarray(np.sin(2 * np.pi * freq * t), jnp.float32))


class TestAnalysis:
    def test_tone_lands_in_its_channel(self):
        m = 8
        ch = Channelizer(m)
        for m0 in (0, 1, 3, 5, 7):
            i, q = _tone(m0 / m, m * 512)
            yi, yq = ch.analyze(i, q)
            p = np.asarray(jnp.mean(yi**2 + yq**2, axis=-1))
            # steady state only (skip the filter ramp-up)
            p = np.asarray(jnp.mean(
                yi[..., 64:] ** 2 + yq[..., 64:] ** 2, axis=-1))
            target = p[m0]
            others = np.delete(p, m0)
            assert target > 1.0  # gain ~ M^2 on power, just needs presence
            assert others.max() < target * 1e-4  # >= 40 dB suppression

    def test_offset_tone_appears_at_channel_rate_offset(self):
        m = 8
        delta = 0.03  # of the channel rate
        ch = Channelizer(m)
        i, q = _tone((2 + delta) / m, m * 512)
        yi, yq = ch.analyze(i, q)
        zi = np.asarray(yi[2, 64:])
        zq = np.asarray(yq[2, 64:])
        dphi = np.angle(
            (zi[1:] + 1j * zq[1:]) * (zi[:-1] - 1j * zq[:-1])).mean()
        assert abs(dphi - 2 * np.pi * delta) < 1e-3


class TestWidebandRoundtrip:
    def test_m_bursts_through_one_wideband_stream(self):
        # The production story: M independent QPSK bursts -> synthesis bank
        # -> ONE wideband stream at M x rate -> analysis bank -> blind
        # burst acquisition per channel -> exact bits everywhere. The
        # acquiring receiver absorbs the banks' group delay and gain, so no
        # delay/scale bookkeeping is needed (that is its job).
        m = 8
        n_payload = 128
        chain = qpsk_reference_chain(RATES)
        rxr = AcquiringReceiver(chain, PRE, max_lag=200)
        rng = np.random.default_rng(0)
        bits = jnp.asarray(
            rng.integers(0, 2, (m, n_payload * 2)), jnp.int32)
        ci, cq = rxr.tx_burst(bits)          # [m, n_ch] channel-rate bursts
        # listen window: pad so every channel's burst (+ bank delay) fits
        pad = jnp.zeros((m, 256), ci.dtype)
        ci = jnp.concatenate([ci, pad], axis=-1)
        cq = jnp.concatenate([cq, pad], axis=-1)

        bank = Channelizer(m)
        wi, wq = bank.synthesize(ci, cq)     # [m * n_ch] wideband
        assert wi.shape[-1] == m * ci.shape[-1]
        yi, yq = bank.analyze(wi, wq)        # back to [m, n_ch]
        out = rxr.rx(yi, yq, n_payload)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_bf16_dft_exact_decisions(self):
        # bf16 DFT (6x MXU rate): ~40 dB quantization floor is ample for
        # hard decisions — the full wideband story still recovers exact
        # bits, and the waveform stays within bf16 tolerance of f32
        m = 8
        n_payload = 128
        chain = qpsk_reference_chain(RATES)
        rxr = AcquiringReceiver(chain, PRE, max_lag=200)
        rng = np.random.default_rng(5)
        bits = jnp.asarray(
            rng.integers(0, 2, (m, n_payload * 2)), jnp.int32)
        ci, cq = rxr.tx_burst(bits)
        pad = jnp.zeros((m, 256), ci.dtype)
        ci = jnp.concatenate([ci, pad], axis=-1)
        cq = jnp.concatenate([cq, pad], axis=-1)
        bank16 = Channelizer(m, dft_dtype=jnp.bfloat16)
        bank32 = Channelizer(m)
        wi, wq = bank16.synthesize(ci, cq)
        wi32, _ = bank32.synthesize(ci, cq)
        assert wi.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(wi), np.asarray(wi32),
                                   atol=0.1)
        yi, yq = bank16.analyze(wi, wq)
        out = rxr.rx(yi, yq, n_payload)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_streaming_matches_oneshot_bitexact(self):
        # chunked == one-shot through BOTH banks, including chunks shorter
        # than the per-phase filter history (K_chunk < J-1)
        m = 8
        bank = Channelizer(m, taps_per_phase=6)
        rng = np.random.default_rng(2)
        n_k = 48
        ci = jnp.asarray(rng.normal(size=(m, n_k)).astype(np.float32))
        cq = jnp.asarray(rng.normal(size=(m, n_k)).astype(np.float32))
        wi1, wq1 = bank.synthesize(ci, cq)
        st = bank.init_synthesize_state()
        outs = []
        for k0, k1 in ((0, 3), (3, 7), (7, 48)):  # 3 rows < J-1 = 5
            o_i, o_q, st = bank.synthesize_stream(
                ci[:, k0:k1], cq[:, k0:k1], st)
            outs.append((o_i, o_q))
        wi2 = jnp.concatenate([o[0] for o in outs], axis=-1)
        wq2 = jnp.concatenate([o[1] for o in outs], axis=-1)
        np.testing.assert_array_equal(np.asarray(wi1), np.asarray(wi2))
        np.testing.assert_array_equal(np.asarray(wq1), np.asarray(wq2))

        yi1, yq1 = bank.analyze(wi1, wq1)
        st = bank.init_analyze_state()
        outs = []
        for s0, s1 in ((0, m * 2), (m * 2, m * 5), (m * 5, m * n_k)):
            o_i, o_q, st = bank.analyze_stream(wi1[s0:s1], wq1[s0:s1], st)
            outs.append((o_i, o_q))
        yi2 = jnp.concatenate([o[0] for o in outs], axis=-1)
        yq2 = jnp.concatenate([o[1] for o in outs], axis=-1)
        np.testing.assert_array_equal(np.asarray(yi1), np.asarray(yi2))
        np.testing.assert_array_equal(np.asarray(yq1), np.asarray(yq2))

    def test_batched_banks(self):
        # leading batch dims flow through both directions
        m = 4
        bank = Channelizer(m)
        rng = np.random.default_rng(1)
        ci = jnp.asarray(rng.normal(size=(2, m, 256)).astype(np.float32))
        cq = jnp.asarray(rng.normal(size=(2, m, 256)).astype(np.float32))
        wi, wq = bank.synthesize(ci, cq)
        assert wi.shape == (2, m * 256)
        yi, yq = bank.analyze(wi, wq)
        assert yi.shape == (2, m, 256)

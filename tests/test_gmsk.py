"""GMSK chain (modem_tpu/gmsk.py): integer-backbone phase, streaming,
discriminator RX, spectral compactness vs MSK."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.gmsk import GmskChain, gmsk_pulse
from modem_tpu.ops.channel import awgn

RATES = Rates(baud_rate=1250, sample_rate=10000)  # sps = 8
SPS = RATES.samples_per_symbol


def _bits(k=256, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2, (channels, k)), jnp.int32)


class TestPulse:
    def test_quarter_turn_per_symbol(self):
        g, g_tr, d = gmsk_pulse(0.3, SPS, 4)
        assert g.size == 4 * SPS
        np.testing.assert_allclose(g.sum(), SPS, rtol=1e-6)
        # the transient returns to zero at the pulse end (no drift term)
        assert abs(g_tr[-1]) < 1e-5
        assert d == (g.size - SPS) // 2

    def test_msk_limit(self):
        # BT -> large: gauss -> delta, g -> rect, transient -> 0
        g, g_tr, _ = gmsk_pulse(50.0, SPS, 2)
        assert float(np.abs(g_tr).max()) < 1e-3

    def test_constant_envelope_and_phase_rate(self):
        c = GmskChain(RATES, bt=0.3)
        i, q = c.tx(_bits())
        env = np.asarray(i * i + q * q)
        np.testing.assert_allclose(env, 1.0, atol=1e-5)
        # instantaneous frequency never exceeds the MSK rate pi/2/sps
        ii, qq = np.asarray(i), np.asarray(q)
        dphi = np.angle((ii[..., 1:] + 1j * qq[..., 1:])
                        * (ii[..., :-1] - 1j * qq[..., :-1]))
        assert np.abs(dphi).max() <= np.pi / 2 / SPS + 1e-4

    def test_total_phase_is_quarter_turn_sum(self):
        c = GmskChain(RATES, bt=0.3)
        bits = _bits(k=64, channels=1)
        i, q = c.tx(bits)
        phi = np.unwrap(np.angle(np.asarray(i) + 1j * np.asarray(q)))[0]
        a = 2 * np.asarray(bits)[0] - 1
        np.testing.assert_allclose(
            phi[-1] - phi[0], (np.pi / 2) * a.sum(), atol=1e-3)


class TestRoundtrip:
    @pytest.mark.parametrize("bt", [0.25, 0.3, 0.5])
    def test_noiseless_exact(self, bt):
        c = GmskChain(RATES, bt=bt)
        bits = _bits()
        out = c.roundtrip(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_awgn_exact_at_high_snr(self):
        c = GmskChain(RATES, bt=0.3)
        bits = _bits(seed=3)
        i, q = c.tx(bits)
        ni, nq = awgn(jax.random.PRNGKey(1), i, q, 18.0)
        out = c.rx(ni, nq)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_soft_signs_match_hard(self):
        c = GmskChain(RATES, bt=0.3)
        bits = _bits(seed=4)
        i, q = c.tx(bits)
        ni, nq = awgn(jax.random.PRNGKey(2), i, q, 6.0)
        hard = c.rx(ni, nq)
        llr = c.rx_soft(ni, nq, noise_var=0.1)
        np.testing.assert_array_equal(
            np.asarray(llr < 0).astype(np.int32), np.asarray(hard))


class TestCoded:
    def test_viterbi_over_gmsk_llrs(self):
        """Soft GMSK feeds the K=7 code: at an SNR where the raw
        discriminator has a clear error floor, the coded link is exact —
        the discriminator-domain LLR scaling is consistent enough for
        max-log decoding."""
        from modem_tpu.fec import block_deinterleave, block_interleave, \
            ccsds_code

        c = GmskChain(RATES, bt=0.3)
        code = ccsds_code()
        rng = np.random.default_rng(11)
        data = jnp.asarray(rng.integers(0, 2, (8, 250)), jnp.int32)
        tx_bits = block_interleave(code.encode(data), rows=8)
        i, q = c.tx(tx_bits)
        # The discriminator has the classic FM threshold: below ~4 dB
        # per-sample SNR phase clicks dominate and no code helps. 8 dB is
        # above threshold: a clear uncoded floor, coded exact.
        snr = 8.0
        ni, nq = awgn(jax.random.PRNGKey(12), i, q, snr)
        p = float(jnp.mean(i * i + q * q))
        # per-sample rail noise, reduced by the symbol-window averaging
        nv = p / (2.0 * 10.0 ** (snr / 10.0)) / (RATES.samples_per_symbol
                                                 - c.guard)
        llr = c.rx_soft(ni, nq, noise_var=nv)
        hard = c.rx(ni, nq)
        dec = code.decode_soft(block_deinterleave(llr, rows=8))
        assert int(jnp.sum(hard != tx_bits)) > 100  # uncoded floor
        assert int(jnp.sum(dec != data)) == 0


class TestStreaming:
    def test_chunked_equals_one_shot(self):
        c = GmskChain(RATES, bt=0.3)
        bits = _bits(k=192, seed=5)
        st = c.init_state(bits.shape[:-1])
        ref_i, ref_q, ref_st = c.tx_stream(bits, st)
        chunks_i, chunks_q = [], []
        st2 = c.init_state(bits.shape[:-1])
        for lo, hi in [(0, 33), (33, 64), (64, 191), (191, 192)]:
            ci, cq, st2 = c.tx_stream(bits[..., lo:hi], st2)
            chunks_i.append(ci)
            chunks_q.append(cq)
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(x) for x in chunks_i], -1),
            np.asarray(ref_i))
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(x) for x in chunks_q], -1),
            np.asarray(ref_q))
        for k in ("u", "ubuf", "fir"):
            np.testing.assert_array_equal(np.asarray(st2[k]),
                                          np.asarray(ref_st[k]))

    def test_integer_backbone_never_drifts(self):
        """After any number of blocks the backbone is an int32 mod 4*sps —
        the stream-length-independent analog of the PhaseProgram schemes'
        exactness."""
        c = GmskChain(RATES, bt=0.3)
        st = c.init_state((1,))
        for seed in range(5):
            bits = _bits(k=128, channels=1, seed=seed)
            _, _, st = c.tx_stream(bits, st)
        assert st["u"].dtype == jnp.int32
        assert 0 <= int(st["u"][0]) < 4 * SPS


class TestSpectrum:
    def test_tighter_than_msk(self):
        """GMSK BT=0.3's out-of-band power (beyond 0.75/T) must be well
        below MSK's — the entire point of the Gaussian filter."""
        from modem_tpu.chain import MskChain

        rng = np.random.default_rng(7)
        bits = jnp.asarray(rng.integers(0, 2, (1, 2048)), jnp.int32)
        gi, gq = GmskChain(RATES, bt=0.3).tx(bits)
        mi, mq = MskChain(RATES).tx(bits.reshape(1, -1))

        def oob(i, q):
            x = np.asarray(i)[0] + 1j * np.asarray(q)[0]
            spec = np.abs(np.fft.fft(x * np.hanning(x.size))) ** 2
            f = np.fft.fftfreq(x.size)  # cycles/sample; symbol rate = 1/sps
            cut = 0.75 / SPS
            return spec[np.abs(f) > cut].sum() / spec.sum()

        assert oob(gi, gq) < 0.1 * oob(mi, mq)

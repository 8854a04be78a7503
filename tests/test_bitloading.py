"""Adaptive bit loading (modem_tpu/bitloading.py): the gap-rule loader,
mixed-constellation frames, frequency-selective link adaptation, and
SINR-weighted soft outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import AdaptiveOfdm, OfdmModem, bit_loading, make_scheme
from modem_tpu.models.qam import QAM
from modem_tpu.ofdm import _default_grid
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import multipath_fir

N_SYM = 8
N_FFT = 64


def _bits(mm, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2, (channels, mm.bits_per_frame(N_SYM))),
        jnp.int32)


class TestLoader:
    def test_gap_rule_monotone_and_clipped(self):
        snr = np.array([-10.0, 3.0, 9.1, 15.1, 21.2, 30.0, 60.0])
        out = np.asarray(bit_loading(snr, gap_db=6.0))
        assert list(out) == sorted(out)
        assert out[0] == 0                 # hopeless bin off
        assert out[-1] == 8                # clipped at the top level
        # log2(1 + 10^((snr-6)/10)) at 9.1 dB ~ 1.36 -> BPSK
        assert out[2] == 1

    def test_max_bits(self):
        out = bit_loading(np.full(4, 60.0), max_bits=4)
        assert out == (4, 4, 4, 4)


class TestAdaptiveOfdm:
    def test_mixed_loading_noiseless_roundtrip(self):
        data, _ = _default_grid(N_FFT)
        rng = np.random.default_rng(0)
        loading = tuple(rng.choice([0, 1, 2, 4, 6, 8], len(data)))
        mm = AdaptiveOfdm(loading)
        bits = _bits(mm)
        i, q = mm.tx_frame(bits)
        got = mm.rx_frame(i, q, N_SYM)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))

    def test_capacity_counts(self):
        data, _ = _default_grid(N_FFT)
        loading = (4,) * len(data)
        mm = AdaptiveOfdm(loading)
        ref = OfdmModem(make_scheme("qam16",
                                    __import__("modem_tpu").Rates(1250,
                                                                  10000)))
        assert mm.bits_per_frame(N_SYM) == ref.bits_per_frame(N_SYM)

    def test_uniform_loading_matches_fixed_modem_frames(self):
        """All-QPSK loading carries the same payload capacity and decodes
        through the same channel machinery as the fixed modem."""
        data, _ = _default_grid(N_FFT)
        mm = AdaptiveOfdm((2,) * len(data))
        bits = _bits(mm, seed=1)
        i, q = mm.tx_frame(bits)
        hi = np.array([0.8, 0.0, 0.25, -0.1, 0.05], np.float32)
        hq = np.array([0.1, -0.2, 0.0, 0.08, 0.0], np.float32)
        ci, cq = multipath_fir(i, q, hi, hq)
        ci, cq = awgn(jax.random.key(0), ci, cq, 30.0)
        got = mm.rx_frame(ci, cq, N_SYM)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))

    def test_link_adaptation_on_selective_channel(self):
        """The point of the feature: load from measured per-bin SNR, then
        carry the loaded frame error-free where a fixed 64-QAM everywhere
        would fail on the faded bins."""
        data, _ = _default_grid(N_FFT)
        hi = np.array([0.75, 0.0, 0.0, 0.55, 0.0, 0.0, 0.3], np.float32)
        hq = np.array([0.0, 0.3, 0.0, 0.0, -0.35, 0.0, 0.0], np.float32)
        # per-bin SNR from the channel's DFT at 25 dB noise floor
        k = np.asarray(data, np.float64)
        h = np.sum((hi + 1j * hq)
                   * np.exp(-2j * np.pi * np.arange(len(hi)) * k[:, None]
                            / N_FFT), axis=-1)
        snr_db = 25.0 + 20.0 * np.log10(np.abs(h))
        loading = bit_loading(snr_db, gap_db=8.0, max_bits=6)
        assert len(set(loading)) > 1, "channel should force mixed loading"
        mm = AdaptiveOfdm(loading)
        bits = _bits(mm, seed=2)
        i, q = mm.tx_frame(bits)
        ci, cq = multipath_fir(i, q, hi, hq)
        ci, cq = awgn(jax.random.key(1), ci, cq, 25.0)
        got = mm.rx_frame(ci, cq, N_SYM)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))

    def test_soft_llrs_signs_and_weighting(self):
        data, _ = _default_grid(N_FFT)
        rng = np.random.default_rng(3)
        loading = tuple(rng.choice([1, 2, 4], len(data)))
        mm = AdaptiveOfdm(loading)
        bits = _bits(mm, seed=3)
        i, q = mm.tx_frame(bits)
        ci, cq = awgn(jax.random.key(2), i, q, 28.0)
        llr = mm.rx_soft_frame(ci, cq, N_SYM, noise_var=10 ** (-28 / 10))
        hard = (np.asarray(llr) < 0).astype(np.int64)
        np.testing.assert_array_equal(hard, np.asarray(bits))
        assert np.all(np.isfinite(np.asarray(llr)))

    def test_bad_loading_rejected(self):
        data, _ = _default_grid(N_FFT)
        with pytest.raises(ValueError, match="unsupported"):
            AdaptiveOfdm((3,) * len(data))
        with pytest.raises(ValueError, match="every data bin off"):
            AdaptiveOfdm((0,) * len(data))
        with pytest.raises(ValueError, match="entries"):
            AdaptiveOfdm((2,) * (len(data) - 1))

    def test_unit_energy_luts(self):
        from modem_tpu.bitloading import _unit_lut
        for b in (1, 2, 4, 6, 8):
            lut = _unit_lut(b)
            es = float(np.mean(np.sum(lut.astype(np.float64) ** 2, -1)))
            assert abs(es - 1.0) < 1e-6


class TestLinkIntegration:
    def test_framed_link_over_loaded_phy(self):
        """FramedLink (CRC + scrambler + conv + interleaver) over a
        mixed-constellation loaded frame through the selective channel."""
        from modem_tpu.link import FramedLink
        data, _ = _default_grid(N_FFT)
        # 24 bins of 16-QAM + 24 of QPSK -> 144 bits/OFDM symbol
        loading = tuple(4 if i % 2 else 2 for i in range(len(data)))
        mm = AdaptiveOfdm(loading)
        link = FramedLink(mm.as_link_chain(), payload_bits=122)
        rng = np.random.default_rng(7)
        payload = jnp.asarray(rng.integers(0, 2, (3, 122)), jnp.int32)
        i, q = link.tx(payload)
        hi = np.array([0.85, 0.0, 0.2, -0.1], np.float32)
        hq = np.array([0.05, -0.2, 0.0, 0.08], np.float32)
        ci, cq = multipath_fir(i, q, hi, hq)
        ci, cq = awgn(jax.random.key(5), ci, cq, 14.0)
        got, ok = link.rx((ci, cq), noise_var=10 ** (-14 / 10))
        assert bool(np.asarray(ok).all())
        np.testing.assert_array_equal(np.asarray(got), np.asarray(payload))

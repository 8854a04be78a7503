"""bits->bits chains for the remaining scheme families: MSK, OQPSK, pi/4-QPSK.

With these, every one of the 13 reference schemes has an end-to-end
demodulation path (LUT-coherent, differential, FSK-discriminator, MSK
differential-discriminator, offset sampling, or parity-aware slicing).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import DcqpskChain, MskChain, OqpskChain

RATES = Rates(baud_rate=1250, sample_rate=10000)  # sps = 8


def _bits(n, channels=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (n,) if channels is None else (channels, n)
    return jnp.asarray(rng.integers(0, 2, shape), jnp.int32)


@pytest.mark.parametrize("cls", [MskChain, OqpskChain, DcqpskChain])
@pytest.mark.parametrize("channels", [None, 3])
def test_roundtrip_exact(cls, channels):
    chain = cls(RATES)
    bits = _bits(2 * 128, channels, seed=1)
    out = chain.roundtrip(bits)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_msk_various_sps():
    for sps in (4, 8, 16):
        chain = MskChain(Rates(10000 // sps, 10000))
        bits = _bits(2 * 64, seed=2)
        np.testing.assert_array_equal(
            np.asarray(chain.roundtrip(bits)), np.asarray(bits)
        )


def test_msk_rejects_odd_sps():
    with pytest.raises(ValueError):
        MskChain(Rates(2000, 10000))  # sps = 5


def test_msk_guard_bound():
    with pytest.raises(ValueError):
        MskChain(Rates(5000, 10000), guard=1)  # spb = 1, no interior


def test_all_ones_and_zeros():
    """Degenerate streams exercise the differential seeds."""
    for cls in (MskChain, OqpskChain, DcqpskChain):
        chain = cls(RATES)
        for val in (0, 1):
            bits = jnp.full((2 * 32,), val, jnp.int32)
            np.testing.assert_array_equal(
                np.asarray(chain.roundtrip(bits)), np.asarray(bits)
            )


class TestFusedDmpskMsk:
    """Fused Pallas paths for the two remaining first-class schemes
    (`dmpsk.rs`, `msk.rs`): parity with the staged chains and the input."""

    @pytest.mark.parametrize("name", ["dqpsk", "dbpsk"])
    @pytest.mark.parametrize("channels", [None, 3])
    def test_dmpsk_fused_exact(self, name, channels):
        from modem_tpu import make_scheme
        from modem_tpu.chain import DifferentialChain

        scheme = make_scheme(name, RATES)
        chain = DifferentialChain(scheme, RATES)
        bits = _bits(scheme.bits_per_symbol * 300, channels, seed=5)
        fused = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(bits))
        np.testing.assert_array_equal(
            np.asarray(fused), np.asarray(chain.roundtrip(bits))
        )

    def test_dmpsk_fused_multi_tile(self):
        from modem_tpu import make_scheme
        from modem_tpu.chain import DifferentialChain

        chain = DifferentialChain(make_scheme("dqpsk", RATES), RATES)
        bits = _bits(2 * 1100, seed=6)
        np.testing.assert_array_equal(
            np.asarray(chain.roundtrip_fused(bits)), np.asarray(bits)
        )

    def test_dmpsk_fused_noisy_high_snr(self):
        from modem_tpu import make_scheme
        from modem_tpu.chain import DifferentialChain

        chain = DifferentialChain(make_scheme("dqpsk", RATES), RATES)
        bits = _bits(2 * 512, 4, seed=7)
        out = chain.roundtrip_fused(bits, snr_db=25.0, seed=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    @pytest.mark.parametrize("channels", [None, 3])
    def test_msk_fused_exact(self, channels):
        chain = MskChain(RATES)
        bits = _bits(2 * 300, channels, seed=8)
        fused = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(bits))
        np.testing.assert_array_equal(
            np.asarray(fused), np.asarray(chain.roundtrip(bits))
        )

    def test_msk_fused_various_sps(self):
        for sps in (4, 8, 16):
            chain = MskChain(Rates(10000 // sps, 10000))
            bits = _bits(2 * 96, seed=9)
            np.testing.assert_array_equal(
                np.asarray(chain.roundtrip_fused(bits)), np.asarray(bits)
            )

    def test_msk_fused_noisy_high_snr(self):
        chain = MskChain(RATES)
        bits = _bits(2 * 512, 4, seed=10)
        out = chain.roundtrip_fused(bits, snr_db=25.0, seed=2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_msk_fused_degenerate_streams(self):
        chain = MskChain(RATES)
        for val in (0, 1):
            bits = jnp.full((2 * 64,), val, jnp.int32)
            np.testing.assert_array_equal(
                np.asarray(chain.roundtrip_fused(bits)), np.asarray(bits)
            )

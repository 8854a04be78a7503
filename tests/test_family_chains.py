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

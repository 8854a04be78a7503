"""Soft-decision LLRs vs hard decisions and closed forms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import PulseShapedChain, qpsk_reference_chain
from modem_tpu.models.psk import BPSK, QPSK
from modem_tpu.models.qam import QAM
from modem_tpu.ops.llr import llr_hard_bits, lut_llr
from modem_tpu.ops.slicer import lut_slice
from modem_tpu.utils.bits import unpack_symbols

RATES = Rates(baud_rate=1250, sample_rate=10000)


@pytest.mark.parametrize("scheme", [QPSK(0.0, 1.0), QAM(4, 0.0, 6.0),
                                    BPSK(np.pi / 4, 1.0)])
def test_llr_sign_matches_hard_decision(scheme):
    rng = np.random.default_rng(0)
    i = jnp.asarray(rng.normal(size=(3, 200)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(3, 200)), jnp.float32)
    bps = scheme.bits_per_symbol
    llrs = lut_llr(i, q, scheme.lut, bps, noise_var=0.5)
    hard = unpack_symbols(lut_slice(i, q, scheme.lut), bps)
    np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                  np.asarray(hard))


def test_bpsk_llr_closed_form():
    """BPSK on-axis: LLR = 2*A*y_proj / sigma^2 (exact, not just max-log)."""
    scheme = BPSK(0.0, 1.0)  # constellation (+-1, 0)
    y = jnp.asarray([[0.3, -1.2, 0.05]], jnp.float32)
    zeros = jnp.zeros_like(y)
    nv = 0.25
    llrs = lut_llr(y, zeros, scheme.lut, 1, noise_var=nv)
    # d(b=1) - d(b=0) over 2 sigma^2; b=1 -> +1, b=0 -> -1 (lut[0] = -1).
    expect = ((y - 1.0) ** 2 - (y + 1.0) ** 2) / (2 * nv)
    np.testing.assert_allclose(np.asarray(llrs), np.asarray(expect),
                               rtol=1e-5)


def test_chain_rx_soft():
    chain = qpsk_reference_chain(RATES)
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (2, 256)), jnp.int32)
    wave = chain.tx(bits)
    llrs = chain.rx_soft(wave, 128, noise_var=0.5)
    assert llrs.shape == bits.shape
    np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                  np.asarray(bits))
    # noiseless decisions should be confident
    assert float(jnp.min(jnp.abs(llrs))) > 0.1


def test_lut_size_mismatch():
    with pytest.raises(ValueError):
        lut_llr(jnp.zeros(4), jnp.zeros(4), np.zeros((3, 2)), 2)

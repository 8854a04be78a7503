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


class TestFskDmpskLlrs:
    """Soft output for the non-constellation families (VERDICT: the
    reference emits soft I/Q for *every* scheme, so the per-bit soft surface
    must too cover FSK and differential PSK)."""

    def _fsk_chain(self):
        from modem_tpu.chain import FskChain
        from modem_tpu.config import TWO_PI
        from modem_tpu.models.fsk import CPFSK

        scheme = CPFSK(2, RATES, 1.0, 1)
        return FskChain(scheme, RATES, 2 * np.arange(4),
                        TWO_PI * (1 * 1250 // 2) / 10000)

    def test_fsk_llr_sign_matches_hard_noiseless(self):
        chain = self._fsk_chain()
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (2, 2 * 256)), jnp.int32)
        i, q = chain.tx(bits)
        llrs = chain.rx_soft(i, q, noise_var=0.01)
        np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                      np.asarray(chain.rx(i, q)))
        np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                      np.asarray(bits))

    def test_fsk_llr_sign_matches_hard_noisy(self):
        from modem_tpu.ops.channel import awgn

        chain = self._fsk_chain()
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (2, 2 * 256)), jnp.int32)
        i, q = chain.tx(bits)
        ni, nq = awgn(jax.random.key(5), i, q, snr_db=8.0)
        llrs = chain.rx_soft(ni, nq)
        np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                      np.asarray(chain.rx(ni, nq)))

    def test_fsk_llr_coef_count_mismatch(self):
        from modem_tpu.ops.llr import fsk_llr

        with pytest.raises(ValueError):
            fsk_llr(jnp.zeros((4,)), np.arange(3), 0.1, 2)

    def _dmpsk_chain(self, name="dqpsk"):
        from modem_tpu import make_scheme
        from modem_tpu.chain import DifferentialChain

        return DifferentialChain(make_scheme(name, RATES), RATES)

    @pytest.mark.parametrize("name", ["dqpsk", "dbpsk"])
    def test_dmpsk_llr_sign_matches_hard_noiseless(self, name):
        chain = self._dmpsk_chain(name)
        bps = chain.scheme.bits_per_symbol
        rng = np.random.default_rng(6)
        bits = jnp.asarray(rng.integers(0, 2, (2, bps * 200)), jnp.int32)
        wave = chain.tx(bits)
        llrs = chain.rx_soft(wave, 200, noise_var=0.05)
        assert llrs.shape == bits.shape
        np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                      np.asarray(chain.rx(wave, 200)))
        np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                      np.asarray(bits))

    def test_dmpsk_llr_sign_matches_hard_noisy(self):
        from modem_tpu.ops.channel import awgn

        chain = self._dmpsk_chain()
        rng = np.random.default_rng(7)
        bits = jnp.asarray(rng.integers(0, 2, (2, 2 * 200)), jnp.int32)
        si, sq = chain.tx(bits)
        ni, nq = awgn(jax.random.key(8), si, sq, snr_db=12.0)
        hard = chain.rx((ni, nq), 200)
        llrs = chain.rx_soft((ni, nq), 200)
        np.testing.assert_array_equal(np.asarray(llr_hard_bits(llrs)),
                                      np.asarray(hard))

    def test_dmpsk_llr_wrapped_distance(self):
        """Candidates are compared on the circle: a dphi just past -pi must
        prefer the +pi candidate (dbpsk symbol 1), not distance-3pi away."""
        from modem_tpu.ops.llr import dmpsk_llr

        llr = dmpsk_llr(jnp.asarray([-np.pi + 0.05]), np.pi, 1,
                        noise_var=1.0)
        assert float(llr[0]) < 0  # bit 1 more likely

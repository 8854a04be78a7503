"""DSSS spread spectrum (modem_tpu/dsss.py): exactness, processing gain
against a narrowband jammer, and soft output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates, make_scheme
from modem_tpu.dsss import DsssChain
from modem_tpu.chain import PulseShapedChain
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.llr import llr_hard_bits

RATES = Rates(baud_rate=1250, sample_rate=10000)  # chip rate; sps=8


def _bits(chain, n_symbols=64, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    bps = chain.scheme.bits_per_symbol
    return jnp.asarray(
        rng.integers(0, 2, (channels, n_symbols * bps)), jnp.int32)


class TestDsss:
    @pytest.mark.parametrize("name,l", [("qpsk", 8), ("qam16", 16),
                                        ("bpsk", 31)])
    def test_noiseless_roundtrip_exact(self, name, l):
        c = DsssChain(make_scheme(name, RATES), RATES, l)
        bits = _bits(c)
        out = c.roundtrip(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_awgn_processing_gain(self):
        """At a chip SNR where the unspread chain fails, L=16 spreading
        decodes exactly (correlator averages chip noise by L)."""
        snr = -4.0
        spread = DsssChain(make_scheme("qpsk", RATES), RATES, 16)
        bits = _bits(spread, n_symbols=128, seed=1)
        i, q = spread.tx(bits)
        ni, nq = awgn(jax.random.PRNGKey(2), i, q, snr)
        out = spread.rx((ni, nq), 128)
        assert int(jnp.sum(out != bits)) == 0

        plain = PulseShapedChain(make_scheme("qpsk", RATES), RATES)
        pi, pq = plain.tx(bits)
        npi, npq = awgn(jax.random.PRNGKey(3), pi, pq, snr)
        pout = plain.rx((npi, npq), bits.shape[-1] // 2)
        # unspread: Es/N0 ~ 5 dB after the matched filter -> ~4% BER
        assert int(jnp.sum(pout != bits)) > 15

    def test_narrowband_jammer_rejection(self):
        """A CW tone 10x the signal power: catastrophic for the plain
        chain, rejected by the correlator's processing gain."""
        c = DsssChain(make_scheme("qpsk", RATES), RATES, 32)
        bits = _bits(c, n_symbols=64, seed=4)
        i, q = c.tx(bits)
        p = float(jnp.mean(i * i + q * q))
        amp = np.sqrt(10.0 * p)
        n = jnp.arange(i.shape[-1], dtype=jnp.float32)
        th = 2.0 * np.pi * 0.013 * n + 0.7
        ji = i + amp * jnp.cos(th)
        jq = q + amp * jnp.sin(th)
        out = c.rx((ji, jq), 64)
        assert int(jnp.sum(out != bits)) == 0

        plain = PulseShapedChain(make_scheme("qpsk", RATES), RATES)
        pi, pq = plain.tx(bits)
        pj = pi + amp * jnp.cos(th[: pi.shape[-1]])
        qj = pq + amp * jnp.sin(th[: pq.shape[-1]])
        pout = plain.rx((pj, qj), bits.shape[-1] // 2)
        assert int(jnp.sum(pout != bits)) > 100

    def test_soft_signs_and_validation(self):
        c = DsssChain(make_scheme("qpsk", RATES), RATES, 16)
        bits = _bits(c, seed=5)
        i, q = c.tx(bits)
        ni, nq = awgn(jax.random.PRNGKey(6), i, q, -2.0)
        hard = c.rx((ni, nq), 64)
        llr = c.rx_soft((ni, nq), 64, noise_var=0.5)
        np.testing.assert_array_equal(
            np.asarray(llr_hard_bits(llr)), np.asarray(hard))
        with pytest.raises(ValueError):
            DsssChain(make_scheme("qpsk", RATES), RATES, 1)
        with pytest.raises(ValueError):
            DsssChain(make_scheme("qpsk", RATES), RATES, 8,
                      pn=np.zeros(8))
        with pytest.raises(TypeError):
            DsssChain(make_scheme("mfsk", RATES), RATES, 8)

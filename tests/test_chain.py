"""End-to-end bits->bits chains: exact recovery noiseless, 0 BER at spec SNR."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import FskChain, PulseShapedChain, qpsk_reference_chain
from modem_tpu.metrics import ber
from modem_tpu.models.fsk import CPFSK, MFSK
from modem_tpu.models.psk import BPSK, MPSK, QPSK
from modem_tpu.models.qam import QAM
from modem_tpu.ops.channel import awgn
from modem_tpu.config import TWO_PI

RATES = Rates(1250, 10000)  # sps = 8


def _bits(n, seed=0, shape=()):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2, size=shape + (n,)))


@pytest.mark.parametrize("scheme,name", [
    (BPSK(np.pi / 4, 1.0), "bpsk"),
    (QPSK(0.0, 1.0), "qpsk"),
    (MPSK(4, 0.0, 1.0), "16psk"),
    (QAM(4, 0.0, 1.0), "qam16"),
    (QAM(8, 0.0, 1.0), "qam256"),
])
def test_noiseless_roundtrip_exact(scheme, name):
    chain = PulseShapedChain(scheme, RATES)
    bits = _bits(256 * scheme.bits_per_symbol, seed=1)
    out = jax.jit(chain.roundtrip)(bits)
    assert int(jnp.sum(out != bits)) == 0, name


def test_qpsk_zero_ber_at_spec_snr():
    """BASELINE: 0 BER at reference SNR (15 dB Es/N0 is far above the QPSK
    waterfall) over a decent block."""
    chain = qpsk_reference_chain(RATES)
    bits = _bits(2 * 4096, seed=2)
    si, sq = chain.tx(bits)
    ni, nq = awgn(jax.random.key(0), si, sq, snr_db=15.0)
    out = chain.rx((ni, nq), 4096)
    assert int(jnp.sum(out != bits)) == 0


def test_qpsk_ber_curve_sane():
    """At 1 dB Es/N0, QPSK BER should be clearly nonzero but below 10%."""
    chain = qpsk_reference_chain(RATES)
    bits = _bits(2 * 8192, seed=3)
    si, sq = chain.tx(bits)
    ni, nq = awgn(jax.random.key(1), si, sq, snr_db=1.0)
    out = chain.rx((ni, nq), 8192)
    b = float(ber(bits, out))
    assert 1e-4 < b < 0.1, b


def test_passband_roundtrip():
    """Config #1-style: BPSK over a real passband carrier."""
    rates = Rates(500, 10000)  # sps=20, carrier 2 kHz
    chain = PulseShapedChain(BPSK(0.0, 1.0), rates, carrier_hz=2000)
    bits = _bits(128, seed=4)
    out = jax.jit(chain.roundtrip)(bits)
    assert int(jnp.sum(out != bits)) == 0


def test_batched_channels_roundtrip():
    chain = qpsk_reference_chain(RATES)
    bits = _bits(2 * 512, seed=5, shape=(4,))
    out = jax.jit(chain.roundtrip)(bits)
    assert int(jnp.sum(out != bits)) == 0


@pytest.mark.parametrize("make", [
    lambda: (CPFSK(2, Rates(1250, 10000), 1.0, 1),
             2 * np.arange(4),  # coef(sym) = 2*sym, `cpfsk.rs:26-28`
             TWO_PI * (1 * 1250 // 2) / 10000),
    lambda: (MFSK(2, 150, 10000, 1.0, "default"),
             2 * np.arange(4) - 3,  # DefaultMap, `mfsk.rs:24-27`
             TWO_PI * 150 / 10000),
])
def test_fsk_roundtrip(make):
    scheme, coefs, dev = make()
    chain = FskChain(scheme, RATES, coefs, dev)
    bits = _bits(2 * 256, seed=6)
    out = jax.jit(chain.roundtrip)(bits)
    assert int(jnp.sum(out != bits)) == 0


def test_fsk_noisy():
    scheme = CPFSK(2, RATES, 1.0, 1)
    chain = FskChain(scheme, RATES, 2 * np.arange(4),
                     TWO_PI * (1 * 1250 // 2) / 10000)
    bits = _bits(2 * 1024, seed=7)
    i, q = chain.tx(bits)
    ni, nq = awgn(jax.random.key(2), i, q, snr_db=20.0)
    out = chain.rx(ni, nq)
    assert int(jnp.sum(out != bits)) == 0

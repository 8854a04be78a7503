"""Polyphase interp/decim vs the full-rate reference formulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import (
    PulseShapedChain, qpsk_reference_chain, upsample_zero_stuff,
)
from modem_tpu.models.qam import QAM
from modem_tpu.ops.fir import fir_filter
from modem_tpu.ops.filters import rrc_taps
from modem_tpu.ops.polyphase import polyphase_decim, polyphase_interp

RATES = Rates(baud_rate=1250, sample_rate=10000)  # sps = 8


@pytest.mark.parametrize("sps,ntaps", [(8, 65), (8, 64), (4, 33), (5, 23), (3, 10)])
def test_interp_matches_zero_stuff(sps, ntaps):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 64)), jnp.float32)
    taps = rng.normal(size=ntaps).astype(np.float32)
    y, _ = polyphase_interp(x, taps, sps)
    ref, _ = fir_filter(upsample_zero_stuff(x, sps), taps)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_interp_streaming_state():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(48,)), jnp.float32)
    taps = rng.normal(size=33).astype(np.float32)
    full, _ = polyphase_interp(x, taps, 4)
    y1, st = polyphase_interp(x[:16], taps, 4)
    y2, _ = polyphase_interp(x[16:], taps, 4, st)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2])), np.asarray(full), atol=1e-6
    )


@pytest.mark.parametrize("sps,ntaps,delay", [(8, 65, 64), (4, 33, 32), (5, 23, 22)])
def test_decim_matches_full_rate(sps, ntaps, delay):
    rng = np.random.default_rng(2)
    n_out = 16
    n = delay + n_out * sps
    x = jnp.asarray(rng.normal(size=(2, n)), jnp.float32)
    taps = rng.normal(size=ntaps).astype(np.float32)
    z = polyphase_decim(x, taps, sps, delay, n_out)
    y, _ = fir_filter(x, taps)
    ref = y[..., delay::sps][..., :n_out]
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=1e-5)


def test_decim_rejects_short_input():
    x = jnp.zeros((10,), jnp.float32)
    with pytest.raises(ValueError):
        polyphase_decim(x, np.ones(5, np.float32), 4, 4, 8)


class TestPolyphaseChain:
    def test_qpsk_roundtrip_exact(self):
        chain = qpsk_reference_chain(RATES)
        chain.polyphase = True
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (4, 256)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(chain.roundtrip(bits)), np.asarray(bits)
        )

    def test_qam16_roundtrip_exact(self):
        chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES, polyphase=True)
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (2, 128)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(chain.roundtrip(bits)), np.asarray(bits)
        )

    def test_waveform_matches_full_rate_path(self):
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, (128,)), jnp.int32)
        full = qpsk_reference_chain(RATES)
        poly = qpsk_reference_chain(RATES)
        poly.polyphase = True
        fi, fq = full.tx(bits)
        pi_, pq = poly.tx(bits)
        np.testing.assert_allclose(np.asarray(pi_), np.asarray(fi), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pq), np.asarray(fq), atol=1e-6)

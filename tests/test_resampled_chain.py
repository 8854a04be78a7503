"""BASELINE config #4 end-to-end: QAM + rational resampler in the chain.

Covers: exact noiseless roundtrip for 16/64-QAM at several up/down ratios,
integer-delay solving, chunked streaming bit-parity with the one-shot chain,
and a high-SNR AWGN sanity run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu.config import Rates
from modem_tpu.models.qam import QAM
from modem_tpu.resampled import (
    ResampledChain, StreamingResampledChain, _solve_stage2_taps,
)

RATES = Rates(baud_rate=1250, sample_rate=10000)  # sps = 8


def make_chain(bps=4, up=3, down=2, **kw):
    return ResampledChain(QAM(bps, 0.0, 1.0), RATES, up, down, **kw)


@pytest.mark.parametrize("up,down", [(3, 2), (2, 3), (2, 1), (1, 2), (5, 4)])
@pytest.mark.parametrize("bps", [4, 6])
def test_exact_roundtrip(up, down, bps):
    chain = make_chain(bps=bps, up=up, down=down)
    rng = np.random.default_rng(up * 100 + down * 10 + bps)
    bits = jnp.asarray(rng.integers(0, 2, (2, 64 * bps)), jnp.int32)
    out = chain.roundtrip(bits)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_integer_delay_solver():
    for up, down in [(3, 2), (2, 3), (5, 4), (4, 5), (7, 3), (2, 1), (1, 2)]:
        t1 = 16
        t2 = _solve_stage2_taps(up, down, t1)
        assert (up * t1 + down * t2 - 2) % (2 * up) == 0
        chain = make_chain(up=up, down=down)
        assert chain.resample_delay * 2 * chain.up == (
            len(chain.taps1) + len(chain.taps2) - 2
        )


def test_channel_rate_lengths():
    chain = make_chain(up=3, down=2)
    bits = jnp.zeros((1, 32 * 4), jnp.int32)
    ci, cq = chain.tx(bits)
    assert ci.shape == cq.shape
    # channel stream is up/down times the padded modem-rate stream
    assert (ci.shape[-1] * chain.down) % chain.up == 0


@pytest.mark.parametrize("up,down", [(3, 2), (2, 3)])
@pytest.mark.slow
def test_streaming_matches_oneshot(up, down):
    """Chunked push/flush decisions == one-shot roundtrip, bit-exact."""
    bps = 4
    chain = make_chain(bps=bps, up=up, down=down)
    rng = np.random.default_rng(42)
    n_sym = 96
    bits = rng.integers(0, 2, (2, n_sym * bps)).astype(np.int32)
    one_shot = np.asarray(chain.roundtrip(jnp.asarray(bits)))

    stream = StreamingResampledChain(chain, batch_shape=(2,))
    outs = []
    start = 0
    for blk in (7, 1, 30, 19, 25, 14):  # ragged split of 96 symbols
        chunk = bits[:, start * bps: (start + blk) * bps]
        outs.append(np.asarray(stream.push(jnp.asarray(chunk))))
        start += blk
    assert start == n_sym
    outs.append(np.asarray(stream.flush()))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_array_equal(got, one_shot)
    with pytest.raises(RuntimeError):
        stream.push(jnp.asarray(bits[:, :bps]))


def test_streaming_emits_incrementally():
    chain = make_chain()
    stream = StreamingResampledChain(chain)
    bps = 4
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 64 * bps).astype(np.int32)
    out1 = stream.push(jnp.asarray(bits))
    # decisions lag by the chain delay, but a 64-symbol push must finalize most
    assert out1.shape[-1] > 0
    out2 = stream.flush()
    assert out1.shape[-1] + out2.shape[-1] == bits.size


def test_awgn_high_snr_clean():
    chain = make_chain(bps=4, up=3, down=2)
    rng = np.random.default_rng(9)
    bits = jnp.asarray(rng.integers(0, 2, (4, 128 * 4)), jnp.int32)
    ber = chain.ber(bits, snr_db=30.0, key=jax.random.key(0))
    assert float(ber) == 0.0


def test_soft_llr_signs_match_hard():
    chain = make_chain(bps=4, up=2, down=3)
    rng = np.random.default_rng(11)
    bits = jnp.asarray(rng.integers(0, 2, 48 * 4), jnp.int32)
    wave = chain.tx(bits)
    hard = chain.rx(wave, 48)
    llrs = chain.rx_soft(wave, 48)
    np.testing.assert_array_equal(
        np.asarray((llrs < 0).astype(jnp.int32)), np.asarray(hard)
    )


# ---- fused kernels (ops/pallas_resampled.py) ----

@pytest.mark.parametrize("up,down", [(3, 2), (2, 3), (5, 4), (1, 1)])
def test_fused_tx_matches_staged(up, down):
    chain = ResampledChain(QAM(4, 0.0, 1.0), RATES, up, down)
    rng = np.random.default_rng(10)
    bits = jnp.asarray(rng.integers(0, 2, (2, 200 * 4)).astype(np.int32))
    ci, cq = chain.tx(bits)
    fi, fq = chain.tx_fused(bits)
    assert fi.shape == ci.shape
    np.testing.assert_allclose(fi, ci, atol=1e-6)
    np.testing.assert_allclose(fq, cq, atol=1e-6)


@pytest.mark.parametrize("up,down", [(3, 2), (2, 3)])
def test_fused_rx_matches_staged(up, down):
    chain = ResampledChain(QAM(4, 0.0, 1.0), RATES, up, down)
    rng = np.random.default_rng(11)
    bits = jnp.asarray(rng.integers(0, 2, (2, 200 * 4)).astype(np.int32))
    wave = chain.tx(bits)
    assert jnp.array_equal(chain.rx_fused(wave, 200), chain.rx(wave, 200))


@pytest.mark.parametrize("up,down", [(3, 2), (2, 3), (5, 4)])
def test_fused_roundtrip_exact(up, down):
    chain = ResampledChain(QAM(4, 0.0, 1.0), RATES, up, down)
    rng = np.random.default_rng(12)
    bits = jnp.asarray(rng.integers(0, 2, (3, 300 * 4)).astype(np.int32))
    assert jnp.array_equal(chain.roundtrip_fused(bits), bits)


def test_fused_64qam():
    chain = ResampledChain(QAM(6, 0.0, 1.0), RATES, 3, 2)
    rng = np.random.default_rng(13)
    bits = jnp.asarray(rng.integers(0, 2, (2, 250 * 6)).astype(np.int32))
    assert jnp.array_equal(chain.roundtrip_fused(bits), bits)


def test_fused_soft_matches_staged():
    chain = ResampledChain(QAM(4, 0.0, 1.0), RATES, 3, 2)
    rng = np.random.default_rng(14)
    bits = jnp.asarray(rng.integers(0, 2, (2, 200 * 4)).astype(np.int32))
    wave = chain.tx(bits)
    llr_f = chain.rx_soft_fused(wave, 200, noise_var=0.5)
    llr_s = chain.rx_soft(wave, 200, noise_var=0.5)
    np.testing.assert_allclose(llr_f, llr_s, atol=1e-4)
    assert jnp.array_equal((llr_f < 0).astype(jnp.int32),
                           chain.rx(wave, 200))

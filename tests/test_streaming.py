"""Streaming fused chain vs the one-shot fused chain across block splits."""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import PulseShapedChain, qpsk_reference_chain
from modem_tpu.models.qam import QAM
from modem_tpu.streaming import StreamingFusedChain

RATES = Rates(baud_rate=1250, sample_rate=10000)


@pytest.mark.parametrize("splits", [
    [400], [100, 300], [37, 101, 262], [8, 8, 8, 376], [1, 399],
])
def test_matches_one_shot(splits):
    chain = qpsk_reference_chain(RATES)
    rng = np.random.default_rng(0)
    total = sum(splits)
    bits = jnp.asarray(rng.integers(0, 2, (2, total * 2)), jnp.int32)
    expect = chain.roundtrip_fused(bits)

    stream = StreamingFusedChain(chain, batch_shape=(2,))
    outs = []
    start = 0
    for n in splits:
        outs.append(stream.push(bits[..., start * 2: (start + n) * 2]))
        start += n
    outs.append(stream.flush())
    got = jnp.concatenate(outs, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))


def test_short_stream():
    """Stream shorter than the span delay still flushes correctly."""
    chain = qpsk_reference_chain(RATES)
    stream = StreamingFusedChain(chain)
    bits = jnp.asarray([0, 1, 1, 0, 1, 0], jnp.int32)  # 3 symbols < span=8
    a = stream.push(bits)
    assert a.shape[-1] == 0
    b = stream.flush()
    np.testing.assert_array_equal(np.asarray(b), np.asarray(bits))


def test_qam_streaming():
    chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES)
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, 200 * 4), jnp.int32)
    stream = StreamingFusedChain(chain)
    got = jnp.concatenate(
        [stream.push(bits[: 300]), stream.push(bits[300:]), stream.flush()],
        axis=-1,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))


def test_batch_shape_enforced():
    stream = StreamingFusedChain(qpsk_reference_chain(RATES), (2,))
    with pytest.raises(ValueError):
        stream.push(jnp.zeros((3, 16), jnp.int32))

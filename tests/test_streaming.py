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


# ---- one-way streaming (StreamingFusedTx / StreamingFusedRx) ----

from modem_tpu.streaming import StreamingFusedRx, StreamingFusedTx  # noqa: E402


@pytest.mark.parametrize("splits", [[64], [17, 47], [1, 2, 61], [30, 4, 30]])
def test_streaming_tx_matches_one_shot(splits):
    chain = qpsk_reference_chain(RATES)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (2, 64 * 2)).astype(np.int32))
    one_i, one_q = chain.tx_fused(bits)

    stream = StreamingFusedTx(chain, (2,))
    got_i, got_q = [], []
    start = 0
    for n in splits:
        i, q = stream.push(bits[..., start * 2:(start + n) * 2])
        got_i.append(i)
        got_q.append(q)
        start += n
    fi, fq = stream.flush()
    got_i.append(fi)
    got_q.append(fq)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(x) for x in got_i], -1), np.asarray(one_i))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(x) for x in got_q], -1), np.asarray(one_q))


@pytest.mark.parametrize("splits", [[64], [16, 48], [8, 24, 32]])
def test_streaming_rx_matches_one_shot(splits):
    chain = qpsk_reference_chain(RATES)
    sps = chain.sps
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (2, 64 * 2)).astype(np.int32))
    wave = chain.tx(bits)
    n_total = wave[0].shape[-1]  # (64 + span) * sps, includes the TX flush

    stream = StreamingFusedRx(chain, (2,))
    got = []
    start = 0
    for n in splits + [n_total // sps - 64]:
        seg = tuple(w[..., start * sps:(start + n) * sps] for w in wave)
        got.append(np.asarray(stream.push(seg)))
        start += n
    out = np.concatenate(got, -1)
    np.testing.assert_array_equal(out, np.asarray(chain.rx(wave, 64)))


def test_streaming_tx_rx_pipeline_passband():
    chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES, carrier_hz=2000)
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, (96 * 4,)).astype(np.int32))
    tx = StreamingFusedTx(chain)
    rx = StreamingFusedRx(chain)
    got = []
    for start, n in [(0, 32), (32, 17), (49, 47)]:
        x = tx.push(bits[start * 4:(start + n) * 4])
        got.append(np.asarray(rx.push(x)))
    # pushing the TX flush tail supplies the last decisions' lookahead;
    # rx.flush() is only for streams truncated before the TX flush.
    got.append(np.asarray(rx.push(tx.flush())))
    out = np.concatenate(got, -1)
    np.testing.assert_array_equal(out, np.asarray(bits))


def test_streaming_rx_truncated_flush():
    chain = qpsk_reference_chain(RATES)
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, (40 * 2,)).astype(np.int32))
    wave = chain.tx(bits)
    # push only the first 40 symbols' worth of samples (no TX flush tail)
    trunc = tuple(w[..., : 40 * chain.sps] for w in wave)
    rx = StreamingFusedRx(chain)
    head = np.asarray(rx.push(trunc))
    tail = np.asarray(rx.flush())
    out = np.concatenate([head, tail], -1)
    assert out.shape == (40 * 2,)
    # decisions with full context (all but the last span symbols) must match
    full = np.asarray(chain.rx(wave, 40))
    k = (40 - chain.span) * 2
    np.testing.assert_array_equal(out[:k], full[:k])


def test_streaming_tx_i16():
    chain = qpsk_reference_chain(RATES)
    rng = np.random.default_rng(4)
    bits = jnp.asarray(rng.integers(0, 2, (48 * 2,)).astype(np.int32))
    xi_one, _ = chain.tx_fused(bits, out_scale=8192.0)
    tx = StreamingFusedTx(chain, out_scale=8192.0)
    i1, _ = tx.push(bits[: 20 * 2])
    i2, _ = tx.push(bits[20 * 2:])
    i3, _ = tx.flush()
    got = np.concatenate([np.asarray(i1), np.asarray(i2), np.asarray(i3)], -1)
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, np.asarray(xi_one))


def test_streaming_txrx_checkpoint_resume(tmp_path):
    """Stop a TX/RX stream mid-flight, save both carries, resume in fresh
    instances: output bit-identical to the uninterrupted stream."""
    from modem_tpu.checkpoint import load_state, save_state

    chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES, carrier_hz=2000)
    rng = np.random.default_rng(9)
    bits = jnp.asarray(rng.integers(0, 2, (96 * 4,)).astype(np.int32))

    # uninterrupted
    tx0, rx0 = StreamingFusedTx(chain), StreamingFusedRx(chain)
    ref = [np.asarray(rx0.push(tx0.push(bits[:48 * 4]))),
           np.asarray(rx0.push(tx0.push(bits[48 * 4:]))),
           np.asarray(rx0.push(tx0.flush()))]

    # interrupted after the first half
    tx1, rx1 = StreamingFusedTx(chain), StreamingFusedRx(chain)
    got = [np.asarray(rx1.push(tx1.push(bits[:48 * 4])))]
    save_state(tmp_path / "tx.npz", tx1.get_state())
    save_state(tmp_path / "rx.npz", rx1.get_state())

    tx2, rx2 = StreamingFusedTx(chain), StreamingFusedRx(chain)
    tx2.set_state(load_state(tmp_path / "tx.npz", tx2.get_state()))
    rx2.set_state(load_state(tmp_path / "rx.npz", rx2.get_state()))
    got.append(np.asarray(rx2.push(tx2.push(bits[48 * 4:]))))
    got.append(np.asarray(rx2.push(tx2.flush())))

    np.testing.assert_array_equal(np.concatenate(got, -1),
                                  np.concatenate(ref, -1))
    np.testing.assert_array_equal(np.concatenate(ref, -1), np.asarray(bits))

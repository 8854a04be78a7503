"""Randomized chunk-boundary fuzz for every fused streaming surface.

Block seams are where a block-streaming design can silently break
(SURVEY.md section 7, hard part 3): a carry that is one sample short, an
off-by-one in the span-delay bookkeeping, a phase counter that drifts at a
boundary. The parametrized-split tests elsewhere pin a few layouts; this
module draws *random* split points (seeded, so failures reproduce) and
asserts the chunked run equals the one-shot run exactly for each streaming
surface:

* ``StreamingFusedChain`` (bits -> bits span-delay pipeline)
* ``StreamingFusedTx`` / ``StreamingFusedRx`` (one-way fused paths)
* ``Demodulator.demodulate_fused`` tail interop, including switching
  between the fused and staged implementations mid-stream (the interop
  contract in its docstring)
* ``StreamingResampledChain`` (multi-stage rational-resampler carry)
* OFDM frame streams: a multi-frame sample stream reassembled from
  random-size chunks, each frame demodulated as it completes
"""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import PulseShapedChain, qpsk_reference_chain
from modem_tpu.models.qam import QAM
from modem_tpu.streaming import (
    StreamingFusedChain, StreamingFusedRx, StreamingFusedTx)

pytestmark = pytest.mark.slow  # chunk-boundary fuzz: minutes of CPU; the seam cases are structurally covered by test_streaming

RATES = Rates(baud_rate=1250, sample_rate=10000)
SEEDS = [0, 1, 2]


def _random_splits(rng, total: int, quantum: int = 1) -> list:
    """Random composition of ``total`` into parts, each a multiple of
    ``quantum`` (parts of size 0 are allowed and exercised on purpose)."""
    total_q = total // quantum
    n_cuts = int(rng.integers(1, 8))
    cuts = np.sort(rng.integers(0, total_q + 1, n_cuts))
    parts = np.diff(np.concatenate([[0], cuts, [total_q]]))
    return [int(p) * quantum for p in parts]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_streaming_chain(seed):
    chain = qpsk_reference_chain(RATES)
    rng = np.random.default_rng(seed)
    total = int(rng.integers(40, 400))
    bits = jnp.asarray(rng.integers(0, 2, (2, total * 2)), jnp.int32)
    expect = chain.roundtrip_fused(bits)

    stream = StreamingFusedChain(chain, batch_shape=(2,))
    outs, start = [], 0
    for n in _random_splits(rng, total):
        outs.append(stream.push(bits[..., start * 2:(start + n) * 2]))
        start += n
    outs.append(stream.flush())
    got = np.concatenate([np.asarray(o) for o in outs], -1)
    np.testing.assert_array_equal(got, np.asarray(expect))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_streaming_tx_rx(seed):
    chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES)
    bps, sps = 4, chain.sps
    rng = np.random.default_rng(100 + seed)
    total = int(rng.integers(32, 200))
    bits = jnp.asarray(rng.integers(0, 2, (total * bps,)), jnp.int32)
    one_i, one_q = chain.tx_fused(bits)

    tx = StreamingFusedTx(chain)
    got_i, got_q, start = [], [], 0
    for n in _random_splits(rng, total):
        i, q = tx.push(bits[start * bps:(start + n) * bps])
        got_i.append(np.asarray(i))
        got_q.append(np.asarray(q))
        start += n
    fi, fq = tx.flush()
    got_i.append(np.asarray(fi))
    got_q.append(np.asarray(fq))
    wi, wq = np.concatenate(got_i, -1), np.concatenate(got_q, -1)
    np.testing.assert_array_equal(wi, np.asarray(one_i))
    np.testing.assert_array_equal(wq, np.asarray(one_q))

    # RX side over its own random splits of the same wave (incl. TX flush)
    rx = StreamingFusedRx(chain)
    n_sym_total = wi.shape[-1] // sps
    dec, start = [], 0
    for n in _random_splits(rng, n_sym_total):
        seg = (jnp.asarray(wi[start * sps:(start + n) * sps]),
               jnp.asarray(wq[start * sps:(start + n) * sps]))
        dec.append(np.asarray(rx.push(seg)))
        start += n
    out = np.concatenate(dec, -1)
    np.testing.assert_array_equal(out, np.asarray(bits))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_demodulate_fused_chunked(seed):
    """Chunked ``demodulate_fused`` (carrying state + x_tail) equals the
    one-shot call; switching fused <-> staged mid-stream stays on the same
    stream (the RxState interop contract, rx.py)."""
    from modem_tpu.rx import Demodulator
    from modem_tpu.tx import Modulator
    from modem_tpu.models import make_scheme

    rates = Rates(baud_rate=1250, sample_rate=10000)
    rng = np.random.default_rng(200 + seed)
    bits = jnp.asarray(rng.integers(0, 2, (128 * 2,)), jnp.int32)
    mod = Modulator(make_scheme("qpsk", rates), rates, carrier_hz=2000)
    wave, _ = mod.passband(bits, mod.init_state())
    n = int(wave.shape[-1])

    demod = Demodulator(carrier_hz=2000, sample_rate=rates.sample_rate)
    st = demod.init_state()
    (ri, rq), _, _ = demod.demodulate_fused(wave, st)
    ri, rq = np.asarray(ri), np.asarray(rq)

    st_c, tail = demod.init_state(), None
    got_i, got_q, start = [], [], 0
    staged_turn = rng.integers(0, 2, 16).astype(bool)
    for k, c in enumerate(_random_splits(rng, n)):
        seg = wave[..., start:start + c]
        if staged_turn[k % 16] and c > 0:
            # staged step mid-stream: same RxState, same stream position
            (i, q), st_c = demod.demodulate(seg, st_c)
            tail = seg[..., -(demod.lowpass.shape[0] - 1):] if \
                c >= demod.lowpass.shape[0] - 1 else (
                jnp.concatenate([tail, seg], -1)[..., -(demod.lowpass.shape[0] - 1):]
                if tail is not None else None)
            if tail is None:
                # stream too young to have a full passband tail: rebuild from
                # zeros + everything seen so far
                seen = wave[..., :start + c]
                lb = demod.lowpass.shape[0] - 1
                z = jnp.zeros((lb,), jnp.float32)
                tail = jnp.concatenate([z, seen], -1)[..., -lb:]
        else:
            (i, q), st_c, tail = demod.demodulate_fused(seg, st_c, tail)
        got_i.append(np.asarray(i))
        got_q.append(np.asarray(q))
        start += c
    gi, gq = np.concatenate(got_i, -1), np.concatenate(got_q, -1)
    # fused vs staged agree to f32 rounding; boundary-chunked mixed run must
    # stay within the same tolerance of the one-shot fused result
    np.testing.assert_allclose(gi, ri, atol=2e-4)
    np.testing.assert_allclose(gq, rq, atol=2e-4)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_demodulate_fused_pure_chunks(seed):
    """Fused-only chunking is exact (no staged steps, bitwise equality)."""
    from modem_tpu.rx import Demodulator
    from modem_tpu.tx import Modulator
    from modem_tpu.models import make_scheme

    rates = Rates(baud_rate=1250, sample_rate=10000)
    rng = np.random.default_rng(300 + seed)
    bits = jnp.asarray(rng.integers(0, 2, (96 * 2,)), jnp.int32)
    mod = Modulator(make_scheme("qpsk", rates), rates, carrier_hz=2000)
    wave, _ = mod.passband(bits, mod.init_state())
    n = int(wave.shape[-1])

    demod = Demodulator(carrier_hz=2000, sample_rate=rates.sample_rate)
    (ri, rq), _, _ = demod.demodulate_fused(wave, demod.init_state())

    st, tail = demod.init_state(), None
    got_i, got_q, start = [], [], 0
    for c in _random_splits(rng, n):
        (i, q), st, tail = demod.demodulate_fused(
            wave[..., start:start + c], st, tail)
        got_i.append(np.asarray(i))
        got_q.append(np.asarray(q))
        start += c
    np.testing.assert_array_equal(np.concatenate(got_i, -1), np.asarray(ri))
    np.testing.assert_array_equal(np.concatenate(got_q, -1), np.asarray(rq))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_streaming_resampled(seed):
    from modem_tpu.resampled import ResampledChain, StreamingResampledChain

    chain = ResampledChain(QAM(4, 0.0, 6.0), RATES, up=3, down=2)
    bps = 4
    rng = np.random.default_rng(400 + seed)
    total = int(rng.integers(64, 256))
    bits = jnp.asarray(rng.integers(0, 2, (total * bps,)), jnp.int32)
    expect = np.asarray(chain.roundtrip(bits))

    stream = StreamingResampledChain(chain)
    outs, start = [], 0
    for n in _random_splits(rng, total):
        outs.append(np.asarray(stream.push(bits[start * bps:(start + n) * bps])))
        start += n
    outs.append(np.asarray(stream.flush()))
    got = np.concatenate(outs, -1)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_ofdm_frame_stream(seed):
    """An OFDM frame stream (F back-to-back frames) chopped at random sample
    boundaries and reassembled frame-by-frame decodes every frame exactly as
    the aligned one-shot ``rx_frame`` does."""
    from modem_tpu.models import make_scheme
    from modem_tpu.ofdm import OfdmModem

    rates = Rates(baud_rate=1250, sample_rate=10000)
    modem = OfdmModem(make_scheme("qpsk", rates))
    n_sym, frames = 4, 3
    bpf = modem.bits_per_frame(n_sym)
    flen = modem.frame_len(n_sym)
    rng = np.random.default_rng(500 + seed)
    bits = jnp.asarray(rng.integers(0, 2, (frames, bpf)), jnp.int32)

    # build the stream: frames back to back
    fi, fq = [], []
    for f in range(frames):
        i, q = modem.tx_frame(bits[f])
        fi.append(np.asarray(i))
        fq.append(np.asarray(q))
    si, sq = np.concatenate(fi, -1), np.concatenate(fq, -1)

    expect = [np.asarray(modem.rx_frame(jnp.asarray(fi[f]),
                                        jnp.asarray(fq[f]), n_sym))
              for f in range(frames)]

    # receiver loop: accumulate random-size chunks; demodulate each frame
    # the moment its samples are all in
    buf_i = np.zeros((0,), np.float32)
    buf_q = np.zeros((0,), np.float32)
    got, start = [], 0
    for c in _random_splits(rng, si.shape[-1]):
        buf_i = np.concatenate([buf_i, si[start:start + c]])
        buf_q = np.concatenate([buf_q, sq[start:start + c]])
        start += c
        while buf_i.shape[-1] >= flen:
            got.append(np.asarray(modem.rx_frame(
                jnp.asarray(buf_i[:flen]), jnp.asarray(buf_q[:flen]), n_sym)))
            buf_i, buf_q = buf_i[flen:], buf_q[flen:]
    assert len(got) == frames
    for g, e, b in zip(got, expect, np.asarray(bits)):
        np.testing.assert_array_equal(g, e)
        np.testing.assert_array_equal(g, b)

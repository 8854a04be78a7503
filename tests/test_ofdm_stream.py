"""OfdmStreamReceiver: continuous blind burst reception over an unbounded
chunked sample stream (bursts at unknown times, noise/silence between),
bit-identical to aligned one-shot acquisition regardless of chunking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import OfdmModem, OfdmStreamReceiver, Rates, make_scheme
from modem_tpu.ops.impairments import apply_cfo, apply_gain_phase

RATES = Rates(baud_rate=1250, sample_rate=10000)
N_SYM = 4


def _modem():
    return OfdmModem(make_scheme("qpsk", RATES))


def _burst_stream(m, payloads, gaps, rng, snr_db=28.0, cfo_bins=0.0):
    """Build [gap0][frame0][gap1][frame1]... with noise-floor gaps.
    Returns (i, q, true_starts)."""
    noise_amp = 10.0 ** (-snr_db / 20.0)
    segs_i, segs_q, starts = [], [], []
    pos = 0
    for g, bits in zip(gaps, list(payloads) + [None]):
        segs_i.append(noise_amp * rng.standard_normal(g).astype(np.float32))
        segs_q.append(noise_amp * rng.standard_normal(g).astype(np.float32))
        pos += g
        if bits is None:
            break
        i, q = m.tx_frame(bits)
        i, q = apply_gain_phase(i, q, gain=1.2, phase=0.7)
        if cfo_bins:
            i, q = apply_cfo(i, q, cfo_hz=cfo_bins / m.n_fft, sample_rate=1)
        ni = np.asarray(i) + noise_amp * rng.standard_normal(
            i.shape[-1]).astype(np.float32)
        nq = np.asarray(q) + noise_amp * rng.standard_normal(
            q.shape[-1]).astype(np.float32)
        segs_i.append(ni)
        segs_q.append(nq)
        starts.append(pos)
        pos += ni.shape[-1]
    return (np.concatenate(segs_i), np.concatenate(segs_q), starts)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_bursts_with_gaps_decoded_exactly(seed):
    m = _modem()
    rng = np.random.default_rng(seed)
    bpf = m.bits_per_frame(N_SYM)
    payloads = [jnp.asarray(rng.integers(0, 2, bpf), jnp.int32)
                for _ in range(3)]
    gaps = [int(g) for g in rng.integers(50, 700, 4)]
    si, sq, starts = _burst_stream(m, payloads, gaps, rng)

    rxr = OfdmStreamReceiver(m, N_SYM)
    frames = []
    pos = 0
    while pos < si.shape[-1]:
        c = int(rng.integers(1, 900))
        frames += rxr.push(jnp.asarray(si[pos:pos + c]),
                           jnp.asarray(sq[pos:pos + c]))
        pos += c
    frames += rxr.flush()

    assert len(frames) == len(payloads), \
        [f[1]["start"] for f in frames]
    for (bits, rep), want, t0 in zip(frames, payloads, starts):
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(want))
        assert abs(rep["start"] - t0) <= 4, (rep["start"], t0)
        assert rep["sc_detect"] > 0.6


def test_back_to_back_frames():
    """Zero-gap frames: each located and decoded in turn."""
    m = _modem()
    rng = np.random.default_rng(7)
    bpf = m.bits_per_frame(N_SYM)
    payloads = [jnp.asarray(rng.integers(0, 2, bpf), jnp.int32)
                for _ in range(3)]
    si, sq, starts = _burst_stream(m, payloads, [120, 0, 0, 60], rng)
    rxr = OfdmStreamReceiver(m, N_SYM)
    frames = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
    assert len(frames) == 3
    for (bits, rep), want, t0 in zip(frames, payloads, starts):
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(want))
        assert abs(rep["start"] - t0) <= 4


def test_cfo_burst():
    """Per-burst CFO is corrected by the blind chain inside the stream."""
    m = _modem()
    rng = np.random.default_rng(11)
    bpf = m.bits_per_frame(N_SYM)
    payloads = [jnp.asarray(rng.integers(0, 2, bpf), jnp.int32)]
    si, sq, _ = _burst_stream(m, payloads, [200, 200], rng, cfo_bins=1.1)
    rxr = OfdmStreamReceiver(m, N_SYM)
    frames = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
    assert len(frames) == 1
    np.testing.assert_array_equal(np.asarray(frames[0][0]),
                                  np.asarray(payloads[0]))


def test_noise_only_stream_yields_nothing():
    m = _modem()
    rng = np.random.default_rng(13)
    n = 4000
    si = 0.05 * rng.standard_normal(n).astype(np.float32)
    sq = 0.05 * rng.standard_normal(n).astype(np.float32)
    rxr = OfdmStreamReceiver(m, N_SYM)
    frames = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
    assert frames == []


@pytest.mark.slow
def test_matches_aligned_acquire():
    """Stream-receiver output is bit-identical to one-shot acquire on an
    aligned capture of the same burst."""
    m = _modem()
    rng = np.random.default_rng(17)
    bpf = m.bits_per_frame(N_SYM)
    payloads = [jnp.asarray(rng.integers(0, 2, bpf), jnp.int32)]
    si, sq, starts = _burst_stream(m, payloads, [90, 150], rng)
    rxr = OfdmStreamReceiver(m, N_SYM, max_lag=2 * m.sym_len)
    frames = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
    assert len(frames) == 1
    t0 = starts[0]
    lead = min(t0, 40)
    cap_i = jnp.asarray(si[t0 - lead: t0 - lead + 64 + m.frame_len(N_SYM)])
    cap_q = jnp.asarray(sq[t0 - lead: t0 - lead + 64 + m.frame_len(N_SYM)])
    ref, _ = m.acquire(cap_i, cap_q, N_SYM, max_lag=64)
    np.testing.assert_array_equal(np.asarray(frames[0][0]),
                                  np.asarray(ref))


def test_flush_resets_to_fresh_stream():
    """After flush() the receiver is a fresh stream: global indices of a
    second session start at 0, and max_lag > frame_len is rejected."""
    m = _modem()
    rng = np.random.default_rng(23)
    bpf = m.bits_per_frame(N_SYM)
    payloads = [jnp.asarray(rng.integers(0, 2, bpf), jnp.int32)]
    si, sq, starts = _burst_stream(m, payloads, [100, 80], rng)
    rxr = OfdmStreamReceiver(m, N_SYM)
    f1 = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
    f2 = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
    assert len(f1) == len(f2) == 1
    assert f1[0][1]["start"] == f2[0][1]["start"] == starts[0]

    with pytest.raises(ValueError):
        OfdmStreamReceiver(m, N_SYM, max_lag=m.frame_len(N_SYM) + 1)

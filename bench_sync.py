"""Acquisition subsystem throughput on the chip.

Measures the full blind burst receiver (`sync.AcquiringReceiver.rx`:
Oerder&Meyr timing → Farrow correction → matched filter → differential
frame sync → preamble CFO/phase/gain → slice) over a channel bank of
impaired bursts — same methodology as bench.py (device-side ``lax.scan``
over blocks, on-device checksum fetched in the timing window, ≥5 passes).

Metric: complex waveform samples/s acquired+demodulated (the unit the
1e9 BASELINE target uses), plus bursts/s for context. The checksum gate
is exact payload recovery on every burst (30 dB, full impairment stack).

``BENCH_STAGES=1`` additionally prints cumulative-prefix stage timings
(O&M timing -> Farrow -> matched filter -> frame sync -> frame extract
-> CFO/phase/gain): the marginal cost of stage k is row[k] - row[k-1].
This is the probe that located the 82%% take_along_axis frame-extract
bottleneck that ``ops/sync_metric.aligned_frame_matmul`` removed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import apply_cfo, apply_gain_phase, \
    apply_static_delay
from modem_tpu.sync import AcquiringReceiver

RATES = Rates(1250, 10000)
CHANNELS = int(os.environ.get("BENCH_CHANNELS", 64))
N_PAYLOAD = int(os.environ.get("BENCH_PAYLOAD_SYMS", 512))
# 256 blocks ≈ 72M waveform samples per pass: the 64-block pass spent
# ~40% of its time on the ~31 ms dispatch/fetch floor (round-3 stage
# timing), so round-2's 239 MSamp/s under-reported the receiver
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 256))
PASSES = 5
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def main():
    chain = qpsk_reference_chain(RATES)
    rxr = AcquiringReceiver(chain, PRE, max_lag=160)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(
        rng.integers(0, 2, (N_BLOCKS, CHANNELS, N_PAYLOAD * 2)), jnp.int32)

    @jax.jit
    def make_bursts(bits):
        def body(_, b):
            i, q = rxr.tx_burst(b)
            i, q = apply_static_delay(i, q, 0.37)
            i, q = apply_cfo(i, q, 9.0, RATES.sample_rate, phase0=1.3)
            i, q = apply_gain_phase(i, q, gain=0.8)
            i, q = awgn(jax.random.key(0), i, q, snr_db=30.0)
            return 0, (i, q)
        _, (i, q) = jax.lax.scan(body, 0, bits)
        return i, q

    wi, wq = make_bursts(bits)
    wi = jax.device_put(wi)
    wq = jax.device_put(wq)
    jax.block_until_ready((wi, wq))

    @jax.jit
    def run(wi, wq):
        def body(acc, xs):
            i, q = xs
            out = rxr.rx(i, q, N_PAYLOAD)
            return acc + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (wi, wq))
        return acc

    expect = int(np.asarray(bits).sum())
    got = int(run(wi, wq))  # compile + absorb first-sync anomaly
    assert got == expect, f"checksum {got} != {expect} (acquisition errors)"
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = int(run(wi, wq))
        times.append(time.perf_counter() - t0)
    assert got == expect
    best = min(times)
    spread = (max(times) - best) / best
    samples = int(np.prod(wi.shape))
    bursts = N_BLOCKS * CHANNELS
    print(f"burst acquisition: {samples / best / 1e6:8.1f} MSamp/s  "
          f"({bursts / best:7.0f} bursts/s, {CHANNELS}-ch bank, "
          f"{N_PAYLOAD}-sym payloads, spread {spread * 100:.0f}%)")

    if os.environ.get("BENCH_STAGES"):
        _stage_timings(chain, rxr, wi, wq, samples)


def _stage_timings(chain, rxr, wi, wq, samples):
    """Cumulative receiver-prefix timings (see module docstring)."""
    from modem_tpu.sync import (correct_timing, frame_sync,
                                oerder_meyr_timing, preamble_cfo_phase_gain)
    sps = chain.sps
    p = rxr.pre_iq.shape[0]
    n_tot = p + N_PAYLOAD
    need = rxr.max_lag + (n_tot - 1) * sps + 1

    def prefix(which):
        def f(i, q):
            if i.shape[-1] < need:
                pad = jnp.zeros(i.shape[:-1] + (need - i.shape[-1],),
                                i.dtype)
                i = jnp.concatenate([i, pad], axis=-1)
                q = jnp.concatenate([q, pad], axis=-1)
            t0 = oerder_meyr_timing(i, q, sps)
            if which == "om":
                return jnp.sum(t0)
            ci, cq = correct_timing(i, q, t0)
            if which == "farrow":
                return jnp.sum(ci[..., ::33])
            yi, yq = chain.matched_filter(ci, cq)
            if which == "mf":
                return jnp.sum(yi[..., ::33])
            lag = frame_sync(yi, yq, rxr.pre_iq, sps, rxr.max_lag)
            if which == "framesync":
                return jnp.sum(lag)
            ks = jnp.arange(n_tot, dtype=jnp.int32) * sps
            idx = lag[..., None] + ks
            di = jnp.take_along_axis(yi, idx, axis=-1)
            dq = jnp.take_along_axis(yq, idx, axis=-1)
            if which == "gather":
                return jnp.sum(di[..., ::7])
            cfo, phase, gain = preamble_cfo_phase_gain(
                di[..., :p], dq[..., :p], rxr.pre_iq)
            return jnp.sum(cfo) + jnp.sum(gain)
        return f

    def clock(name, f):
        @jax.jit
        def run(wi, wq):
            def body(acc, xs):
                i, q = xs
                return acc + f(i, q).astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), (wi, wq))
            return acc
        float(np.asarray(run(wi, wq)))
        times = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            float(np.asarray(run(wi, wq)))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:26s} {best * 1e3:8.1f} ms/pass  "
              f"{samples / best / 1e6:8.1f} MSamp/s", flush=True)

    for w in ("om", "farrow", "mf", "framesync", "gather", "cfo"):
        clock(f"prefix through: {w}", prefix(w))
    clock("full rx", lambda i, q: jnp.sum(rxr.rx(i, q, N_PAYLOAD)))


if __name__ == "__main__":
    main()

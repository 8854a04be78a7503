"""OFDM modem throughput on the chip (modem_tpu/ofdm.py).

Same methodology as bench.py / bench_fec.py: device-side ``lax.scan``
over blocks, inputs generated on-device, decided+expected checksums
fetched through ONE compiled function, block counts sized over the
~35 ms dispatch floor, >= 5 passes, best + spread.

Rows (C channels x S symbols per frame, qpsk/qam16):
* ``tx_frame``: bits -> full frame waveform (reduced-IDFT matmuls + CP);
* ``rx_frame``: aligned frame -> bits (DFT matmuls, LS channel estimate
  from the LTFs, pilot CPE, slicing) at 30 dB — exact decisions gated
  on-device every pass;
* ``acquire``: blind S&C + full-preamble fine timing + the above.

Metric: wideband samples/s (frame samples incl. preamble).

Round-3 floor correction: at the round-2 geometry (64 blocks) the
rx_frame pass took ~32 ms — i.e. it sat ON the ~31 ms dispatch/fetch
floor and the reported 2.7 GSamp/s was mostly floor. The default is now
256 blocks with bf16 waveform *storage* (f32 compute per block; the bf16
quantization is ~-45 dB, far under the 30 dB AWGN the exactness gate
already absorbs), and the tx/rx rows also report the floor-free marginal
rate between quarter- and full-pass workloads (the bench_device.py
methodology) — that marginal IS the roofline statement for this family.
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

from modem_tpu import OfdmModem, Rates, make_scheme
from modem_tpu.ops.channel import awgn

CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
N_SYM = int(os.environ.get("BENCH_OFDM_SYMBOLS", 64))
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 256))
MAX_LAG = 96
PASSES = 5
RATES = Rates(baud_rate=1250, sample_rate=10000)


def _time(fn, args, expect):
    times = []
    got = None
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = int(np.asarray(fn(*args))[0])
        times.append(time.perf_counter() - t0)
    assert got == expect
    return min(times), (max(times) - min(times)) / min(times)


def bench(name, fn, args, samples_per_block, n_blocks=N_BLOCKS,
          quarter_fn=None):
    try:
        vals = np.asarray(fn(*args))
        got, expect = int(vals[0]), int(vals[1])
        assert got == expect, f"checksum {got} != {expect}"
    except Exception as e:  # noqa: BLE001
        print(f"{name:46s}  FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    best, spread = _time(fn, args, expect)
    rate = n_blocks * samples_per_block / best
    line = (f"{name:46s}  {rate / 1e9:7.3f} GSamp/s  "
            f"(spread {spread * 100:3.0f}%)")
    if quarter_fn is not None:
        # floor-free marginal rate between N/4 and N blocks
        vq = np.asarray(quarter_fn(*args))
        bq, _ = _time(quarter_fn, args, int(vq[1]))
        if best > bq:
            marg = (n_blocks - n_blocks // 4) * samples_per_block / (
                best - bq)
            line += f"  marginal {marg / 1e9:6.2f}"
    print(line, flush=True)


def rows(scheme_name):
    m = OfdmModem(make_scheme(scheme_name, RATES))
    flen = m.frame_len(N_SYM)
    nbits = m.bits_per_frame(N_SYM)

    @jax.jit
    def make(k):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(
            kb, 0.5, (N_BLOCKS, CHANNELS, nbits)).astype(jnp.int8)
        _, w = jax.lax.scan(
            lambda c, b: (c, jnp.stack(m.tx_frame(b.astype(jnp.int32)))),
            0, bits)
        ni, nq = awgn(kn, w[:, 0], w[:, 1], 30.0)
        return bits, ni.astype(jnp.bfloat16), nq.astype(jnp.bfloat16)

    bits, wi, wq = make(jax.random.key(0))

    def tx_fn(nb):
        @jax.jit
        def run_tx(bits):
            def body(acc, b):
                i, q = m.tx_frame(b.astype(jnp.int32))
                return acc + jnp.sum(i * i + q * q), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), bits[:nb])
            return jnp.stack([acc, acc])
        return run_tx

    def rx_fn(nb):
        @jax.jit
        def run_rx(wi, wq, bits):
            def body(acc, x):
                i, q, b = x
                out = m.rx_frame(i.astype(jnp.float32),
                                 q.astype(jnp.float32), N_SYM)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(
                body, jnp.int32(0), (wi[:nb], wq[:nb], bits[:nb]))
            return jnp.stack(
                [acc, jnp.sum(bits[:nb], dtype=jnp.int32)])
        return run_rx

    def make_acquire(correlator):
        @jax.jit
        def run_acquire(wi, wq, bits):
            def body(acc, x):
                i, q, b = x
                out, _ = m.acquire(i.astype(jnp.float32),
                                   q.astype(jnp.float32), N_SYM, MAX_LAG,
                                   correlator=correlator)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), (wi, wq, bits))
            return jnp.stack([acc, jnp.sum(bits, dtype=jnp.int32)])
        return run_acquire

    spb = CHANNELS * flen
    bench(f"OFDM {scheme_name} tx_frame (C={CHANNELS}, S={N_SYM})",
          tx_fn(N_BLOCKS), (bits,), spb, quarter_fn=tx_fn(N_BLOCKS // 4))
    bench(f"OFDM {scheme_name} rx_frame (exact @30dB)", rx_fn(N_BLOCKS),
          (wi, wq, bits), spb, quarter_fn=rx_fn(N_BLOCKS // 4))
    # correlator A/B (round-3 gather-rule refit of the fine-timing stage)
    bench(f"OFDM {scheme_name} blind acquire (lag {MAX_LAG}, fir)",
          make_acquire("fir"), (wi, wq, bits), spb)
    bench(f"OFDM {scheme_name} blind acquire (lag {MAX_LAG}, gather)",
          make_acquire("gather"), (wi, wq, bits), spb)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for s in ("qpsk", "qam16"):
        rows(s)


if __name__ == "__main__":
    main()

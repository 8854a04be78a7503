"""SC-FDE throughput on the chip (modem_tpu/scfde.py).

Same methodology as bench_ofdm.py: device-side ``lax.scan`` over blocks,
inputs generated on-device, decided+expected checksums fetched through ONE
compiled function, >= 5 passes, best + spread. Rows: tx_frame, rx_frame
(zero-forcing exact at 30 dB, on-device gate), rx_frame MMSE.

Metric: wideband samples/s (frame samples incl. training blocks).
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

from modem_tpu import Rates, make_scheme
from modem_tpu.ops.channel import awgn
from modem_tpu.scfde import ScFdeModem

CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
N_BLK = int(os.environ.get("BENCH_SCFDE_BLOCKS", 64))  # SC-FDE blocks/frame
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 64))     # frames per pass
PASSES = 5
RATES = Rates(baud_rate=1250, sample_rate=10000)


def bench(name, fn, args, samples_per_block, n_blocks=N_BLOCKS):
    try:
        vals = np.asarray(fn(*args))
        got, expect = int(vals[0]), int(vals[1])
        assert got == expect, f"checksum {got} != {expect}"
    except Exception as e:  # noqa: BLE001
        print(f"{name:46s}  FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = int(np.asarray(fn(*args))[0])
        times.append(time.perf_counter() - t0)
    assert got == expect
    best = min(times)
    spread = (max(times) - best) / best
    rate = n_blocks * samples_per_block / best
    print(f"{name:46s}  {rate / 1e9:7.3f} GSamp/s  "
          f"(spread {spread * 100:3.0f}%)", flush=True)


def rows(scheme_name):
    m = ScFdeModem(make_scheme(scheme_name, RATES))
    flen = m.frame_len(N_BLK)
    nbits = m.bits_per_frame(N_BLK)

    @jax.jit
    def make(k):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(
            kb, 0.5, (N_BLOCKS, CHANNELS, nbits)).astype(jnp.int32)
        _, w = jax.lax.scan(
            lambda c, b: (c, jnp.stack(m.tx_frame(b))), 0, bits)
        ni, nq = awgn(kn, w[:, 0], w[:, 1], 30.0)
        return bits, ni, nq

    bits, wi, wq = make(jax.random.key(0))

    @jax.jit
    def run_tx(bits):
        def body(acc, b):
            i, q = m.tx_frame(b)
            return acc + jnp.sum(i * i + q * q), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), bits)
        return jnp.stack([acc, acc])

    def make_rx(nv):
        @jax.jit
        def run_rx(wi, wq, bits):
            def body(acc, x):
                i, q, b = x
                return acc + jnp.sum(m.rx_frame(i, q, N_BLK, nv)), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), (wi, wq, bits))
            return jnp.stack([acc, jnp.sum(bits)])
        return run_rx

    spb = CHANNELS * flen
    bench(f"SC-FDE {scheme_name} tx_frame (C={CHANNELS}, B={N_BLK})",
          run_tx, (bits,), spb)
    bench(f"SC-FDE {scheme_name} rx_frame ZF (exact @30dB)",
          make_rx(0.0), (wi, wq, bits), spb)
    bench(f"SC-FDE {scheme_name} rx_frame MMSE", make_rx(1e-3),
          (wi, wq, bits), spb)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for s in ("qpsk", "qam16"):
        rows(s)


if __name__ == "__main__":
    main()

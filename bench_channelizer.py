"""Wideband channelizer throughput on the chip (BASELINE config #5 scale).

Measures the M=256 polyphase analysis and synthesis banks on a wideband
stream — the front end that feeds the 256-channel sharded modem bank. Per
wideband sample the bank does ``2·J`` filter MACs and ``4·M`` DFT-matmul
MACs per I/Q plane pair, so at M=256 this is genuinely MXU-bound work
(the [K, 256] @ [256, 256] DFT is the hardware's native tile).

Same methodology as bench.py: device-side ``lax.scan`` over blocks, an
on-device checksum fetched inside the timing window (the axon tunnel
returns from ``block_until_ready`` before remote execution completes),
first post-compile fetch absorbed before timing, ≥5 passes, best + spread.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
import jax.numpy as jnp

from modem_tpu.ops.channelizer import Channelizer

M = int(os.environ.get("BENCH_CHANNELS", 256))
K = int(os.environ.get("BENCH_ROWS", 4096))       # channel-rate samples/blk
# this device has a ~35 ms fixed dispatch/fetch floor per jitted run
# (measured: B=1..32 blocks of 1M samples all cost ~34-38 ms); the block
# count must be large enough to amortize it — at 256 blocks the marginal
# rate (~6.8 GSamp/s) dominates and run-to-run spread drops to ~1%.
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 256))
PASSES = 5


def _time(fn, *args):
    got = float(fn(*args))  # compile + absorb first-sync anomaly
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got2 = float(fn(*args))
        times.append(time.perf_counter() - t0)
    assert got2 == got
    best = min(times)
    return best, (max(times) - best) / best


def main():
    bank = Channelizer(M)
    # generate inputs on-device (multi-GB host transfers through the axon
    # tunnel would dominate setup time)
    kx = jax.random.split(jax.random.key(0), 4)
    wi = jax.random.normal(kx[0], (N_BLOCKS, M * K), jnp.float32)
    wq = jax.random.normal(kx[1], (N_BLOCKS, M * K), jnp.float32)
    jax.block_until_ready((wi, wq))

    @jax.jit
    def run_analyze(wi, wq):
        def body(acc, xs):
            yi, yq = bank.analyze(*xs)
            return acc + jnp.sum(yi[:, -1]) + jnp.sum(yq[:, -1]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (wi, wq))
        return acc

    ci = jax.random.normal(kx[2], (N_BLOCKS, M, K), jnp.float32)
    cq = jax.random.normal(kx[3], (N_BLOCKS, M, K), jnp.float32)
    jax.block_until_ready((ci, cq))

    @jax.jit
    def run_synthesize(ci, cq):
        def body(acc, xs):
            zi, zq = bank.synthesize(*xs)
            return acc + zi[-1] + zq[-1], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (ci, cq))
        return acc

    bank16 = Channelizer(M, dft_dtype=jnp.bfloat16)

    @jax.jit
    def run_analyze_bf16(wi, wq):
        def body(acc, xs):
            yi, yq = bank16.analyze(*xs)
            return acc + jnp.sum(yi[:, -1]) + jnp.sum(yq[:, -1]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (wi, wq))
        return acc

    n = N_BLOCKS * M * K
    b, s = _time(run_analyze, wi, wq)
    print(f"analysis  bank M={M}:      {n / b / 1e9:6.2f} GSamp/s wideband "
          f"(spread {s * 100:.0f}%)")
    b, s = _time(run_analyze_bf16, wi, wq)
    print(f"analysis  bank M={M} bf16: {n / b / 1e9:6.2f} GSamp/s wideband "
          f"(spread {s * 100:.0f}%)")
    b, s = _time(run_synthesize, ci, cq)
    print(f"synthesis bank M={M}:      {n / b / 1e9:6.2f} GSamp/s wideband "
          f"(spread {s * 100:.0f}%)")


if __name__ == "__main__":
    main()

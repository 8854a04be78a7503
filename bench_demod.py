"""Reference-demodulator hot-loop bench: the fused product detector
(`modem_tpu.ops.pallas_demod`) vs the reference's scalar RX loop
(`demodulator.rs:44-56`, ~151 MACs/sample, order 1e7-1e8 samples/s/core per
BASELINE.md). Same methodology as bench.py (device-side scan + fetched
scalar), plus an on-device staged-vs-fused parity gate."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, dataclasses

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
import jax.numpy as jnp
from modem_tpu import Demodulator

dem = Demodulator(carrier_hz=2000, sample_rate=10000)
# 64 blocks = 537M samples/pass: amortizes the ~35 ms dispatch/fetch
# floor (8 blocks measured at ~48 ms/pass — mostly floor); inputs are
# generated on-device (a 2 GB host transfer through the tunnel is minutes)
C, N, B = 256, 32768, int(os.environ.get("BENCH_BLOCKS", 64))
rng = np.random.default_rng(0)
x = jax.jit(lambda k: jax.random.normal(k, (B, C, N), jnp.float32))(
    jax.random.key(0))
st = dem.init_state((C,))
st = dataclasses.replace(st, phase_offset=jnp.asarray(rng.normal(size=C).astype(np.float32)))

def run(xb):
    def body(c, blk):
        (i, q), _, _ = dem.demodulate_fused(blk, st)
        return c + jnp.sum(i) + jnp.sum(q), None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), xb)
    return acc
fn = jax.jit(run)
fn(x).block_until_ready()
v = float(fn(x))
# correctness spot check on device: compare one block to staged
(i_s, q_s), _ = jax.jit(lambda b: dem.demodulate(b, st))(x[0])
(i_f, q_f), _, _ = jax.jit(lambda b: dem.demodulate_fused(b, st))(x[0])
err = float(jnp.max(jnp.abs(i_f - i_s)))
print("parity on TPU, max err:", err)
samples = B * C * N
ts = []
for _ in range(5):
    t0 = time.perf_counter(); float(fn(x)); ts.append(time.perf_counter() - t0)
best = min(ts)
print(f"fused demod: {samples/best/1e9:.2f} GSamp/s (spread {(max(ts)-best)/best*100:.0f}%)")

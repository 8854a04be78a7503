"""Device characterization, floor-aware (re-done in round 2).

Round 1 probed HBM/VPU/MXU with single fixed-size runs and concluded
~18-37 GB/s and ~1/10.6 TFLOP/s. Those numbers were contaminated by what
this round isolated: a **fixed ~35 ms dispatch/fetch floor** per jitted
invocation on this device/tunnel (a 1M-sample run and a 134M-sample run
cost the same wall time). This probe therefore measures every quantity as
a **marginal slope** — time the same program at two work scales and
divide the work delta by the time delta — which cancels the floor, and it
reports the floor itself (the small-size intercept).

Methodology per bench.py: one compiled function per probe whose scalar
checksum is fetched inside the timing window, on-device input generation,
>= 5 passes, best-of.
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

PASSES = 5


def best_time(fn, *args):
    np.asarray(fn(*args))  # compile + first-sync anomaly
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    # --- the floor itself: a near-empty program -------------------------
    tiny = jnp.ones((8, 128), jnp.float32)
    floor = best_time(jax.jit(lambda x: jnp.sum(x)), tiny)
    print(f"fixed dispatch/fetch floor: {floor * 1e3:6.1f} ms")

    # --- HBM read: re-read a 2 GB array R times (a single sum of even
    #     2 GB sits under the floor at >600 GB/s), slope over 2 rep counts
    x2g = jax.jit(lambda k: jax.random.normal(
        k, (2048 * 256 * 1024,), jnp.float32))(jax.random.key(0))
    jax.block_until_ready(x2g)

    def read_probe(reps):
        @jax.jit
        def f(x):
            def body(i, acc):
                # the i-dependent factor must be INSIDE the reduction, or
                # XLA hoists the loop-invariant jnp.sum(x) out of the loop
                w = 1.0 + 1e-9 * i.astype(jnp.float32)
                return acc + jnp.sum(x * w)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return best_time(f, x2g)

    t1, t2 = read_probe(4), read_probe(16)
    rd = 2.0 * (16 - 4) / (t2 - t1)
    print(f"HBM read bandwidth (marginal): {rd:6.1f} GB/s "
          f"(4x2GB {t1 * 1e3:.0f} ms, 16x2GB {t2 * 1e3:.0f} ms)")

    # --- HBM read+write: y = x*c returned as a jit output (must be
    #     materialized) + checksum fetched --------------------------------
    def rw_probe(n_mb):
        x = jax.jit(lambda k: jax.random.normal(
            k, (n_mb * 256 * 1024,), jnp.float32))(jax.random.key(1))
        jax.block_until_ready(x)

        @jax.jit
        def f(x, c):
            y = x * c
            return y, y[-1] + y[0]

        np.asarray(f(x, 1.0001)[1])
        times = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            np.asarray(f(x, 1.0001)[1])
            times.append(time.perf_counter() - t0)
        return min(times)

    t1, t2 = rw_probe(512), rw_probe(2048)
    rw = 2 * (2048 - 512) / 1024 / (t2 - t1)
    print(f"HBM read+write bandwidth (marginal): {rw:6.1f} GB/s "
          f"(512MB {t1 * 1e3:.0f} ms, 2GB {t2 * 1e3:.0f} ms)")

    # --- VPU f32: chained multiply-adds ---------------------------------
    def vpu_probe(reps):
        x = jax.jit(lambda k: jax.random.normal(
            k, (1024, 1024), jnp.float32))(jax.random.key(2))
        jax.block_until_ready(x)

        @jax.jit
        def f(x):
            def body(i, v):
                return v * 1.0000001 + 0.0000001
            y = jax.lax.fori_loop(0, reps, body, x)
            return jnp.sum(y[-1])

        return best_time(f, x)

    t1, t2 = vpu_probe(2000), vpu_probe(8000)
    vpu = 2 * 1024 * 1024 * (8000 - 2000) / (t2 - t1)
    print(f"VPU f32 multiply-add chain (marginal): {vpu / 1e12:6.2f} "
          f"TFLOP/s")

    # --- MXU matmul chain, f32 and bf16 ---------------------------------
    def mxu_probe(reps, dtype):
        n = 4096
        x = jax.jit(lambda k: jax.random.normal(
            k, (n, n), jnp.float32).astype(dtype))(jax.random.key(3))
        w = jax.jit(lambda k: (jax.random.normal(
            k, (n, n), jnp.float32) * (1.0 / n)).astype(dtype))(
                jax.random.key(4))
        jax.block_until_ready((x, w))

        # HIGHEST pins true f32 MXU passes; the default lets XLA compute
        # an "f32" matmul in bf16 (which is what round 1 measured)
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        @jax.jit
        def f(x, w):
            def body(i, v):
                return jnp.dot(v, w, preferred_element_type=dtype,
                               precision=prec)
            y = jax.lax.fori_loop(0, reps, body, x)
            return jnp.sum(y[-1].astype(jnp.float32))

        return best_time(f, x, w)

    for dtype, name, reps in ((jnp.float32, "f32", (8, 32)),
                              (jnp.bfloat16, "bf16", (32, 128))):
        t1, t2 = mxu_probe(reps[0], dtype), mxu_probe(reps[1], dtype)
        fl = 2 * 4096**3 * (reps[1] - reps[0]) / (t2 - t1)
        print(f"MXU {name} 4096-cube matmul chain (marginal): "
              f"{fl / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()

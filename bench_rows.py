"""Measure every end-to-end BENCH.md row in one process (amortizes the
tunnel's one-off first-sync anomaly). Same methodology as bench.py:
device-side scan, on-device checksum, >= 5 passes, best + spread.

Rows: fused flagship (QPSK), fused passband QPSK, fused DMPSK (dqpsk),
fused MSK, staged resampled 16-QAM (config #4), fused MFSK.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

# sitecustomize force-sets jax_platforms="axon,cpu"; an env var alone
# cannot override it — honor BENCH_PLATFORM=cpu via the config API.
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
import jax.numpy as jnp

from modem_tpu import GmskChain, Rates, make_scheme
from modem_tpu.chain import (
    DifferentialChain, FskChain, MskChain, PulseShapedChain,
    qpsk_reference_chain,
)
from modem_tpu.config import TWO_PI
from modem_tpu.models.psk import QPSK
from modem_tpu.models.qam import QAM
from modem_tpu.resampled import ResampledChain

RATES = Rates(1250, 10000)
CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
N_SYMBOLS = int(os.environ.get("BENCH_SYMBOLS", 4096))
# 128 blocks ≈ 1.07 GSamp per pass: enough to amortize the ~35 ms fixed
# dispatch/fetch floor this device shows per jitted run (see BENCH.md)
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 128))
PASSES = 5


def rows():
    yield ("staged flagship QPSK (XLA, lut_map)", 2,
           qpsk_reference_chain(RATES).roundtrip)
    yield ("staged GMSK BT=0.3", 1, GmskChain(RATES, bt=0.3).roundtrip)
    yield ("fused flagship QPSK", 2,
           qpsk_reference_chain(RATES).roundtrip_fused)
    yield ("fused passband QPSK", 2,
           PulseShapedChain(QPSK(0.0, 1.0), RATES,
                            carrier_hz=2000).roundtrip_fused)
    yield ("fused DMPSK (dqpsk)", 2,
           DifferentialChain(make_scheme("dqpsk", RATES),
                             RATES).roundtrip_fused)
    yield ("fused MSK", 2, MskChain(RATES).roundtrip_fused)
    mfsk = make_scheme("mfsk", RATES)
    coefs = 2 * np.arange(16)  # IncreaseMap, `modulate.rs:84`
    yield ("fused MFSK (16-ary)", 4,
           FskChain(mfsk, RATES, coefs,
                    TWO_PI * 50 / 10000).roundtrip_fused)
    yield ("staged resampled 16-QAM 3/2 (cfg #4)", 4,
           ResampledChain(QAM(4, 0.0, 1.0), RATES, 3, 2).roundtrip)
    yield ("fused resampled 16-QAM 3/2 (cfg #4)", 4,
           ResampledChain(QAM(4, 0.0, 1.0), RATES, 3, 2).roundtrip_fused)


def bench(name, bps, roundtrip, n_symbols):
    def run(blocks):
        def body(carry, blk):
            out = roundtrip(blk)
            return carry + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
        # decided + input checksums in ONE fetch (each extra synchronous
        # fetch of a separately-compiled fn pays the tunnel anomaly)
        return jnp.stack([acc, jnp.sum(blocks)])

    fn = jax.jit(run)
    # on-device bit generation: block counts big enough to amortize the
    # ~35 ms fixed dispatch/fetch floor would take minutes to transfer
    blocks = jax.jit(
        lambda k: jax.random.bernoulli(
            k, 0.5, (N_BLOCKS, CHANNELS, n_symbols * bps)
        ).astype(jnp.int32)
    )(jax.random.key(0))
    try:
        vals = np.asarray(fn(blocks))  # compile + first-sync anomaly
        got, expect = int(vals[0]), int(vals[1])
        assert got == expect, f"checksum {got} != {expect} (bit errors)"
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s}  FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    samples = N_BLOCKS * CHANNELS * n_symbols * RATES.samples_per_symbol
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = int(np.asarray(fn(blocks))[0])
        times.append(time.perf_counter() - t0)
    assert got == expect
    best = min(times)
    spread = (max(times) - best) / best
    print(f"{name:42s}  {samples / best / 1e9:6.2f} GSamp/s  "
          f"(spread {spread * 100:3.0f}%)", flush=True)


if __name__ == "__main__":
    only = os.environ.get("ROW")
    for name, bps, fn in rows():
        if only and only not in name:
            continue
        # the staged resampled chain materializes big intermediate
        # waveforms; smaller blocks keep its memory sane (the fused row
        # runs full-size)
        n_sym = 1024 if "staged resampled" in name else N_SYMBOLS
        bench(name, bps, fn, n_sym)

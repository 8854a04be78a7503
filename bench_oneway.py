"""One-way production paths on the chip, floor-amortized (round 2).

The fused loopback (bench.py) never touches HBM with the waveform; the
one-way halves cross HBM exactly once by definition, so their ceiling is
the memory system. Measures, with the corrected methodology (device-side
scan, on-device inputs, single-fetch checksums, block counts sized above
the ~35 ms dispatch floor — see BENCH.md):

* fused TX (symbols -> f32 I/Q waveform) and the int16 passband variant;
* fused RX (waveform -> decided bits), gated bits == input bits;
* fused TX -> HBM -> fused RX pipelines for QPSK, MFSK, MSK, DMPSK
  (the intermediate waveform materializes between the two kernels);
* the staged reference TX (`Modulator.passband`).

Metric: complex waveform samples/s (the BASELINE unit).
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

from modem_tpu import Modulator, Rates, make_scheme
from modem_tpu.chain import (
    DifferentialChain, FskChain, MskChain, PulseShapedChain,
    qpsk_reference_chain,
)
from modem_tpu.config import TWO_PI
from modem_tpu.models.psk import QPSK

RATES = Rates(1250, 10000)
CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
N_SYMBOLS = int(os.environ.get("BENCH_SYMBOLS", 4096))
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 64))
PASSES = 5


def make_bits(bps, n_blocks=N_BLOCKS, n_symbols=N_SYMBOLS):
    return jax.jit(
        lambda k: jax.random.bernoulli(
            k, 0.5, (n_blocks, CHANNELS, n_symbols * bps)
        ).astype(jnp.int8)
    )(jax.random.key(0))


def measure(name, fn, args, samples):
    try:
        vals = np.asarray(fn(*args))
        got, expect = float(vals[0]), float(vals[1])
        assert got == expect, f"checksum {got} != {expect}"
    except Exception as e:  # noqa: BLE001
        print(f"{name:46s}  FAILED: {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = float(np.asarray(fn(*args))[0])
        times.append(time.perf_counter() - t0)
    assert got == expect
    best = min(times)
    spread = (max(times) - best) / best
    print(f"{name:46s}  {samples / best / 1e9:6.2f} GSamp/s  "
          f"(spread {spread * 100:3.0f}%)", flush=True)


def wave_samples(n_blocks=N_BLOCKS, n_symbols=N_SYMBOLS):
    return n_blocks * CHANNELS * n_symbols * RATES.samples_per_symbol


def main():
    chain = qpsk_reference_chain(RATES)
    pass_chain = PulseShapedChain(QPSK(0.0, 1.0), RATES, carrier_hz=2000)
    bits = make_bits(2)

    # --- fused TX halves (checksum = last waveform column; the fetch
    #     proves the work ran; correctness is the parity test suite) ------
    @jax.jit
    def run_tx(bits):
        def body(acc, b):
            i, q = chain.tx_fused(b)
            return acc + jnp.sum(i[..., -1]) + jnp.sum(q[..., -1]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), bits)
        return jnp.stack([acc, acc])

    @jax.jit
    def run_tx_i16(bits):
        def body(acc, b):
            w = pass_chain.tx_fused(b, out_scale=8192.0)
            return acc + jnp.sum(w[..., -1]), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), bits)
        return jnp.stack([acc, acc])

    measure("fused TX (QPSK -> f32 baseband I/Q)", run_tx, (bits,),
            wave_samples())
    measure("fused TX (QPSK -> int16 passband, in-kernel NCO)",
            run_tx_i16, (bits,), wave_samples())

    # --- fused RX half: waveform pre-generated on device ----------------
    rx_blocks = min(N_BLOCKS, 32)  # f32 waveform pairs are 67 MB/block
    rx_bits = make_bits(2, rx_blocks)

    @jax.jit
    def make_wave(bits):
        def body(_, b):
            return 0, chain.tx_fused(b)
        _, (i, q) = jax.lax.scan(body, 0, bits)
        return i, q

    wi, wq = make_wave(rx_bits)
    jax.block_until_ready((wi, wq))

    @jax.jit
    def run_rx(wi, wq, bits):
        def body(acc, xs):
            i, q, b = xs
            out = chain.rx_fused((i, q), N_SYMBOLS)
            return acc + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (wi, wq, bits))
        return jnp.stack([acc, jnp.sum(bits)])

    measure("fused RX (waveform -> decided bits, exact)", run_rx,
            (wi, wq, rx_bits), wave_samples(rx_blocks))

    # --- TX -> HBM -> RX pipelines (waveform materializes between the
    #     kernels), exact-decision gated ---------------------------------
    def pipeline(name, tx, rx, bps, n_blocks=N_BLOCKS):
        pbits = make_bits(bps, n_blocks)

        @jax.jit
        def run(pbits):
            def body(acc, b):
                w = tx(b)
                out = rx(w)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), pbits)
            return jnp.stack([acc, jnp.sum(pbits)])

        measure(name, run, (pbits,), wave_samples(n_blocks))

    pipeline("QPSK  tx_fused -> HBM -> rx_fused (exact)",
             chain.tx_fused, lambda w: chain.rx_fused(w, N_SYMBOLS), 2)

    mfsk = FskChain(make_scheme("mfsk", RATES), RATES,
                    2 * np.arange(16), TWO_PI * 50 / 10000)
    pipeline("MFSK  tx_fused -> HBM -> rx_fused (exact)",
             mfsk.tx_fused, lambda w: mfsk.rx_fused(*w), 4)

    msk = MskChain(RATES)
    pipeline("MSK   tx_fused -> HBM -> rx_fused (exact)",
             msk.tx_fused, lambda w: msk.rx_fused(*w), 2)

    dmpsk = DifferentialChain(make_scheme("dqpsk", RATES), RATES)
    pipeline("DMPSK tx_fused -> HBM -> rx_fused (exact)",
             dmpsk.tx_fused, lambda w: dmpsk.rx_fused(w, N_SYMBOLS), 2)

    # --- staged reference TX (plain XLA Modulator.passband) -------------
    mod = Modulator(make_scheme("qpsk", RATES), RATES, carrier_hz=2000)
    sbits = make_bits(2, 32).astype(jnp.int32)
    st0 = mod.init_state((CHANNELS,))

    @jax.jit
    def run_staged(bits):
        def body(acc, b):
            w, _ = mod.passband(b, st0)
            return acc + jnp.sum(w[..., -1]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), bits)
        return jnp.stack([acc, acc])

    measure("staged Modulator.passband (reference TX)", run_staged,
            (sbits,), wave_samples(32))


if __name__ == "__main__":
    main()

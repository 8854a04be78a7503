"""``demodulate``: LE i16 passband on stdin -> per-sample i/q text on stdout.

Mirrors `/root/reference/src/bin/demodulate.rs`: sample rate 10000 and carrier
900 Hz (`demodulate.rs:10,36`; overridable here), 23-tap Hilbert analytic
front-end, 64-sample PLL acquisition, then the coherent product detector
printing ``i:<v>\\tq:<v>`` per sample (`demodulate.rs:41-43`).

Block-streamed with the RxState pytree carried across blocks.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .. import io as mio
from ..ops.pll import LOCK_SAMPLES
from ..rx import Demodulator

BLOCK_SAMPLES = 1 << 20


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="demodulate",
        description="demodulate i16 LE samples from stdin (demodulate.rs:15-43)",
    )
    p.add_argument("-r", "--sample-rate", type=int, default=10000)
    p.add_argument("-c", "--carrier", type=int, default=900)
    p.add_argument("--block-samples", type=int, default=BLOCK_SAMPLES)
    return p


def run(args, stdin_bytes: bytes, stdout) -> None:
    import jax.numpy as jnp

    demod = Demodulator(args.carrier, args.sample_rate)
    state = demod.init_state()
    x = mio.i16le_to_f32(stdin_bytes)
    if x.size < LOCK_SAMPLES:
        raise SystemExit(f"need at least {LOCK_SAMPLES} samples to lock")
    state = demod.lock_phase(jnp.asarray(x[:LOCK_SAMPLES]), state)
    for start in range(LOCK_SAMPLES, x.size, args.block_samples):
        chunk = jnp.asarray(x[start: start + args.block_samples])
        (i, q), state = demod.demodulate(chunk, state)
        stdout.write(mio.format_iq_text(np.asarray(i), np.asarray(q)))


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    run(args, sys.stdin.buffer.read(), sys.stdout.buffer)


if __name__ == "__main__":
    main()

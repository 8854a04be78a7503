"""``modulate``: ASCII bits on stdin -> LE f32 waveform on stdout.

Mirrors `/root/reference/src/bin/modulate.rs`: flags ``-m`` scheme (required),
``-r`` sample rate (default 10000), ``-b`` baud (default 220), ``-c`` carrier
Hz (default 1000), ``-p`` preamble cycles, ``--iq`` raw-baseband mode
(`modulate.rs:24-30`). Nyquist and preamble-divisibility asserts match
`modulate.rs:62,68`. Output: ``--iq`` writes interleaved (i, q) f32 pairs
(`modulate.rs:109-116`); otherwise the real passband preceded by
``sr/cf*pc - 1`` samples of carrier tone when ``-p`` is given
(`modulate.rs:118-133`).

Processing is block-streamed: bits are consumed in symbol blocks and the
modulator state pytree is carried across blocks, so arbitrarily long streams
run in constant memory with bit-stable phase continuity.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .. import io as mio
from ..config import Rates
from ..models import SCHEME_NAMES, make_scheme
from ..tx import Modulator

BLOCK_SYMBOLS = 1 << 16


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="modulate",
        description="modulate bits from stdin (see modulate.rs:24-30)",
    )
    p.add_argument("-m", "--scheme", required=True, choices=SCHEME_NAMES)
    p.add_argument("-r", "--sample-rate", type=int, default=10000)
    p.add_argument("-b", "--baud-rate", type=int, default=220)
    p.add_argument("-c", "--carrier", type=int, default=1000)
    p.add_argument("-p", "--preamble", type=int, default=0,
                   help="preamble length in carrier cycles")
    p.add_argument("--iq", action="store_true",
                   help="write raw baseband (i, q) pairs, no carrier")
    p.add_argument("--block-symbols", type=int, default=BLOCK_SYMBOLS)
    return p


def run(args, stdin_bytes: bytes, stdout) -> None:
    import jax.numpy as jnp

    rates = Rates(args.baud_rate, args.sample_rate)
    if not args.carrier < args.sample_rate / 2:  # `modulate.rs:68`
        raise SystemExit("carrier must satisfy Nyquist (cf < sr/2)")
    scheme = make_scheme(args.scheme, rates)
    mod = Modulator(scheme, rates, carrier_hz=None if args.iq else args.carrier)
    state = mod.init_state()

    if args.preamble and not args.iq:
        if args.sample_rate % args.carrier != 0:  # `modulate.rs:62`
            raise SystemExit("preamble requires sr % carrier == 0")
        tone, state = mod.preamble(args.preamble, state)
        stdout.write(mio.f32_to_f32le(np.asarray(tone)))

    bits = mio.parse_ascii_bits(stdin_bytes)
    bps = scheme.bits_per_symbol
    n_sym = bits.size // bps  # trailing partial symbol dropped (`data.rs:54-63`)
    bits = bits[: n_sym * bps]

    blk = args.block_symbols * bps
    for start in range(0, n_sym * bps, blk):
        chunk = jnp.asarray(bits[start: start + blk], jnp.int32)
        if args.iq:
            (i, q), state = mod.baseband(chunk, state)
            stdout.write(mio.f32_to_f32le(
                mio.interleave_iq(np.asarray(i), np.asarray(q))))
        else:
            wave, state = mod.passband(chunk, state)
            stdout.write(mio.f32_to_f32le(np.asarray(wave)))


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    run(args, sys.stdin.buffer.read(), sys.stdout.buffer)


if __name__ == "__main__":
    main()

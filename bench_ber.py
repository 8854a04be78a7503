"""Correctness-gate run: the release BER suite as one driver-verifiable JSON.

BASELINE.md's "0 BER at reference SNR" gets the same treatment as
throughput: :func:`modem_tpu.harness.release_gates` runs Monte-Carlo
points against closed-form theory (8-PSK natural-binary AWGN, 16-QAM-gray
AWGN, OFDM QPSK over Rayleigh multipath with ideal CSI) and two coded
waterfalls (RS(255,223) x conv K=7 framed link, QC-LDPC(648,324) layered),
each with explicit pass/fail tolerances. Prints ONE JSON line; the gate
details feed the BENCH.md "correctness gates" table.

Run: python bench_ber.py [--platform cpu|axon] [--scale N] [--seed S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "axon"])
    ap.add_argument("--scale", type=int, default=1,
                    help="multiply Monte-Carlo sample counts")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from modem_tpu.harness import release_gates

    gates = release_gates(seed=args.seed, scale=args.scale)
    n_pass = sum(g["passed"] for g in gates)
    print(json.dumps({
        "metric": "ber_gates_passed",
        "value": n_pass,
        "unit": f"of {len(gates)} gates",
        "vs_baseline": n_pass / len(gates),
        "platform": jax.devices()[0].platform,
        "scale": args.scale,
        "gates": gates,
    }))
    sys.exit(0 if n_pass == len(gates) else 1)


if __name__ == "__main__":
    main()

"""End-to-end coded link throughput: payload bits -> framed/FEC/TX ->
AWGN -> fused RX -> soft FEC decode -> payload bits, on one chip.

The system-level number the subsystem tables only imply: a complete
`FramedLink` (outer code + interleave + scramble + CRC + inner FEC +
pulse-shaped QPSK chain) running its production fused path
(`tx_fused`/`rx_fused`) at an error-free operating point, measured in
INFO bits/s. Every pass checksums the decoded payloads AND requires all
CRC verdicts true on device.

Methodology per BENCH.md: device-side `lax.scan` block loop, on-device
inputs, single-fetch checksums, best of 5 passes, quarter-size marginal.
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

from modem_tpu import Rates
from modem_tpu.chain import qpsk_reference_chain
from modem_tpu.fec import QcLdpc, TurboCode
from modem_tpu.link import FramedLink
from modem_tpu.ops.channel import awgn
from modem_tpu.presets import reference_link

PASSES = 5


def bench(name, link, snr_db, n_frames, n_blocks):
    pb = link.payload_bits
    noise_var = 10.0 ** (-snr_db / 10.0)

    @jax.jit
    def make(k):
        kb = jax.random.split(k, 2)
        payload = jax.random.bernoulli(
            kb[0], 0.5, (n_blocks, n_frames, pb)).astype(jnp.int8)
        return payload

    payload = make(jax.random.key(0))

    @jax.jit
    def run(payload, key):
        def body(carry, xs):
            acc, k = carry
            p = xs.astype(jnp.int32)
            i, q = link.tx_fused(p)
            k, kn = jax.random.split(k)
            ci, cq = awgn(kn, i, q, snr_db)
            got, ok = link.rx_fused((ci, cq), noise_var=noise_var)
            # count only CRC-true payloads; the expected sum requires
            # EVERY frame decoded exactly (error-free operating point)
            acc = acc + jnp.sum(got * ok[..., None].astype(jnp.int32))
            return (acc, k), None
        (acc, _), _ = jax.lax.scan(body, (jnp.int32(0), key), payload)
        return jnp.stack([acc, jnp.sum(payload, dtype=jnp.int32)])

    def timed(pl_):
        key = jax.random.key(1)
        vals = np.asarray(run(pl_, key))
        assert int(vals[0]) == int(vals[1]), \
            f"{name}: frame errors at the operating point"
        best = None
        for _ in range(PASSES):
            t0 = time.perf_counter()
            got = int(np.asarray(run(pl_, key))[0])
            dt = time.perf_counter() - t0
            assert got == int(vals[1])
            best = dt if best is None else min(best, dt)
        return best

    info = n_blocks * n_frames * pb
    best = timed(payload)
    q = max(n_blocks // 4, 1)
    bq = timed(payload[:q])
    marg = (info - q * n_frames * pb) / (best - bq) if best > bq else 0.0
    print(f"{name:58s} {info / best / 1e9:6.3f} Gbit/s info"
          f"  marginal {marg / 1e9:6.3f}", flush=True)


def main():
    rates = Rates(1250, 10000)

    # reference preset: RS(255,223) + interleave + scramble + CRC-32 +
    # conv K=7 inner, the flagship QPSK chain (presets.py:36)
    # 384 frames/block: 512 crashes the XLA TPU compiler (SIGILL in
    # TpuPriorityFusionQueue::NormalizedComputationCost while fusing the
    # scan-wrapped tx_fused+awgn+rx_fused+decode graph — reproduced
    # round 5, frames<=384 compile clean)
    bench("reference link (RS+conv K=7, QPSK RRC chain) @ 2 dB",
          reference_link(), 2.0,
          n_frames=int(os.environ.get("BENCH_LINK_FRAMES", 384)),
          n_blocks=int(os.environ.get("BENCH_LINK_BLOCKS", 96)))

    # LDPC-coded link: 8 x (648,324) blocks per frame
    ldpc = QcLdpc()
    import jax.numpy as _jnp
    link = FramedLink(qpsk_reference_chain(rates),
                      payload_bits=8 * ldpc.k - 16, ldpc=ldpc,
                      ldpc_iters=10, ldpc_msg_dtype=_jnp.bfloat16)
    bench("LDPC(648,324) link, 10-iter layered inner @ 3 dB",
          link, 3.0, n_frames=256, n_blocks=128)

    # turbo-coded link (LTE-shaped)
    turbo = TurboCode(1024)
    tlink = FramedLink(qpsk_reference_chain(rates),
                       payload_bits=2 * turbo.k - 16, turbo=turbo)
    bench("turbo(K=1024) link, fused single-window inner @ 1 dB",
          tlink, 1.0, n_frames=256, n_blocks=48)


if __name__ == "__main__":
    main()

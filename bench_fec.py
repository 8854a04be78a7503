"""FEC subsystem throughput on the chip: Viterbi decode + framing ops.

Same methodology as bench.py (device-side ``lax.scan`` loop, on-device
checksum fetched inside the timing window, >= 5 passes, best + spread).

Rows:
* full-block Viterbi (one long ACS scan) — the latency-optimal form;
* windowed Viterbi (``decode_soft_windowed``) — the throughput form: all
  windows are batch elements of ONE short scan, so the sequential depth
  drops from T to B+2h while the per-step butterfly widens;
* convolutional encode; scramble+CRC framing (GF(2) matmul forms).

Metric: info bits/s through each op (coded bits/s is 2x for rate 1/2).
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

from modem_tpu.fec import ccsds_code, crc16_ccitt, dvb_scrambler

CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
N_DATA = int(os.environ.get("BENCH_DATA_BITS", 4096))
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 4))
PASSES = 5


def bench(name, build, info_bits_per_block):
    fn, blocks, expect = build()
    try:
        fn(blocks).block_until_ready()
        got = int(fn(blocks))
        assert got == expect, f"checksum {got} != {expect}"
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s}  FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = int(fn(blocks))
        times.append(time.perf_counter() - t0)
    assert got == expect
    best = min(times)
    spread = (max(times) - best) / best
    rate = N_BLOCKS * info_bits_per_block / best
    print(f"{name:44s}  {rate / 1e6:8.1f} Mbit/s  "
          f"(spread {spread * 100:3.0f}%)", flush=True)


def _llr_blocks(code, rng):
    bits = rng.integers(0, 2, (N_BLOCKS, CHANNELS, N_DATA)).astype(np.int32)
    c = np.asarray(jax.jit(code.encode)(jnp.asarray(bits)))
    y = 1.0 - 2.0 * c + 0.5 * rng.normal(size=c.shape).astype(np.float32)
    return bits, jnp.asarray(8.0 * y)


def main():
    code = ccsds_code()
    rng = np.random.default_rng(0)

    bits_np, llrs = _llr_blocks(code, rng)
    # at sigma 0.5 (Eb/N0 ~ 9 dB) the decode is error-free: the on-device
    # checksum of decoded bits doubles as the correctness gate.
    expect = int(bits_np.sum())

    def build_full():
        def run(blocks):
            def body(acc, lam):
                return acc + jnp.sum(code.decode_soft(lam)), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
            return acc
        return jax.jit(run), llrs, expect

    def build_windowed(block_steps):
        def run(blocks):
            def body(acc, lam):
                out = code.decode_soft_windowed(lam, block_steps)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
            return acc
        return jax.jit(run), llrs, expect

    bench("Viterbi full-block (T=%d scan)" % (N_DATA + 6), build_full,
          CHANNELS * N_DATA)
    for b in (256, 512, 1024):
        bench(f"Viterbi windowed B={b} h=70", lambda b=b: build_windowed(b),
              CHANNELS * N_DATA)

    enc_bits = jnp.asarray(
        rng.integers(0, 2, (N_BLOCKS, CHANNELS, N_DATA)).astype(np.int32))

    def build_encode():
        def run(blocks):
            def body(acc, b):
                return acc + jnp.sum(code.encode(b)), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
            return acc
        expect_enc = int(jax.jit(
            lambda x: sum(jnp.sum(code.encode(b)) for b in x))(enc_bits))
        return jax.jit(run), enc_bits, expect_enc

    bench("conv encode (rate 1/2, K=7)", build_encode, CHANNELS * N_DATA)

    scr = dvb_scrambler()
    crc = crc16_ccitt()

    def build_framing():
        st = scr.init_state((CHANNELS,))

        def run(blocks):
            def body(acc, b):
                f = crc.append(b)
                s, _ = scr.scramble(f, st)
                return acc + jnp.sum(s), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
            return acc
        expect_f = int(jax.jit(lambda x: sum(
            jnp.sum(scr.scramble(crc.append(b), st)[0]) for b in x))(
                enc_bits))
        return jax.jit(run), enc_bits, expect_f

    bench("framing: CRC-16 append + scramble", build_framing,
          CHANNELS * N_DATA)

    from modem_tpu.fec import rs_255_223

    rs = rs_255_223()
    n_cw = 64  # codewords per block
    rs_msgs = jnp.asarray(
        rng.integers(0, 256, (N_BLOCKS, n_cw, rs.k)).astype(np.int32))
    rs_cw = jax.jit(jax.vmap(rs.encode))(rs_msgs)
    # inject t/2 symbol errors per codeword
    cw_np = np.array(rs_cw)
    for b in range(N_BLOCKS):
        for c in range(n_cw):
            pos = rng.choice(rs.n, rs.t // 2, replace=False)
            for p in pos:
                cw_np[b, c, p] ^= int(rng.integers(1, 256))
    rs_recv = jnp.asarray(cw_np)
    rs_expect = int(rs_msgs.sum())

    def build_rs_enc():
        def run(blocks):
            def body(acc, m):
                return acc + jnp.sum(rs.encode(m)), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
            return acc
        expect = int(jax.jit(
            lambda x: sum(jnp.sum(rs.encode(m)) for m in x))(rs_msgs))
        return jax.jit(run), rs_msgs, expect

    def build_rs_dec():
        def run(blocks):
            def body(acc, r):
                msg, ok = rs.decode(r)
                return acc + jnp.sum(msg * ok[..., None]), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
            return acc
        return jax.jit(run), rs_recv, rs_expect

    rs_info = n_cw * rs.k * 8
    bench("RS(255,223) encode", build_rs_enc, rs_info)
    bench("RS(255,223) decode (8 sym errs/cw)", build_rs_dec, rs_info)


if __name__ == "__main__":
    main()

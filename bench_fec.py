"""FEC subsystem throughput on the chip: Viterbi decode + framing ops.

Same methodology as bench.py: device-side ``lax.scan`` loop, decided AND
expected checksums fetched together through ONE compiled function (each
extra synchronous fetch of a new compile pays the tunnel's first-sync
anomaly), inputs generated on-device (host transfers of GB-scale blocks
through the tunnel take minutes), block counts sized to amortize the
~35 ms fixed dispatch/fetch floor (see BENCH.md), >= 5 passes, best +
spread.

Rows:
* full-block Viterbi (one long ACS scan) — the latency-optimal form;
* windowed Viterbi (``decode_soft_windowed``) — the throughput form: all
  windows are batch elements of ONE short scan, so the sequential depth
  drops from T to B+2h while the per-step butterfly widens;
* convolutional encode; scramble+CRC framing (GF(2) matmul forms);
* Reed-Solomon encode/decode.

Metric: info bits/s through each op (coded bits/s is 2x for rate 1/2).

Round-3 floor correction: at the round-2 geometry several rows' whole
pass sat ON the ~31 ms dispatch/fetch floor (LDPC 8 blocks = 10.6 Mbit
info -> 29 ms/pass at the reported 360 Mbit/s; polar and RS passes ~25 ms;
conv encode 34 ms) — the same round-1 mistake BENCH.md documents for the
flagship. Each family now gets its own block count sized so a pass costs
several x the floor (env-overridable), with int8 bit tensors and bf16 LLR
storage where the working set would otherwise crowd HBM. The checksum
gates are unchanged.
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
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 32))
# per-family block counts: sized so each pass costs several x the ~31 ms
# dispatch floor (see module docstring)
ENC_BLOCKS = int(os.environ.get("BENCH_ENC_BLOCKS", 256))
RS_BLOCKS = int(os.environ.get("BENCH_RS_BLOCKS", 64))
LDPC_BLOCKS = int(os.environ.get("BENCH_LDPC_BLOCKS", 64))
POLAR_BLOCKS = int(os.environ.get("BENCH_POLAR_BLOCKS", 64))
PASSES = 5


def bench(name, fn, args, info_bits_per_block, n_blocks=N_BLOCKS):
    """``fn(*args)`` must return ``stack([decided_sum, expected_sum])``."""
    try:
        vals = np.asarray(fn(*args))  # compile + first-sync anomaly
        got, expect = int(vals[0]), int(vals[1])
        assert got == expect, f"checksum {got} != {expect}"
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s}  FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = int(np.asarray(fn(*args))[0])
        times.append(time.perf_counter() - t0)
    assert got == expect
    best = min(times)
    spread = (max(times) - best) / best
    rate = n_blocks * info_bits_per_block / best
    print(f"{name:44s}  {rate / 1e6:8.1f} Mbit/s  "
          f"(spread {spread * 100:3.0f}%)", flush=True)


def main():
    code = ccsds_code()

    # LLR blocks generated on-device; at sigma 0.5 (Eb/N0 ~ 9 dB) the
    # decode is error-free, so the on-device checksum of decoded bits
    # doubles as the correctness gate against the on-device bit sum.
    @jax.jit
    def make_llrs(k):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(
            kb, 0.5, (N_BLOCKS, CHANNELS, N_DATA)).astype(jnp.int32)
        c = code.encode(bits)
        y = (1.0 - 2.0 * c
             + 0.5 * jax.random.normal(kn, c.shape, jnp.float32))
        return bits, 8.0 * y

    bits, llrs = make_llrs(jax.random.key(0))

    @jax.jit
    def run_full(llrs, bits):
        def body(acc, lam):
            return acc + jnp.sum(code.decode_soft(lam)), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), llrs)
        return jnp.stack([acc, jnp.sum(bits)])

    def make_windowed(block_steps, backend="auto"):
        @jax.jit
        def run(llrs, bits):
            def body(acc, lam):
                out = code.decode_soft_windowed(lam, block_steps,
                                                backend=backend)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), llrs)
            return jnp.stack([acc, jnp.sum(bits)])
        return run

    bench("Viterbi full-block (T=%d scan)" % (N_DATA + 6), run_full,
          (llrs, bits), CHANNELS * N_DATA)
    bench("Viterbi windowed B=512 h=70 (XLA scan)",
          make_windowed(512, "xla"), (llrs, bits), CHANNELS * N_DATA)
    for b in (256, 512, 1024):
        bench(f"Viterbi windowed B={b} h=70 (fused Pallas)",
              make_windowed(b, "pallas"), (llrs, bits), CHANNELS * N_DATA)

    # encode/framing are deterministic transforms whose correctness is
    # covered by the test suite; the duplicated checksum just satisfies
    # the single-fetch shape (the fetch still proves the work ran).
    # They are cheap per block, so they get their own (large) block count
    # and an int8 bit tensor — at the shared 32-block geometry the whole
    # pass sat on the dispatch floor.
    @jax.jit
    def make_enc_bits(k):
        return jax.random.bernoulli(
            k, 0.5, (ENC_BLOCKS, CHANNELS, N_DATA)).astype(jnp.int8)

    enc_bits = make_enc_bits(jax.random.key(7))

    @jax.jit
    def run_encode(bits):
        def body(acc, b):
            return acc + jnp.sum(code.encode(b.astype(jnp.int32))), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), bits)
        return jnp.stack([acc, acc])

    bench("conv encode (rate 1/2, K=7)", run_encode, (enc_bits,),
          CHANNELS * N_DATA, n_blocks=ENC_BLOCKS)

    scr = dvb_scrambler()
    crc = crc16_ccitt()
    st = scr.init_state((CHANNELS,))

    @jax.jit
    def run_framing(bits):
        def body(acc, b):
            f = crc.append(b.astype(jnp.int32))
            s, _ = scr.scramble(f, st)
            return acc + jnp.sum(s), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), bits)
        return jnp.stack([acc, acc])

    bench("framing: CRC-16 append + scramble", run_framing, (enc_bits,),
          CHANNELS * N_DATA, n_blocks=ENC_BLOCKS)

    from modem_tpu.fec import rs_255_223

    rs = rs_255_223()
    n_cw = int(os.environ.get("BENCH_RS_CODEWORDS", 512))
    rs_blocks = RS_BLOCKS

    @jax.jit
    def make_rs(k):
        km, kp, kv = jax.random.split(k, 3)
        msgs = jax.random.randint(
            km, (rs_blocks, n_cw, rs.k), 0, 256, jnp.int32)
        cw = jax.vmap(jax.vmap(rs.encode))(msgs)
        # inject t/2 distinct-position symbol errors per codeword
        def corrupt(c, kp, kv):
            pos = jax.random.permutation(kp, rs.n)[: rs.t // 2]
            val = jax.random.randint(kv, (rs.t // 2,), 1, 256, jnp.int32)
            e = jnp.zeros(rs.n, jnp.int32).at[pos].set(val)
            return c ^ e
        kps = jax.random.split(kp, rs_blocks * n_cw)
        kvs = jax.random.split(kv, rs_blocks * n_cw)
        recv = jax.vmap(corrupt)(
            cw.reshape(rs_blocks * n_cw, rs.n), kps, kvs
        ).reshape(rs_blocks, n_cw, rs.n)
        return msgs, recv

    rs_msgs, rs_recv = make_rs(jax.random.key(1))

    @jax.jit
    def run_rs_enc(msgs):
        def body(acc, m):
            return acc + jnp.sum(rs.encode(m)), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), msgs)
        return jnp.stack([acc, acc])

    @jax.jit
    def run_rs_dec(recv, msgs):
        def body(acc, r):
            msg, ok = rs.decode(r)
            return acc + jnp.sum(msg * ok[..., None]), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), recv)
        return jnp.stack([acc, jnp.sum(msgs)])

    rs_info = n_cw * rs.k * 8
    bench("RS(255,223) encode", run_rs_enc, (rs_msgs,), rs_info,
          n_blocks=rs_blocks)
    bench(f"RS(255,223) decode (8 errs/cw, {n_cw} cw/blk)", run_rs_dec,
          (rs_recv, rs_msgs), rs_info, n_blocks=rs_blocks)

    # ---- QC-LDPC (648, 324): min-sum iterations as one lax.scan ----
    # Batch width 4096 is the measured sweet spot: the per-edge message
    # working set stays VMEM-resident (wider spills to HBM and halves the
    # rate; narrower sits on the dispatch floor).
    from modem_tpu.fec import QcLdpc

    ldpc = QcLdpc()
    ldpc_ch = int(os.environ.get("BENCH_LDPC_CHANNELS", 4096))
    ldpc_blocks = LDPC_BLOCKS

    @jax.jit
    def make_ldpc(k):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(
            kb, 0.5, (ldpc_blocks, ldpc_ch, ldpc.k)).astype(jnp.int8)
        c = ldpc.encode(bits.astype(jnp.int32))
        # sigma 0.35 ~ Eb/N0 7 dB: deep in the error-free region, so the
        # decoded checksum doubles as the correctness gate. bf16 channel
        # LLR *storage* (64 blocks of f32 would crowd HBM) — the decoder
        # computes in f32; bf16 input quantization is far below min-sum's
        # sensitivity (the stored-bf16-message variant is BER-tested).
        y = (1.0 - 2.0 * c
             + 0.35 * jax.random.normal(kn, c.shape, jnp.float32))
        return bits, (2.0 * y / (0.35 * 0.35)).astype(jnp.bfloat16)

    ldpc_bits, ldpc_llrs = make_ldpc(jax.random.key(2))

    @jax.jit
    def run_ldpc_enc(bits):
        def body(acc, b):
            return acc + jnp.sum(ldpc.encode(b.astype(jnp.int32))), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), bits)
        return jnp.stack([acc, acc])

    def make_ldpc_dec(iters, schedule="flooding", msg_dtype=None,
                      early_exit=False):
        @jax.jit
        def run(llrs, bits):
            def body(acc, lam):
                out = ldpc.decode(lam, iters=iters, schedule=schedule,
                                  msg_dtype=msg_dtype,
                                  early_exit=early_exit)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), llrs)
            return jnp.stack([acc, jnp.sum(bits, dtype=jnp.int32)])
        return run

    ldpc_info = ldpc_ch * ldpc.k
    bench("LDPC(648,324) encode (prefix-XOR)", run_ldpc_enc, (ldpc_bits,),
          ldpc_info, n_blocks=ldpc_blocks)
    for it in (10, 25):
        bench(f"LDPC(648,324) flooding decode, {it} iters",
              make_ldpc_dec(it), (ldpc_llrs, ldpc_bits), ldpc_info,
              n_blocks=ldpc_blocks)
    # layered converges ~2x faster: 5 layered iterations are the
    # BER-equivalent of the 10-iteration flooding row above
    for it, mdt, ee, tag in (
            (5, None, False, "layered f32, 5 iters"),
            (5, jnp.bfloat16, False, "layered bf16, 5 iters"),
            (10, jnp.bfloat16, True, "layered bf16, early-exit cap 10"),
    ):
        bench(f"LDPC(648,324) {tag}",
              make_ldpc_dec(it, "layered", mdt, ee),
              (ldpc_llrs, ldpc_bits), ldpc_info, n_blocks=ldpc_blocks)

    # ---- Polar (256, 128): batched SC tree (round 3) ----
    from modem_tpu.fec import PolarCode

    polar = PolarCode(256, 128)
    pol_ch = int(os.environ.get("BENCH_POLAR_CHANNELS", 4096))
    pol_blocks = POLAR_BLOCKS

    @jax.jit
    def make_polar(k):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(
            kb, 0.5, (pol_blocks, pol_ch, polar.k)).astype(jnp.int8)
        c = polar.encode(bits.astype(jnp.int32))
        y = (1.0 - 2.0 * c
             + 0.3 * jax.random.normal(kn, c.shape, jnp.float32))
        return bits, (2.0 * y / (0.3 * 0.3)).astype(jnp.bfloat16)

    pol_bits, pol_llrs = make_polar(jax.random.key(3))

    @jax.jit
    def run_polar_enc(bits):
        def body(acc, b):
            return acc + jnp.sum(polar.encode(b.astype(jnp.int32))), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), bits)
        return jnp.stack([acc, acc])

    @jax.jit
    def run_polar_dec(llrs, bits):
        def body(acc, lam):
            return acc + jnp.sum(polar.decode(lam)), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), llrs)
        return jnp.stack([acc, jnp.sum(bits, dtype=jnp.int32)])

    pol_info = pol_ch * polar.k
    bench("Polar(256,128) encode (butterfly)", run_polar_enc,
          (pol_bits,), pol_info, n_blocks=pol_blocks)
    bench("Polar(256,128) SC decode", run_polar_dec,
          (pol_llrs, pol_bits), pol_info, n_blocks=pol_blocks)

    # ---- CRC-aided SCL-8 (round 3): ~list_size x the SC work ----
    crc = crc16_ccitt()
    # 64 blocks: at 16 the fused-kernel pass (~49 ms) is still ~1.6x the
    # dispatch floor; 64 amortizes it (117 ms/pass, spread 2%)
    scl_blocks = int(os.environ.get("BENCH_POLAR_SCL_BLOCKS", 64))
    scl_list = int(os.environ.get("BENCH_POLAR_LIST", 8))
    # "auto" = the fused hybrid kernel (ops/pallas_scl.py, kernel_w=128)
    # on the chip; "xla" recovers the traced-tree row. Do NOT pass
    # kernel_w=256 geometry here: the full-tree Mosaic compile is
    # unpredictable and once wedged the shared tunnel server-side
    # (BENCH.md "Fused Pallas CA-SCL" section).
    scl_backend = os.environ.get("BENCH_POLAR_SCL_BACKEND", "auto")

    @jax.jit
    def make_scl(k):
        kb, kn = jax.random.split(k)
        data = jax.random.bernoulli(
            kb, 0.5, (scl_blocks, pol_ch, polar.k - crc.w)
        ).astype(jnp.int32)
        framed = crc.append(data)
        c = polar.encode(framed)
        y = (1.0 - 2.0 * c
             + 0.3 * jax.random.normal(kn, c.shape, jnp.float32))
        return framed.astype(jnp.int8), (
            2.0 * y / (0.3 * 0.3)).astype(jnp.bfloat16)

    scl_bits, scl_llrs = make_scl(jax.random.key(4))

    @jax.jit
    def run_scl(llrs, bits):
        def body(acc, lam):
            out = polar.decode_list(lam, scl_list, crc=crc,
                                    backend=scl_backend)
            return acc + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), llrs)
        return jnp.stack([acc, jnp.sum(bits, dtype=jnp.int32)])

    bench(f"Polar(256,128) CA-SCL-{scl_list} decode (CRC-16)", run_scl,
          (scl_llrs, scl_bits), pol_ch * polar.k, n_blocks=scl_blocks)

    # ---- BCH(255,191) t=8: GF(2)-matmul encode/syndromes + BM scan ----
    from modem_tpu.fec import bch_255_191

    bch = bch_255_191()
    # 128 blocks: the round-3 capture at 64 had 43-90% spreads — pass
    # cost ~50-90 ms rode the device's between-pass variance band
    bch_cw = int(os.environ.get("BENCH_BCH_CODEWORDS", 2048))
    bch_blocks = int(os.environ.get("BENCH_BCH_BLOCKS", 128))

    @jax.jit
    def make_bch(k):
        kb, kp = jax.random.split(k)
        bits = jax.random.bernoulli(
            kb, 0.5, (bch_blocks, bch_cw, bch.k)).astype(jnp.int8)
        cw = bch.encode(bits.astype(jnp.int32))
        # flip t/2 = 4 random bit positions per codeword
        scores = jax.random.uniform(kp, cw.shape)
        thresh = jnp.sort(scores, axis=-1)[..., 3:4]
        return bits, cw ^ (scores <= thresh).astype(jnp.int32)

    bch_bits, bch_recv = make_bch(jax.random.key(6))

    @jax.jit
    def run_bch_enc(bits):
        def body(acc, b):
            return acc + jnp.sum(bch.encode(b.astype(jnp.int32))), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), bits)
        return jnp.stack([acc, acc])

    @jax.jit
    def run_bch_dec(recv, bits):
        def body(acc, r):
            msg, ok = bch.decode(r)
            return acc + jnp.sum(msg * ok[..., None]), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), recv)
        return jnp.stack([acc, jnp.sum(bits, dtype=jnp.int32)])

    bch_info = bch_cw * bch.k
    bench("BCH(255,191) encode", run_bch_enc, (bch_bits,), bch_info,
          n_blocks=bch_blocks)
    bench(f"BCH(255,191) decode (4 errs/cw, {bch_cw} cw/blk)",
          run_bch_dec, (bch_recv, bch_bits), bch_info,
          n_blocks=bch_blocks)

    # ---- Turbo (LTE-shaped, K=1024, rate 1/3): max-log BCJR scans ----
    from modem_tpu.fec import TurboCode

    turbo = TurboCode(1024)
    tb_ch = int(os.environ.get("BENCH_TURBO_CHANNELS", 512))
    tb_blocks = int(os.environ.get("BENCH_TURBO_BLOCKS", 16))
    tb_iters = int(os.environ.get("BENCH_TURBO_ITERS", 6))

    @jax.jit
    def make_turbo(k):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(
            kb, 0.5, (tb_blocks, tb_ch, turbo.k)).astype(jnp.int8)
        c = turbo.encode(bits.astype(jnp.int32))
        # sigma 0.6 ~ Eb/N0 3.6 dB at rate 1/3: error-free region
        y = (1.0 - 2.0 * c
             + 0.6 * jax.random.normal(kn, c.shape, jnp.float32))
        return bits, (2.0 * y / (0.6 * 0.6)).astype(jnp.bfloat16)

    tb_bits, tb_llrs = make_turbo(jax.random.key(5))

    def make_turbo_dec(backend, window=None, early_exit=False):
        @jax.jit
        def run(llrs, bits):
            def body(acc, lam):
                out = turbo.decode(lam, iters=tb_iters, window=window,
                                   backend=backend, early_exit=early_exit)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), llrs)
            return jnp.stack([acc, jnp.sum(bits, dtype=jnp.int32)])
        return run

    bench(f"Turbo(K=1024, r=1/3) max-log, {tb_iters} iters (XLA scans)",
          make_turbo_dec("xla"), (tb_llrs, tb_bits), tb_ch * turbo.k,
          n_blocks=tb_blocks)
    bench(f"Turbo(K=1024, r=1/3) max-log, {tb_iters} iters "
          "(fused Pallas BCJR, W=256 legacy)",
          make_turbo_dec("pallas", 256), (tb_llrs, tb_bits),
          tb_ch * turbo.k, n_blocks=tb_blocks)
    # window=None = the round-5 auto geometry: ONE window covering the
    # whole trellis (exact full-block BCJR, ~1.5x fewer steps)
    bench(f"Turbo(K=1024, r=1/3) {tb_iters} iters "
          "(fused, single-window auto)",
          make_turbo_dec("pallas"), (tb_llrs, tb_bits),
          tb_ch * turbo.k, n_blocks=tb_blocks)
    bench(f"Turbo(K=1024, r=1/3) fused auto + early exit, cap {tb_iters}",
          make_turbo_dec("pallas", None, True), (tb_llrs, tb_bits),
          tb_ch * turbo.k, n_blocks=tb_blocks)


if __name__ == "__main__":
    main()

"""Sustained streaming throughput vs the one-shot fused rate (VERDICT r4
item 4).

The streaming classes (`modem_tpu/streaming.py`, `fec/conv.StreamingViterbi`)
carry an explicit state pytree between fixed-size pushes. Two distinct
overheads could eat the fused kernels' advantage:

1. **state-carry overhead** — the per-chunk halo/tail re-compute and the
   carry threading itself. Measured here by running the SAME per-push
   update as a device-side ``lax.scan`` over chunks (state threaded as
   the scan carry, bit-identical math to `StreamingFusedTx/Rx.push` with
   a warm carry), so the environment's per-dispatch cost is out of the
   picture. This is the number that transfers to any deployment.
2. **per-push dispatch cost** — every `push()` is a separate jitted
   call, and THIS environment charges ~25-31 ms per call (the BENCH.md
   dispatch/fetch floor), which swamps millisecond-scale chunks. The
   host-loop rows quantify that: they are an environment statement, not
   a kernel one (a local PCIe/ICI-attached chip dispatches in ~100 us).

Methodology per BENCH.md: on-device inputs, device-side pass loops,
single-fetch checksums, best of 5 passes.
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
from modem_tpu.utils.bits import pack_bits

RATES = Rates(1250, 10000)
CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
PASSES = 5
chain = qpsk_reference_chain(RATES)
SPS = RATES.samples_per_symbol
SPAN = chain.span


def timed(fn, args, expect):
    vals = np.asarray(fn(*args))
    got = float(vals[0])
    assert got == float(expect if expect is not None else vals[1]), \
        (got, expect, float(vals[1]))
    best = None
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got2 = float(np.asarray(fn(*args))[0])
        dt = time.perf_counter() - t0
        assert got2 == got
        best = dt if best is None else min(best, dt)
    return best


def report(name, samples, dt, ref=None):
    rate = samples / dt
    line = f"{name:56s} {rate / 1e9:6.2f} GSamp/s"
    if ref:
        line += f"  ({100 * rate / ref:3.0f}% of one-shot)"
    print(line, flush=True)
    return rate


def main():
    lut, qp = chain._txrx_params()
    rrc = np.asarray(chain.rrc)

    # ---- reference: one-shot fused TX / RX at the BENCH.md geometry ----
    n_sym, blocks = 4096, 256
    bits = jax.jit(lambda k: jax.random.bernoulli(
        k, 0.5, (blocks, CHANNELS, n_sym * 2)).astype(jnp.int8)
    )(jax.random.key(0))

    @jax.jit
    def run_oneshot_tx(bits):
        def body(acc, b):
            i, q = chain.tx_fused(b)
            return acc + jnp.sum(i[..., -1]) + jnp.sum(q[..., -1]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), bits)
        return jnp.stack([acc, acc])

    samples = blocks * CHANNELS * n_sym * SPS
    dt = timed(run_oneshot_tx, (bits,), None)
    tx_ref = report("one-shot fused TX (4096-sym blocks)", samples, dt)

    # ---- device-scan streaming TX: same update as StreamingFusedTx.push
    #      (warm carry), chunked at L symbols ----
    from modem_tpu.ops.pallas_txrx import fused_tx

    def make_stream_tx(chunk_sym, n_chunks):
        sbits = jax.jit(lambda k: jax.random.bernoulli(
            k, 0.5, (n_chunks, CHANNELS, chunk_sym * 2)).astype(jnp.int8)
        )(jax.random.key(1))

        @jax.jit
        def run(sbits):
            def push(carry, b):
                tail, seen, acc = carry
                syms = pack_bits(b, 2)
                ext = jnp.concatenate([tail, syms], axis=-1)
                wi, wq = fused_tx(ext, lut, rrc, SPS, SPAN,
                                  sym_offset=seen - SPAN, qam_params=qp)
                hi = (SPAN + chunk_sym) * SPS
                acc = acc + jnp.sum(wi[..., hi - 1]) + jnp.sum(wq[..., hi - 1])
                return (ext[..., chunk_sym:], seen + chunk_sym, acc), None

            tail0 = jnp.zeros((CHANNELS, SPAN), jnp.int32)
            (_, _, acc), _ = jax.lax.scan(
                push, (tail0, jnp.int32(SPAN), jnp.float32(0)), sbits)
            return jnp.stack([acc, acc])

        return run, sbits, n_chunks * CHANNELS * chunk_sym * SPS

    for chunk_sym, n_chunks in ((512, 2048), (256, 4096), (4096, 256)):
        run, sbits, s = make_stream_tx(chunk_sym, n_chunks)
        dt = timed(run, (sbits,), None)
        report(f"device-scan streaming TX, {chunk_sym}-sym chunks", s, dt,
               tx_ref)

    # ---- one-shot fused RX reference ----
    rx_blocks = 128
    rx_bits = bits[:rx_blocks]

    @jax.jit
    def make_wave(bits):
        def body(_, b):
            return 0, chain.tx_fused(b)
        _, (i, q) = jax.lax.scan(body, 0, bits)
        return i, q

    wi, wq = make_wave(rx_bits)
    jax.block_until_ready((wi, wq))

    @jax.jit
    def run_oneshot_rx(wi, wq, bits):
        def body(acc, xs):
            i, q, b = xs
            return acc + jnp.sum(chain.rx_fused((i, q), n_sym)), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (wi, wq, bits))
        return jnp.stack([acc, jnp.sum(bits)])

    s = rx_blocks * CHANNELS * n_sym * SPS
    dt = timed(run_oneshot_rx, (wi, wq, rx_bits), None)
    rx_ref = report("one-shot fused RX (exact)", s, dt)
    del wi, wq

    # ---- device-scan streaming RX: StreamingFusedRx.push update with a
    #      warm carry (skip == 0), decisions checksummed exactly ----
    from modem_tpu.ops.pallas_txrx import fused_rx

    def make_stream_rx(chunk_sym, n_chunks):
        sbits = jax.jit(lambda k: jax.random.bernoulli(
            k, 0.5, (n_chunks, CHANNELS, chunk_sym * 2)).astype(jnp.int8)
        )(jax.random.key(2))

        @jax.jit
        def make_stream_wave(sbits):
            # a contiguous TX stream chunked at the same size: chunk i's
            # waveform interior is produced with the TX carry
            def tx_push(carry, b):
                tail, seen = carry
                syms = pack_bits(b, 2)
                ext = jnp.concatenate([tail, syms], axis=-1)
                wi_, wq_ = fused_tx(ext, lut, rrc, SPS, SPAN,
                                    sym_offset=seen - SPAN, qam_params=qp)
                lo, hi = SPAN * SPS, (SPAN + chunk_sym) * SPS
                return ((ext[..., chunk_sym:], seen + chunk_sym),
                        (wi_[..., lo:hi], wq_[..., lo:hi]))

            tail0 = jnp.zeros((CHANNELS, SPAN), jnp.int32)
            _, (swi, swq) = jax.lax.scan(
                tx_push, (tail0, jnp.int32(SPAN)), sbits)
            return swi, swq

        swi, swq = make_stream_wave(sbits)
        jax.block_until_ready((swi, swq))

        @jax.jit
        def run(swi, swq, sbits):
            def push(carry, xs):
                ti, tq, seen, acc = carry
                i, q, b = xs
                ei = jnp.concatenate([ti, i], axis=-1)
                eq = jnp.concatenate([tq, q], axis=-1)
                dec = fused_rx((ei, eq), chunk_sym, lut, rrc, SPS, SPAN,
                               sym_offset=seen // SPS - SPAN, qam_params=qp)
                d = SPAN * SPS
                # warm carry -> every decision is final (skip = 0); the
                # first SPAN symbols of the stream are flushed at the end
                # (not measured: constant tail work)
                acc = acc + jnp.sum(dec)
                return (ei[..., ei.shape[-1] - d:],
                        eq[..., eq.shape[-1] - d:],
                        seen + chunk_sym * SPS, acc), None

            d = SPAN * SPS
            t0i = jnp.zeros((CHANNELS, d), jnp.float32)
            t0q = jnp.zeros((CHANNELS, d), jnp.float32)
            (_, _, _, acc), _ = jax.lax.scan(
                push, (t0i, t0q, jnp.int32(d), jnp.int32(0)), (swi, swq, sbits))
            return jnp.stack([acc, acc])

        return run, (swi, swq, sbits), n_chunks * CHANNELS * chunk_sym * SPS

    for chunk_sym, n_chunks in ((512, 1024), (4096, 128)):
        run, args, s = make_stream_rx(chunk_sym, n_chunks)
        dt = timed(run, args, None)
        report(f"device-scan streaming RX, {chunk_sym}-sym chunks", s, dt,
               rx_ref)
        del args

    # ---- host-driven push loop (the environment's per-dispatch floor) --
    from modem_tpu.streaming import StreamingFusedTx

    for chunk_sym, n_push in ((512, 16), (4096, 16)):
        tx = StreamingFusedTx(chain, batch_shape=(CHANNELS,))
        pbits = jax.jit(lambda k: jax.random.bernoulli(
            k, 0.5, (n_push, CHANNELS, chunk_sym * 2)).astype(jnp.int32)
        )(jax.random.key(3))
        jax.block_until_ready(pbits)
        outs = [tx.push(pbits[i]) for i in range(2)]  # warm compile
        jax.block_until_ready(outs[-1])
        t0 = time.perf_counter()
        o = None
        for i in range(n_push):
            o = tx.push(pbits[i])
        jax.block_until_ready(o)
        dt = time.perf_counter() - t0
        report(f"host push-loop TX, {chunk_sym}-sym pushes "
               f"(~31 ms/dispatch env floor)",
               n_push * CHANNELS * chunk_sym * SPS, dt, tx_ref)

    # ---- StreamingViterbi: device-scan push vs one-shot windowed ------
    from modem_tpu.fec import ccsds_code
    from modem_tpu.ops.pallas_viterbi import viterbi_decode_windows

    code = ccsds_code()
    n_data, vb = 4096, 512

    @jax.jit
    def make_llrs(k):
        kb, kn = jax.random.split(k)
        b = jax.random.bernoulli(kb, 0.5, (8, CHANNELS, n_data)).astype(
            jnp.int32)
        c = code.encode(b)
        y = 1.0 - 2.0 * c + 0.5 * jax.random.normal(kn, c.shape, jnp.float32)
        return b, 8.0 * y

    vbits, vllrs = make_llrs(jax.random.key(4))

    @jax.jit
    def run_vit_oneshot(llrs, bits):
        def body(acc, lam):
            out = code.decode_soft_windowed(lam, vb)
            return acc + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), llrs)
        return jnp.stack([acc, jnp.sum(bits)])

    s = 8 * CHANNELS * n_data
    dt = timed(run_vit_oneshot, (vllrs, vbits), None)
    vit_ref = s / dt
    print(f"{'one-shot windowed Viterbi B=512':56s} "
          f"{vit_ref / 1e6:6.0f} Mbit/s", flush=True)

    # device-scan of StreamingViterbi.push updates (warm state): each
    # step decodes the PREVIOUS block with the new block as right context
    h = 10 * code.k

    @jax.jit
    def run_vit_stream(llrs, bits):
        # drop the K-1 termination steps: the stream probe pushes an even
        # number of B-step blocks (checksum is self-consistent, not a
        # decode-correctness gate — that's run_vit_oneshot's job)
        steps = llrs.reshape(8, CHANNELS, n_data + code.k - 1, code.n)
        lam = jnp.moveaxis(
            steps[:, :, :n_data, :].reshape(
                8, CHANNELS, n_data // vb, vb, code.n),
            2, 0).reshape(n_data // vb, 8 * CHANNELS, vb, code.n)

        def push(carry, lam_b):
            pretail, prev, acc = carry
            win = jnp.concatenate([pretail, prev, lam_b[:, :h]], axis=-2)
            bits_w = viterbi_decode_windows(code, win, jnp.float32(0.0))
            acc = acc + jnp.sum(bits_w[..., h:h + vb])
            return (prev[:, prev.shape[1] - h:], lam_b, acc), None

        pre0 = jnp.full((8 * CHANNELS, h, code.n), 8.0)
        prev0 = lam[0]
        (_, _, acc), _ = jax.lax.scan(
            push, (pre0, prev0, jnp.int32(0)), lam[1:])
        return jnp.stack([acc, acc])

    dt = timed(run_vit_stream, (vllrs, vbits), None)
    s_stream = (n_data // vb - 1) * 8 * CHANNELS * vb
    rate = s_stream / dt
    print(f"{'device-scan StreamingViterbi push (B=512)':56s} "
          f"{rate / 1e6:6.0f} Mbit/s  ({100 * rate / vit_ref:3.0f}% of "
          "one-shot)", flush=True)


if __name__ == "__main__":
    main()

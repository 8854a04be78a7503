"""Plateau ablation for the fused chain kernel (VERDICT round-1 item #5).

Probes per-tile-overhead levers on the real chip, all with the device-side
scan + checksum methodology: grid dimension_semantics (cross-tile DMA
pipelining), lane-block width (tiles per dispatch), and time-tile height.
Prints one line per variant; meant for interactive perf work, not CI.
"""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modem_tpu.chain import qpsk_reference_chain
from modem_tpu.config import Rates
from modem_tpu.ops.fir import _as_f32
from modem_tpu.ops.pallas_chain import HALO_ROWS, _chain_kernel
from modem_tpu.ops.polyphase import _phase_bank

RATES = Rates(1250, 10000)
CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
N_SYMBOLS = int(os.environ.get("BENCH_SYMBOLS", 4096))
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 16))
PASSES = 5


def _chain_kernel_bf16(
    *refs, mparams, bank, taps, sps, span, cs, k_real,
):
    """bf16-arithmetic variant of the fused kernel (QPSK margins tolerate
    bf16's 8-bit mantissa easily): map/interp/matched-filter accumulate in
    bf16, final slice in f32."""
    import jax.numpy as jnp
    from jax import lax

    prev_ref, curr_ref, next_ref, o_ref = refs
    kp = len(bank[0])
    ext_l, ext_r = span, span + 1
    t = pl.program_id(1)
    syms = jnp.concatenate(
        [prev_ref[HALO_ROWS - ext_l:, :], curr_ref[:, :], next_ref[:ext_r, :]],
        axis=0,
    ).astype(jnp.int32)
    rows = lax.broadcasted_iota(jnp.int32, syms.shape, 0)
    g = t * cs + rows - ext_l
    valid = (g >= 0) & (g < k_real) & (syms >= 0)
    zi = jnp.zeros(syms.shape, jnp.bfloat16)
    zq = jnp.zeros(syms.shape, jnp.bfloat16)
    for m, (ci, cq) in enumerate(mparams):
        hit = valid & (syms == m)
        zi = jnp.where(hit, jnp.bfloat16(ci), zi)
        zq = jnp.where(hit, jnp.bfloat16(cq), zq)
    n8 = cs + span + 1
    d = span * sps
    by_phase = [[] for _ in range(sps)]
    for j in range(len(taps)):
        a = d - j
        by_phase[a % sps].append((j, a // sps))
    acc_i = jnp.zeros((cs, zi.shape[1]), jnp.float32)
    acc_q = jnp.zeros((cs, zi.shape[1]), jnp.float32)
    for p in range(sps):
        ai = jnp.zeros((n8, zi.shape[1]), jnp.bfloat16)
        aq = jnp.zeros((n8, zi.shape[1]), jnp.bfloat16)
        for k in range(kp):
            b = bank[p][k]
            if b == 0.0:
                continue
            sl = slice(ext_l - k, ext_l - k + n8)
            ai = ai + jnp.bfloat16(b) * zi[sl, :]
            aq = aq + jnp.bfloat16(b) * zq[sl, :]
        for j, q in by_phase[p]:
            acc_i = acc_i + (jnp.bfloat16(taps[j])
                             * ai[q: q + cs, :]).astype(jnp.float32)
            acc_q = acc_q + (jnp.bfloat16(taps[j])
                             * aq[q: q + cs, :]).astype(jnp.float32)
    best = jnp.zeros(acc_i.shape, jnp.int32)
    best_d = jnp.full(acc_i.shape, np.inf, jnp.float32)
    for m, (ci, cq) in enumerate(mparams):
        dist = (acc_i - ci) ** 2 + (acc_q - cq) ** 2
        best = jnp.where(dist < best_d, m, best)
        best_d = jnp.minimum(dist, best_d)
    o_ref[:, :] = best.astype(o_ref.dtype)


def build_variant(lane, cs, dimsem, chain, bf16=False):
    taps = _as_f32(chain.rrc)
    bank = tuple(tuple(float(v) for v in row)
                 for row in _phase_bank(taps, chain.sps))
    taps_t = tuple(float(v) for v in taps)
    mparams = tuple((float(i), float(q)) for i, q in chain.lut)

    @functools.partial(jax.jit, static_argnames=("k_real",))
    def run(syms, k_real):
        k_pad, c = syms.shape
        hb = HALO_ROWS
        n_halo = k_pad // hb
        r = cs // hb
        grid = (c // lane, k_pad // cs)
        curr = pl.BlockSpec((cs, lane), lambda ci, t: (t, ci),
                            memory_space=pltpu.VMEM)
        prev = pl.BlockSpec(
            (hb, lane), lambda ci, t: (jnp.clip(t * r - 1, 0, n_halo - 1), ci),
            memory_space=pltpu.VMEM)
        nxt = pl.BlockSpec(
            (hb, lane), lambda ci, t: (jnp.clip((t + 1) * r, 0, n_halo - 1), ci),
            memory_space=pltpu.VMEM)
        params = {}
        if dimsem is not None:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=dimsem)
        if bf16:
            kern = functools.partial(
                _chain_kernel_bf16, mparams=mparams, bank=bank,
                taps=taps_t, sps=chain.sps, span=chain.span, cs=cs,
                k_real=k_real,
            )
        else:
            kern = functools.partial(
                _chain_kernel, mode="lut", mparams=mparams, bank=bank,
                taps=taps_t, sps=chain.sps, span=chain.span, cs=cs,
                k_real=k_real, sigma=None, carrier=None,
            )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((k_pad, c), syms.dtype),
            grid=grid,
            in_specs=[prev, curr, nxt],
            out_specs=pl.BlockSpec((cs, lane), lambda ci, t: (t, ci),
                                   memory_space=pltpu.VMEM),
            **params,
        )(syms, syms, syms)

    return run


def bench_variant(name, lane, cs, dimsem, bf16=False):
    chain = qpsk_reference_chain(RATES)
    rng = np.random.default_rng(0)
    syms_np = rng.integers(0, 4, (N_BLOCKS, N_SYMBOLS, CHANNELS)).astype(np.int8)
    syms = jax.device_put(jnp.asarray(syms_np))
    jax.block_until_ready(syms)
    runner = build_variant(lane, cs, dimsem, chain, bf16)

    def scan_all(blocks):
        def body(carry, blk):
            out = runner(blk, N_SYMBOLS)
            return carry + jnp.sum(out.astype(jnp.int32)), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), blocks)
        return acc

    fn = jax.jit(scan_all)
    try:
        fn(syms).block_until_ready()
        expect = int(syms_np.astype(np.int64).sum())
        got = int(fn(syms))  # absorb first-sync anomaly
        assert got == expect, (got, expect)
    except Exception as e:  # noqa: BLE001 - report and continue the sweep
        print(f"{name:40s}  FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    samples = N_BLOCKS * N_SYMBOLS * CHANNELS * RATES.samples_per_symbol
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        got = int(fn(syms))
        times.append(time.perf_counter() - t0)
    assert got == expect
    best = min(times)
    spread = (max(times) - min(times)) / min(times)
    print(f"{name:40s}  {samples / best / 1e9:6.2f} GSamp/s  "
          f"(spread {spread * 100:3.0f}%)")


if __name__ == "__main__":
    variants = [
        ("baseline lane=128 cs=256", 128, 256, None, False),
        ("dimsem(par,arb) lane=128 cs=256", 128, 256,
         ("parallel", "arbitrary"), False),
        ("lane=256 cs=128", 256, 128, None, False),
        ("bf16 lane=128 cs=256", 128, 256, None, True),
        ("bf16 dimsem lane=128 cs=256", 128, 256,
         ("parallel", "arbitrary"), True),
        ("bf16 dimsem lane=256 cs=128", 256, 128,
         ("parallel", "arbitrary"), True),
    ]
    only = os.environ.get("VARIANT")
    for name, lane, cs, dimsem, bf16 in variants:
        if only and only not in name:
            continue
        bench_variant(name, lane, cs, dimsem, bf16)

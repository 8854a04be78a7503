"""Fused Pallas Viterbi: the whole windowed trellis inside one kernel.

Why this exists (measured, BENCH.md FEC table): the XLA windowed Viterbi
(`fec/conv.ConvCode.decode_soft_windowed`) is bound by ``lax.scan`` step
overhead, not arithmetic — ~0.85 us per trellis step at [batch, S]
widths, 226 Mbit/s info at the production operating point, 20x below the
modem data plane it serves. Every step's actual math (one butterfly over
``S = 2^(K-1)`` states across a 128-wide batch) is a handful of VPU ops.
This kernel runs the ENTIRE window — forward add-compare-select *and*
backward traceback — inside one ``pallas_call``, so a trellis step costs
VPU instructions instead of an XLA scan iteration.

Layout
------
* **Batch rows on lanes** (128 independent trellises per grid tile),
  **states on sublanes**: the path-metric tensor is ``[S, 128]`` f32 —
  for the K=7 production code that is 8 VPU tiles, fully resident.
* Per-step decisions are stored int8 in a ``[T, S, 128]`` VMEM scratch
  (~5.5 MB at the production window T = 672), read back by the in-kernel
  traceback; nothing round-trips HBM between the two passes.
* Traceback is gather-free, as in the XLA form: the decoded bit is
  ``state >> (K-2)`` and the survivor flag is a one-hot mask-reduce.

The rotor trick (no matmuls, no gathers)
----------------------------------------
The predecessor fetch ``pm[pred]`` is a perfect shuffle of the state
axis. A first kernel implemented it as an exact one-hot matmul (the
`ops/slicer.lut_map` cure) — measured on the chip, the two
``Precision.HIGHEST`` ``[S,S]@[S,128]`` matmuls were ~80% of the whole
kernel (6 bf16 passes each, every trellis step). The shuffle is instead
eliminated by *relabeling storage with a rotating map*: physical sublane
``x`` at step ``t`` holds natural state ``rotr(x, t mod (K-1))`` (bit
rotation of the ``K-1``-bit label). Because a trellis transition IS a
1-bit rotation of the register (``s' = rotr1(pred | in_bit)``), under
this schedule both ACS inputs of physical row ``x`` sit in the sublane
pair ``{x, x XOR 2^r}`` (``r = t mod (K-1)``) — one circular
``pltpu.roll`` by the static ``2^r`` plus a select, no matmul, no
cross-lane traffic; and each output lands exactly in the physical row
that computes it, so the storage map advances for free. The branch-bit
constants are pre-permuted host-side for each of the ``K-1`` phases.

Exactness: the arithmetic reproduces `fec/conv.ConvCode._acs` value for
value (a relabeling permutes rows, not floats: same pairs are added and
min-selected, renormalization subtracts the same global min on the same
every-8-step cadence, and the final argmin runs at phase 0 where storage
is back in natural order, with the same first-min tie-breaking), so
decisions are bit-identical to the XLA decoder — gated in
`tests/test_pallas_viterbi.py` on CPU and on the chip.

Scope: the *windowed* decode (free initial metrics, argmin/pinned end) —
the production form (`decode_soft_windowed`, `StreamingViterbi`,
`parallel/viterbi.py`). Full-block terminated decodes route through the
same windows. Window length is capped by the decision scratch
(T <= ~1024 at S = 64); the windowed decomposition makes that a
non-restriction.

New capability (the reference has no FEC; its RX stops at soft I/Q,
`/root/reference/src/bin/demodulate.rs:41-43`).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_BIG = np.float32(1e9)
#: renormalization cadence — MUST match ``ConvCode._acs``'s ``unroll``
#: (the subtraction rounds, so cadence is part of the exact arithmetic)
_RENORM = 8


def _auto_interpret() -> bool:
    """Compile for real TPUs; interpret elsewhere (CPU test meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


def _phase_tables(code):
    """``[nb, 2, S, n]``: transition output bits pre-permuted for each of
    the ``nb = K-1`` storage phases — ``omp[rho, d, x, j]`` is the code
    bit generator ``j`` emits entering the state stored at physical
    sublane ``x`` when the *output* phase is ``rho`` (natural state
    ``rotr(x, rho)``)."""
    nb = code.k - 1
    s = code.n_states
    omp = np.zeros((nb, 2, s, code.n), np.float32)
    x = np.arange(s)
    for rho in range(nb):
        nat = ((x >> rho) | (x << (nb - rho))) & (s - 1) if rho else x
        omp[rho] = code._outs[:, nat, :]
    return omp


def _viterbi_kernel(omp_ref, lam_ref, pin_ref, bits_ref, pm_scr, dec_scr, *,
                    s, n, nb, km2, tp, chunk, interpret):
    """One 128-lane tile: forward ACS over ``tp`` steps, then traceback.

    ``omp_ref [nb, 2, S, n]`` phase-permuted output bits; ``lam_ref
    [n, tp, 128]`` branch-bit costs; ``pin_ref [1, 128]`` 1.0 where the
    row's traceback must start at state 0 (terminated end); ``bits_ref
    [tp, 128]`` decoded (padded) bits out.
    """
    roll = jnp.roll if interpret else pltpu.roll
    chunks = tp // chunk
    iota = lax.broadcasted_iota(jnp.int32, (s, LANE), 0)
    # hoisted per-phase constants: [S,1] output-bit columns, pair masks
    oc = [[[omp_ref[rho, d, :, j:j + 1] for j in range(n)]
           for d in (0, 1)] for rho in range(nb)]
    lo_mask = [(iota & (1 << r)) == 0 for r in range(nb)]

    pm_scr[:, :] = jnp.zeros((s, LANE), jnp.float32)

    def fwd(c, _):
        lam_c = lam_ref[:, pl.ds(c * chunk, chunk), :]      # [n, chunk, L]
        pm = pm_scr[:, :]
        decs = []
        for i in range(chunk):
            r = i % nb                   # storage phase entering step i
            rho = (i + 1) % nb           # output phase
            d = 1 << r
            # ACS partners: natural preds {p, p|1} of this row's output
            # state sit at sublanes {x & ~d, x | d}
            rolled_dn = roll(pm, d, axis=0)        # [y] <- pm[y - d]
            rolled_up = roll(pm, s - d, axis=0)    # [y] <- pm[y + d]
            a0 = jnp.where(lo_mask[r], pm, rolled_dn)
            a1 = jnp.where(lo_mask[r], rolled_up, pm)
            o0, o1 = oc[rho]
            bm0 = o0[0] * lam_c[0:1, i, :]
            bm1 = o1[0] * lam_c[0:1, i, :]
            for j in range(1, n):
                bm0 = bm0 + o0[j] * lam_c[j:j + 1, i, :]
                bm1 = bm1 + o1[j] * lam_c[j:j + 1, i, :]
            c0 = a0 + bm0
            c1 = a1 + bm1
            dd = c1 < c0
            pm = jnp.where(dd, c1, c0)
            if i % _RENORM == _RENORM - 1:
                pm = pm - jnp.min(pm, axis=0, keepdims=True)
            decs.append(dd.astype(jnp.int8))
        pm_scr[:, :] = pm
        dec_scr[pl.ds(c * chunk, chunk), :, :] = jnp.stack(decs)
        return 0

    lax.fori_loop(0, chunks, fwd, 0)

    # tp is a multiple of chunk (itself a multiple of nb), so the final
    # storage phase is 0: natural order. First-min argmin over sublanes,
    # with the terminated end state pinned where requested.
    pm = pm_scr[:, :] + pin_ref[0:1, :] * _BIG * (iota > 0).astype(
        jnp.float32)
    mn = jnp.min(pm, axis=0, keepdims=True)
    state = jnp.min(jnp.where(pm <= mn, iota, s), axis=0, keepdims=True)

    def bwd(cr, state):
        c = chunks - 1 - cr
        dch = dec_scr[pl.ds(c * chunk, chunk), :, :].astype(jnp.int32)
        bs = []
        for i in range(chunk - 1, -1, -1):
            rho = (i + 1) % nb
            # decisions at step i live at physical row rotl(state, rho)
            if rho:
                ph = ((state << rho) | (state >> (nb - rho))) & (s - 1)
            else:
                ph = state
            b = state >> km2             # the input bit that led here
            m = iota == ph
            dd = jnp.sum(jnp.where(m, dch[i], 0), axis=0, keepdims=True)
            state = ((state << 1) & (s - 1)) | dd
            bs.append(b)
        bits_ref[pl.ds(c * chunk, chunk), :] = jnp.concatenate(
            bs[::-1], axis=0)
        return state

    lax.fori_loop(0, chunks, bwd, state)


@functools.partial(jax.jit, static_argnames=("code", "chunk", "interpret"))
def _decode_rows(code, lam, pin, chunk: int, interpret: bool):
    """``lam [n, Tp, R]`` (Tp % chunk == 0, R % 128 == 0), ``pin [1, R]``
    -> padded decision bits ``[Tp, R]`` int32."""
    s = code.n_states
    n, tp, r = lam.shape
    nb = code.k - 1
    omp = jnp.asarray(_phase_tables(code))
    kern = functools.partial(
        _viterbi_kernel, s=s, n=n, nb=nb, km2=code.k - 2, tp=tp,
        chunk=chunk, interpret=interpret)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((tp, r), jnp.int32),
        grid=(r // LANE,),
        in_specs=[
            pl.BlockSpec((nb, 2, s, n), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tp, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s, LANE), jnp.float32),
            pltpu.VMEM((tp, s, LANE), jnp.int8),
        ],
        interpret=interpret,
    )(omp, lam, pin)


def _pick_chunk(code, t_in: int) -> int:
    """Unroll granule: a multiple of ``lcm(K-1, _RENORM)`` (so rotor
    phase and renorm cadence stay static in the unrolled body) chosen to
    minimize front padding first, then maximize the unroll — bigger
    unrolls measured +15-25% on the chip for the BCJR sibling kernel
    (fori_loop overhead); chunking is value-neutral."""
    base = math.lcm(code.k - 1, _RENORM)
    best = None  # (padded_t, -chunk, chunk)
    c = base
    while c <= 150:
        cand = (t_in + (-t_in) % c, -c, c)
        if best is None or cand < best:
            best = cand
        c += base
    return best[2]


def viterbi_decode_windows(code, win: jnp.ndarray, pin: jnp.ndarray,
                           interpret: bool | None = None) -> jnp.ndarray:
    """Fused decode of a batch of free-start trellis windows.

    ``win [..., T, n]``: per-step per-branch-bit costs of independent
    windows (guard flanks already applied by the caller, exactly as
    `ConvCode.decode_soft_windowed` builds them). ``pin [...]``: 1.0 for
    windows whose traceback must start at state 0 (the last window of a
    terminated stream), 0.0 for argmin (free) ends. Returns the full
    ``[..., T]`` padded decision bits — the caller slices the interior,
    exactly as with ``_acs(..., trim=False)``.
    """
    if code.n_states < 8:
        raise ValueError("pallas viterbi needs S >= 8 (use the XLA path)")
    batch = win.shape[:-2]
    t_in, n = win.shape[-2], win.shape[-1]
    if interpret is None:
        interpret = _auto_interpret()
    # interpret mode (CPU tests): tracing cost scales with the unroll,
    # runtime doesn't matter — keep the small legacy granule
    chunk = (math.lcm(code.k - 1, _RENORM) if interpret
             else _pick_chunk(code, t_in))
    r = int(np.prod(batch)) if batch else 1
    rows = win.reshape((r, t_in, n))
    pinr = jnp.broadcast_to(pin, batch).reshape((r,)).astype(jnp.float32)

    pad_t = (-t_in) % chunk
    if pad_t:  # zero-cost front steps: free-start metrics are unchanged
        rows = jnp.concatenate(
            [jnp.zeros((r, pad_t, n), rows.dtype), rows], axis=1)
    pad_r = (-r) % LANE
    if pad_r:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad_r,) + rows.shape[1:], rows.dtype)], axis=0)
        pinr = jnp.concatenate([pinr, jnp.zeros((pad_r,), pinr.dtype)])

    lam = jnp.transpose(rows.astype(jnp.float32), (2, 1, 0))  # [n, Tp, R]
    bits = _decode_rows(code, lam, pinr.reshape(1, -1), chunk,
                        _auto_interpret() if interpret is None else interpret)
    bits = jnp.transpose(bits, (1, 0))[:r, pad_t:]            # [r, T]
    return bits.reshape(batch + (t_in,))


def viterbi_decode_stream(code, lam: jnp.ndarray, block_steps: int,
                          halo_steps: int, guard: float,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Windowed stream decode with the window build in kernel layout.

    The generic path above flattens a pre-built ``[..., W, T_w, n]``
    window tensor — fine for correctness, but constructing it costs a
    gather on a 2-lane-wide array plus a full transpose, which measured
    ~30% of the whole decode on the chip. This entry builds the windows
    directly in the kernel's ``[n, T_w, rows]`` layout: ONE transpose of
    the compact stream (to lane-major channels), then the W overlapping
    windows are plain slices stacked on the row axis — no gather, no
    wide transpose, ~1.27x data duplication only.

    ``lam [..., T, n]`` per-step branch costs of a terminated stream;
    returns data bits ``[..., T - (K-1)]`` identical to
    ``decode_soft_windowed(..., backend="xla")``.
    """
    if code.n_states < 8:
        raise ValueError("pallas viterbi needs S >= 8 (use the XLA path)")
    batch = lam.shape[:-2]
    t, n = lam.shape[-2], lam.shape[-1]
    b, h = int(block_steps), int(halo_steps)
    w = -(-t // b)
    tp_stream = w * b
    tw = b + 2 * h
    if interpret is None:
        interpret = _auto_interpret()
    chunk = (math.lcm(code.k - 1, _RENORM) if interpret
             else _pick_chunk(code, tw))
    pad_t = (-tw) % chunk
    c = int(np.prod(batch)) if batch else 1

    x = jnp.transpose(lam.reshape((c, t, n)).astype(jnp.float32),
                      (2, 1, 0))                        # [n, T, C]
    g = jnp.float32(guard)
    x = jnp.pad(x, ((0, 0), (h, tp_stream - t + h), (0, 0)))
    x = x.at[:, :h, :].set(g)
    x = x.at[:, h + t:, :].set(g)
    # windows as stacked slices: [n, T_w, W, C] -> rows r = wi*C + ci
    wins = jnp.stack([x[:, wi * b: wi * b + tw, :] for wi in range(w)],
                     axis=2)
    rows = wins.reshape((n, tw, w * c))
    if pad_t:   # zero-cost front steps: free-start metrics unchanged
        rows = jnp.concatenate(
            [jnp.zeros((n, pad_t, w * c), rows.dtype), rows], axis=1)
    r = w * c
    pad_r = (-r) % LANE
    if pad_r:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, pad_r)))
    pin = (jnp.arange(r + pad_r, dtype=jnp.int32) // c == w - 1)
    pin = jnp.where(jnp.arange(r + pad_r) < r, pin, False)
    bits = _decode_rows(code, rows, pin.astype(jnp.float32).reshape(1, -1),
                        chunk,
                        _auto_interpret() if interpret is None else interpret)
    bits = bits[pad_t + h: pad_t + h + b, :r]           # interior [B, W*C]
    bits = jnp.transpose(bits.reshape((b, w, c)), (2, 1, 0))
    bits = bits.reshape(batch + (w * b,))
    return bits[..., : t - (code.k - 1)]

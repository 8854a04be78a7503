"""Fused Pallas CA-SCL: polar list decoding inside one kernel.

Why this exists (measured, BENCH.md FEC table): the XLA SCL
(`fec/polar.PolarCode.decode_list`) is the one FEC row left an order of
magnitude below the data plane — 20.1 Mbit/s at list 8 — because the
traced decode tree is ~3.5k tiny ops (per-node f/g elementwise updates,
`lax.top_k` at every info leaf, one-hot ``[B,L,L]`` permutation einsums),
each a fusion break that round-trips ``[B, 8, w]`` intermediates through
HBM.  The same cure as the trellis decoders (`ops/pallas_viterbi.py`,
`ops/pallas_bcjr.py`): run the WHOLE successive-cancellation tree inside
one ``pallas_call`` with every intermediate VMEM-resident.

Layout
------
* **Batch codewords on lanes** (128 per grid tile), **the list axis
  L = 8 on sublanes**: a width-``w`` path-conditional tensor is stored
  ``[w*8, 128]`` f32 (width-major, list-minor), so the recursion's
  la/lb splits and u/x concatenations are *contiguous sublane slices* —
  no relayouts.  Path-independent tensors (everything above the first
  info leaf) stay un-broadcast at ``[w, 128]`` until a reorder touches
  them, and statically-zero tensors (frozen subtrees' u/x) stay Python
  ``None`` — the frozen-heavy half of the tree costs no select traffic.
* **A path reorder is pure data movement, not arithmetic**: the XLA
  form's exact one-hot einsum becomes 7 grouped sublane rolls + masked
  ``where`` selects keyed on the parent indices — a bit-exact gather
  (stronger than the einsum, which is merely value-exact up to the sign
  of zero).  Reorders compose down the tree exactly like the XLA form's
  ``_compose`` so each subtree's accumulated permutation applies ONCE
  per ancestor level.
* **Survivor selection is a 16-element bitonic network** over the 2L
  candidate metrics, sorting by ``(metric, candidate index)`` ascending
  — precisely ``lax.top_k``'s ordering *including* its lower-index-wins
  tie rule, so the kernel's path ordering (and therefore every
  downstream tie-break) is bit-identical to the XLA decoder's.

The kernel is parameterized over a contiguous leaf range ``[lo, hi)``,
so it can fuse the full tree (one call, the default) or act as the leaf
stage under the XLA recursion (``PolarCode._scl`` dispatches any
subtree of width ``kernel_w``) — the fallback if a future code's fully
unrolled tree ever outgrows what Mosaic will compile.

Exactness: frozen-leaf penalties, f/g node updates, candidate metric
construction, and selection order reproduce `fec/polar.PolarCode._scl`
value for value (multiplication by the literal ``1.0 - 2*0`` the XLA
form applies to statically-zero partial sums is exact, and reorders are
selections), so decoded bits AND path metrics are bit-identical —
exact-equality gated in `tests/test_pallas_scl.py` on CPU interpret and
on the chip.

New capability (the reference has no FEC; its RX stops at soft I/Q,
`/root/reference/src/bin/demodulate.rs:41-43`).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_chain import LANE, _auto_interpret

L = 8  # list size carried on sublane groups — the kernel's only size


def _iota(rows: int) -> jnp.ndarray:
    return lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)


def _scl_kernel(lam_ref, pm_ref, u_ref, x_ref, pmo_ref, par_ref, *,
                frozen, full_lam, interpret):
    """One 128-lane tile: the whole SCL subtree, VMEM-resident.

    ``frozen``: static bool tuple for the subtree's leaves. ``lam_ref``
    is ``[w*8, 128]`` (path-conditional subtree root LLRs) when
    ``full_lam`` else ``[w, 128]`` (path-independent). ``pm_ref
    [8, 128]`` path metrics in. Outputs: ``u/x [w*8, 128]`` f32 {0,1}
    post-selection decisions / partial sums, ``pmo [8, 128]`` metrics,
    ``par [8, 128]`` int32 accumulated parent indices (the subtree's
    composed permutation, identity when no info leaf reordered).
    """
    roll = jnp.roll if interpret else pltpu.roll
    w_all = len(frozen)

    def groll(x, d):
        """Roll by ``d`` within each group of 8 sublanes (the L axis)."""
        r = x.shape[0]
        a = roll(x, d, axis=0)                       # [i] <- x[i - d]
        if r == L:
            return a
        b = roll(x, (r - (L - d)) % r, axis=0)       # [i] <- x[i + 8 - d]
        return jnp.where(_iota(r) % L >= d, a, b)

    def full(item, w):
        """Materialize ``[w*8, 128]`` from a (path_dim, array) item."""
        p, arr = item
        if p == L:
            return arr
        return jnp.broadcast_to(arr[:, None, :], (w, L, LANE)).reshape(
            w * L, LANE)

    def apply_perm(parent, item, w):
        """Reorder the L axis: out[l] = in[parent[l]] (pure selection)."""
        if parent is None or item is None:
            return item
        arr = full(item, w)
        q = (_iota(L) - parent) & (L - 1)            # shift that lands l
        if w > 1:
            q = jnp.broadcast_to(q[None], (w, L, LANE)).reshape(
                w * L, LANE)
        out = arr                                    # q == 0 rows
        for d in range(1, L):
            out = jnp.where(q == d, groll(arr, d), out)
        return (L, out)

    def compose(p2, p1):
        """Parent-index composition: out[l] = p1[p2[l]]."""
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        q = (_iota(L) - p2) & (L - 1)
        out = p1
        for d in range(1, L):
            out = jnp.where(q == d, groll(p1, d), out)
        return out

    def pair(a, b, w):
        pa, aa = a
        pb, ab = b
        if pa == pb:
            return pa, aa, ab
        return L, full(a, w), full(b, w)

    def f_op(a, b, w):
        p, aa, ab = pair(a, b, w)
        return (p, jnp.sign(aa) * jnp.sign(ab)
                * jnp.minimum(jnp.abs(aa), jnp.abs(ab)))

    def g_op(a, b, x1, w):
        if x1 is None:
            # XLA computes b + (1 - 2*0)*a on its explicit zeros; the
            # multiply by exact 1.0 is the identity, so b + a matches.
            p, aa, ab = pair(a, b, w)
            return (p, ab + aa)
        return (L, full(b, w) + (1.0 - 2.0 * x1[1]) * full(a, w))

    def xor_op(x1, x2, w):
        if x1 is None:
            return x2          # 0 + x2 - 0: exact (x2 is {0,1}, +0 only)
        if x2 is None:
            return x1
        p, aa, ab = pair(x1, x2, w)
        return (p, aa + ab - 2.0 * aa * ab)

    def cat(a, b, wa, wb):
        if a is None and b is None:
            return None
        aa = full(a, wa) if a is not None else jnp.zeros(
            (wa * L, LANE), jnp.float32)
        bb = full(b, wb) if b is not None else jnp.zeros(
            (wb * L, LANE), jnp.float32)
        return (L, jnp.concatenate([aa, bb], axis=0))

    def xroll(x, j):
        """x[i ^ j] over 16 sublanes (bitonic exchange partner fetch)."""
        a = roll(x, 16 - j, axis=0)                  # [i] <- x[i + j]
        b = roll(x, j, axis=0)                       # [i] <- x[i - j]
        return jnp.where(_iota(16) & j == 0, a, b)

    def sort16(v):
        """Bitonic ascending sort of [16, 128] by (value, index) — the
        exact `lax.top_k` order (lower candidate index wins ties)."""
        ii = _iota(16)
        i16 = _iota(16)
        for k in (2, 4, 8, 16):
            j = k // 2
            while j:
                pv = xroll(v, j)
                pi = xroll(ii, j)
                own_lt = (v < pv) | ((v == pv) & (ii < pi))
                want_min = ((i16 & k) == 0) == ((i16 & j) == 0)
                take = own_lt != want_min
                v = jnp.where(take, pv, v)
                ii = jnp.where(take, pi, ii)
                j //= 2
        return v, ii

    def leaf(lam, pm, lo):
        if frozen[lo]:
            pen = jnp.maximum(-lam[1], 0.0)
            return None, None, pm + pen, None
        lamf = full(lam, 1)                          # [8, 128]
        pm2 = jnp.concatenate(
            [pm + jnp.maximum(-lamf, 0.0),           # u = 0 candidates
             pm + jnp.maximum(lamf, 0.0)], axis=0)   # u = 1 candidates
        vals, idx = sort16(pm2)
        idx8 = idx[:L]
        parent = idx8 & (L - 1)
        u = (idx8 >= L).astype(jnp.float32)
        return (L, u), (L, u), vals[:L], parent

    def rec(lam, lo, hi, pm):
        if hi - lo == 1:
            return leaf(lam, pm, lo)
        half = (hi - lo) // 2
        p, arr = lam
        la = (p, arr[: half * p])
        lb = (p, arr[half * p:])
        u1, x1, pm, p1 = rec(f_op(la, lb, half), lo, lo + half, pm)
        if p1 is not None:
            # one stacked reorder for both halves (one mask sweep)
            ab = apply_perm(p1, (p, arr), hi - lo)
            la = (L, ab[1][: half * L])
            lb = (L, ab[1][half * L:])
        u2, x2, pm, p2 = rec(g_op(la, lb, x1, half), lo + half, hi, pm)
        if p2 is not None and u1 is not None:
            ux = apply_perm(
                p2, (L, jnp.concatenate([u1[1], x1[1]], axis=0)),
                2 * half)
            u1 = (L, ux[1][: half * L])
            x1 = (L, ux[1][half * L:])
        u = cat(u1, u2, half, half)
        x = cat(xor_op(x1, x2, half), x2, half, half)
        return u, x, pm, compose(p2, p1)

    lam0 = (L if full_lam else 1, lam_ref[...])
    u, x, pm, par = rec(lam0, 0, w_all, pm_ref[...])
    zeros = jnp.zeros((w_all * L, LANE), jnp.float32)
    u_ref[...] = u[1] if u is not None else zeros
    x_ref[...] = x[1] if x is not None else zeros
    pmo_ref[...] = pm
    par_ref[...] = par if par is not None else jnp.broadcast_to(
        _iota(L), (L, LANE))


@functools.partial(jax.jit,
                   static_argnames=("frozen", "full_lam", "interpret"))
def _scl_rows(lam, pm, frozen, full_lam: bool, interpret: bool):
    """``lam [w*8 | w, R]``, ``pm [8, R]`` (R % 128 == 0) ->
    ``(u [w*8, R], x [w*8, R], pm [8, R], parent [8, R])``."""
    w = len(frozen)
    r = lam.shape[-1]
    kern = functools.partial(_scl_kernel, frozen=frozen,
                             full_lam=full_lam, interpret=interpret)
    rows_in = w * L if full_lam else w
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((w * L, r), jnp.float32),
            jax.ShapeDtypeStruct((w * L, r), jnp.float32),
            jax.ShapeDtypeStruct((L, r), jnp.float32),
            jax.ShapeDtypeStruct((L, r), jnp.int32),
        ),
        grid=(r // LANE,),
        in_specs=[
            pl.BlockSpec((rows_in, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((w * L, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * L, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(lam, pm)


def scl_subtree(code, llr: jnp.ndarray, lo: int, hi: int,
                pm: jnp.ndarray, interpret: bool | None = None):
    """Fused SCL over u-positions ``[lo, hi)`` — `PolarCode._scl`'s
    contract: ``llr [B, L|1, w]`` path-conditional (or path-broadcast)
    LLRs, ``pm [B, L]`` -> ``(u, x, pm, perm)`` with ``u``/``x`` f32
    ``[B, L, w]``, ``perm`` the ``[B, L, L]`` one-hot reorder this
    subtree applied (None when statically identity)."""
    if interpret is None:
        interpret = _auto_interpret()
    w = hi - lo
    frozen = tuple(bool(f) for f in code.frozen[lo:hi])
    b = llr.shape[0]
    full_lam = llr.shape[1] != 1
    if full_lam:
        lam = jnp.transpose(llr.astype(jnp.float32), (2, 1, 0)).reshape(
            w * L, b)
    else:
        lam = jnp.transpose(llr[:, 0, :].astype(jnp.float32), (1, 0))
    pmk = jnp.transpose(pm, (1, 0))                  # [L, B]
    pad = (-b) % LANE
    if pad:
        lam = jnp.pad(lam, ((0, 0), (0, pad)))
        pmk = jnp.pad(pmk, ((0, 0), (0, pad)))
    u, x, pmo, par = _scl_rows(lam, pmk, frozen, full_lam, interpret)
    u = jnp.transpose(u.reshape(w, L, b + pad), (2, 1, 0))[:b]
    x = jnp.transpose(x.reshape(w, L, b + pad), (2, 1, 0))[:b]
    pmo = jnp.transpose(pmo, (1, 0))[:b]
    if all(frozen):
        # statically identity — unreachable from PolarCode._scl (its
        # dispatch rule keeps all-frozen subtrees in XLA), kept for
        # direct callers
        return u, x, pmo, None
    par = jnp.transpose(par, (1, 0))[:b]             # [B, L]
    perm = (par[..., None] == jnp.arange(L, dtype=par.dtype)
            ).astype(jnp.float32)                    # [B, L, L]
    return u, x, pmo, perm

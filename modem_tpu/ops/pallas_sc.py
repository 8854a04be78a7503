"""Fused Pallas SC: the whole polar successive-cancellation tree in one
kernel.

Why (measured, BENCH.md FEC table): the XLA SC decoder
(`fec/polar.PolarCode.decode`) runs ~0.9 Gbit/s — its unrolled tree is
~2N tiny elementwise ops whose [batch, w] intermediates each round-trip
HBM (≈ 32 B of traffic per decoded bit, ~25x off the bandwidth
roofline). One `pallas_call` keeps every node tensor VMEM-resident:
read the LLRs once, write the decisions once.

Layout — **eight batch planes on sublanes**: a width-``w`` tensor is
stored ``[w*8, 128]`` (width-major, batch-plane-minor), so each tile
carries 8x128 = 1024 codewords and a leaf op is a full ``[8, 128]``
VREG, never a 1-sublane sliver. This is the same shape family as the
SCL kernel (`ops/pallas_scl.py` — list axis on sublane groups), which
is no accident: a first draft with plain ``[w, 128]`` tensors (leaf
arrays ``[1, 128]``) both wasted 7/8 of every leaf VREG and sent the
server-side Mosaic compile pathological (>15 min, never returned — the
same failure mode BENCH.md records for the SCL full-tree form), while
the ``[w*8, 128]`` family compiles reliably. Every op is elementwise
(SC has no cross-path traffic at all), la/lb splits and u/x
concatenations are contiguous sublane slices, and statically-zero u/x
of frozen subtrees stay Python ``None`` — the g-node against a frozen
left half is the exact ``b + a`` the XLA form computes through its
``(1 - 2*0)`` identity.

Exactness: same min-sum f, same g, same ``llr < 0`` leaf rule, so
decisions are bit-identical to `PolarCode._sc` — exact-equality gated
in `tests/test_pallas_sc.py` on CPU interpret and on the chip.

Like SCL, the kernel fuses any contiguous leaf range ``[lo, hi)`` so it
can run whole (one call) or as width-``kernel_w`` subtree kernels under
the XLA recursion (`PolarCode._sc` dispatches; kernel size stays
bounded by construction — the Mosaic-compile-variance lesson).

New capability (the reference has no FEC; its RX stops at soft I/Q,
`/root/reference/src/bin/demodulate.rs:41-43`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_chain import LANE, _auto_interpret

G = 8  # batch planes per sublane group — keeps every array [w*8, 128]


def _sc_kernel(lam_ref, u_ref, x_ref, *, frozen, interpret):
    """One 128-lane tile (= 1024 codewords): the whole SC subtree,
    VMEM-resident.

    ``lam_ref [w*8, 128]`` subtree root LLRs; outputs ``u/x [w*8, 128]``
    f32 {0,1} decisions / partial sums (zeros where frozen).
    """
    w_all = len(frozen)

    def xor_op(x1, x2):
        if x1 is None:
            return x2
        if x2 is None:
            return x1
        return x1 + x2 - 2.0 * x1 * x2

    def cat(a, b, wa, wb):
        if a is None and b is None:
            return None
        aa = a if a is not None else jnp.zeros((wa * G, LANE), jnp.float32)
        bb = b if b is not None else jnp.zeros((wb * G, LANE), jnp.float32)
        return jnp.concatenate([aa, bb], axis=0)

    def rec(lam, lo, hi):
        if hi - lo == 1:
            if frozen[lo]:
                return None, None
            u = (lam < 0).astype(jnp.float32)
            return u, u
        half = (hi - lo) // 2
        la = lam[: half * G]
        lb = lam[half * G:]
        u1, x1 = rec(jnp.sign(la) * jnp.sign(lb)
                     * jnp.minimum(jnp.abs(la), jnp.abs(lb)),
                     lo, lo + half)
        # x1 None (frozen left half): b + (1 - 2*0)*a == b + a exactly
        g = lb + la if x1 is None else lb + (1.0 - 2.0 * x1) * la
        u2, x2 = rec(g, lo + half, hi)
        return (cat(u1, u2, half, half),
                cat(xor_op(x1, x2), x2, half, half))

    u, x = rec(lam_ref[...], 0, w_all)
    zeros = jnp.zeros((w_all * G, LANE), jnp.float32)
    u_ref[...] = u if u is not None else zeros
    x_ref[...] = x if x is not None else zeros


@functools.partial(jax.jit, static_argnames=("frozen", "interpret"))
def _sc_rows(lam, frozen, interpret: bool):
    """``lam [w*8, R]`` (R % 128 == 0) -> ``(u [w*8, R], x [w*8, R])``."""
    w = len(frozen)
    r = lam.shape[-1]
    kern = functools.partial(_sc_kernel, frozen=frozen,
                             interpret=interpret)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((w * G, r), jnp.float32),
            jax.ShapeDtypeStruct((w * G, r), jnp.float32),
        ),
        grid=(r // LANE,),
        in_specs=[pl.BlockSpec((w * G, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((w * G, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * G, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(lam)


def sc_subtree(code, llr: jnp.ndarray, lo: int, hi: int,
               interpret: bool | None = None):
    """Fused SC over u-positions ``[lo, hi)`` — `PolarCode._sc`'s
    contract: ``llr [B, w]`` LLRs -> ``(u, x)`` int32 {0,1} ``[B, w]``."""
    if interpret is None:
        interpret = _auto_interpret()
    w = hi - lo
    frozen = tuple(bool(f) for f in code.frozen[lo:hi])
    b = llr.shape[0]
    lam = llr.astype(jnp.float32)
    pad = (-b) % (G * LANE)
    if pad:
        lam = jnp.pad(lam, ((0, pad), (0, 0)))
    t = (b + pad) // (G * LANE)
    # [T, G, 128, w] -> [w, G, T, 128] -> [w*8, T*128]: codeword
    # i = t*1024 + g*128 + l lands at (row w_i*8 + g, col t*128 + l)
    lam = jnp.transpose(lam.reshape(t, G, LANE, w), (3, 1, 0, 2)).reshape(
        w * G, t * LANE)
    u, x = _sc_rows(lam, frozen, interpret)

    def back(a):
        a = jnp.transpose(a.reshape(w, G, t, LANE), (2, 1, 3, 0)).reshape(
            (b + pad), w)
        return a[:b].astype(jnp.int32)

    return back(u), back(x)

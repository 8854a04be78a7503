"""Polar codes: Arikan butterfly encoder + batched SC and CRC-aided SCL
decoders.

The third modern FEC family here next to the convolutional/RS stack
(`fec/conv.py`, `fec/rs.py`) and QC-LDPC (`fec/ldpc.py`) — polar codes are
the 5G control-channel code and the canonical capacity-achieving
construction. The reference has no FEC at all (SURVEY.md "What the
reference is NOT").

TPU shaping:

* **Encoding is the F^{(x)n} butterfly** — log2(N) stages of reshape + XOR
  on int32 planes, no gathers, batched over leading dims.
* **Frozen-bit placement is a one-hot matmul** (``[K, N]`` permutation
  matrix), following the gather rule (BENCH.md round 2).
* **SC decoding is the standard tree recursion, traced once**: the
  min-sum ``f`` (sign-min combine) and ``g`` (sign-corrected add) node
  updates are elementwise over the batch, so one decode pass is ~2N
  small fused elementwise ops — sequential in the tree (that is inherent
  to SC), but every op runs across the whole codeword batch at once. For
  throughput, batch thousands of codewords; for latency-critical control
  channels N is small (<= 1024) by design.
* **SCL (list) decoding keeps the same traced tree with an explicit list
  axis** ``[B, L, ...]``. The classic pointer-juggling lazy-copy path
  memory is hostile to XLA; instead every path reorder is a **one-hot
  permutation matmul**: a leaf's top-L survivor selection (``lax.top_k``
  over 2L path metrics — L is tiny) yields ``[B, L, L]`` one-hot parent
  matrices, subtrees return their accumulated permutation, and parents
  re-map their live tensors (sibling LLRs, partial sums, decided bits)
  by einsum. Selection of f32 values by a one-hot under
  ``Precision.HIGHEST`` is exact, so list decoding is bit-equivalent to
  the textbook algorithm. Frozen leaves reorder nothing (their
  permutation is statically identity), which skips ~half the einsums.
* **The frozen set** comes from the Bhattacharyya/BEC recursion
  ``z -> [2z - z^2, z^2]`` (Arikan's heuristic construction), computed
  host-side at build time.

CRC-aided SCL (the 5G uplink/downlink control arrangement): put a CRC
from :mod:`modem_tpu.fec.crc` over the data bits inside the polar K
payload; ``decode_list(..., crc=...)`` picks the lowest-metric path that
passes the CRC (falling back to the metric-best path when none do).

LLR convention matches the framework (positive = bit 0,
:mod:`modem_tpu.ops.llr`), so chain/OFDM/SC-FDE soft outputs feed straight
in.
"""

from __future__ import annotations

import numpy as np

import jax
from jax import lax
import jax.numpy as jnp


def _bhattacharyya_order(n_bits: int) -> np.ndarray:
    """Channel indices sorted most-reliable-first for N = 2^n_bits.

    BEC(0.5) z-parameter recursion in NATURAL order: channel i of the
    N/2 code splits into channel 2i (worse, ``z' = 2z - z^2``) and
    channel 2i+1 (better, ``z' = z^2``) of the N code. Tracked in log
    domain so the z^2 chains don't underflow at large N."""
    logz = np.array([np.log(0.5)], np.float64)
    for _ in range(n_bits):
        z = np.exp(np.minimum(logz, 0.0))
        new = np.empty(2 * logz.size, np.float64)
        new[0::2] = logz + np.log(np.maximum(2.0 - z, 1e-300))
        new[1::2] = 2.0 * logz
        logz = new
    return np.argsort(logz)  # smallest z (most reliable) first


class PolarCode:
    """(N, K) polar code with SC decoding.

    ``n`` must be a power of two; the ``K`` most reliable synthetic
    channels carry data, the rest are frozen to zero.
    """

    def __init__(self, n: int = 256, k: int = 128):
        if n & (n - 1) or n < 2:
            raise ValueError("n must be a power of two >= 2")
        if not 0 < k <= n:
            raise ValueError("need 0 < k <= n")
        self.n = int(n)
        self.k = int(k)
        self.n_bits = int(np.log2(n))
        order = _bhattacharyya_order(self.n_bits)
        self.data_idx = np.sort(order[:k])          # ascending positions
        frozen = np.ones(n, bool)
        frozen[self.data_idx] = False
        self.frozen = frozen
        # one-hot placement matrix [K, N] (gather rule: no scatter)
        place = np.zeros((k, n), np.int32)
        place[np.arange(k), self.data_idx] = 1
        self._place = place
        # extraction matrix [N, K]
        self._extract = place.T.copy()

    # ------------------------------------------------------------------

    def encode(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., K]`` data bits -> ``[..., N]`` codeword (natural order,
        x = u F^{(x)n})."""
        if bits.shape[-1] != self.k:
            raise ValueError(f"expected {self.k} bits, got {bits.shape[-1]}")
        u = (bits.astype(jnp.int32) @ jnp.asarray(self._place)) & 1
        x = u
        half = 1
        while half < self.n:
            blk = x.reshape(x.shape[:-1] + (self.n // (2 * half), 2, half))
            a = blk[..., 0, :] ^ blk[..., 1, :]
            x = jnp.concatenate([a[..., None, :], blk[..., 1:2, :]],
                                axis=-2).reshape(x.shape)
            half *= 2
        return x

    # ------------------------------------------------------------------

    @staticmethod
    def _f(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Check-node combine (min-sum): sign(a)sign(b) min(|a|, |b|)."""
        return jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a),
                                                       jnp.abs(b))

    @staticmethod
    def _g(a: jnp.ndarray, b: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        """Variable-node combine: b + (1 - 2 x1) a."""
        return b + (1.0 - 2.0 * x1.astype(jnp.float32)) * a

    def _sc(self, llr: jnp.ndarray, lo: int, hi: int):
        """SC over u-positions [lo, hi); returns (u_hat, x_hat), both
        int32 ``[..., hi-lo]``. Traced recursion — unrolls to ~2N nodes."""
        if hi - lo == 1:
            if self.frozen[lo]:
                u = jnp.zeros(llr.shape, jnp.int32)
            else:
                u = (llr < 0).astype(jnp.int32)
            return u, u
        half = (hi - lo) // 2
        la = llr[..., :half]
        lb = llr[..., half:]
        u1, x1 = self._sc(self._f(la, lb), lo, lo + half)
        u2, x2 = self._sc(self._g(la, lb, x1), lo + half, hi)
        return (jnp.concatenate([u1, u2], axis=-1),
                jnp.concatenate([x1 ^ x2, x2], axis=-1))

    def decode(self, llrs: jnp.ndarray) -> jnp.ndarray:
        """``[..., N]`` channel LLRs (positive = bit 0) -> ``[..., K]``
        hard data bits (successive cancellation)."""
        if llrs.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} LLRs, got {llrs.shape[-1]}")
        u_hat, _ = self._sc(llrs.astype(jnp.float32), 0, self.n)
        return u_hat @ jnp.asarray(self._extract)

    def decode_full(self, llrs: jnp.ndarray) -> jnp.ndarray:
        """Like :meth:`decode` but returns the re-encoded codeword
        estimate ``[..., N]`` (for syndrome-style checks)."""
        u_hat, x_hat = self._sc(llrs.astype(jnp.float32), 0, self.n)
        return x_hat

    # ------------------------------------------------------------------
    # SCL: successive-cancellation list decoding (optionally CRC-aided)
    # ------------------------------------------------------------------

    _BIG = np.float32(1e30)  # metric of a not-yet-alive list path

    @staticmethod
    def _apply(perm, arr):
        """Re-map the list axis: ``[B, L, L] one-hot x [B, L, w]``.

        One-hot selection of f32 values is exact under HIGHEST precision
        (the bf16x3 operand split is exact; exactly one term is nonzero).
        ``perm=None`` statically means identity (frozen-leaf subtrees).
        """
        if perm is None:
            return arr
        return jnp.einsum("blp,bpw->blw", perm, arr,
                          precision=lax.Precision.HIGHEST)

    @staticmethod
    def _compose(p2, p1):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        return jnp.einsum("blp,bpm->blm", p2, p1,
                          precision=lax.Precision.HIGHEST)

    def _scl(self, llr, lo, hi, pm, list_size, kernel_w=0,
             interpret=None):
        """SCL over u-positions [lo, hi).

        ``llr [B, L, hi-lo]`` path-conditional LLRs, ``pm [B, L]`` path
        metrics (smaller = better). Returns ``(u, x, pm, perm)`` with
        ``u``/``x`` f32 {0,1} ``[B, L, hi-lo]`` in the POST-selection
        path order and ``perm`` the accumulated ``[B, L, L]`` one-hot
        re-mapping this subtree applied (None = identity).

        ``kernel_w``: subtrees of width <= ``kernel_w`` (with at least
        one info leaf — all-frozen subtrees reorder nothing and stay in
        the cheap XLA form) run fused in ONE Pallas kernel
        (:mod:`modem_tpu.ops.pallas_scl`), bit-identical.
        """
        if (kernel_w and hi - lo <= kernel_w and list_size == 8
                and hi - lo >= 2 and not self.frozen[lo:hi].all()):
            from ..ops.pallas_scl import scl_subtree
            return scl_subtree(self, llr, lo, hi, pm, interpret)
        if hi - lo == 1:
            lam = llr[..., 0]                      # [B, L]
            if self.frozen[lo]:
                # forced u=0: pay |llr| where the channel says 1
                u = jnp.zeros_like(lam)
                return u[..., None], u[..., None], pm + jnp.maximum(
                    -lam, 0.0), None
            # split every path into u=0 / u=1 candidates and keep the
            # best L of 2L by path metric (min-sum penalty: |llr| iff
            # the decision opposes the llr sign)
            pm2 = jnp.concatenate(
                [pm + jnp.maximum(-lam, 0.0),      # u = 0
                 pm + jnp.maximum(lam, 0.0)],      # u = 1
                axis=-1)                           # [B, 2L]
            neg_vals, idx = lax.top_k(-pm2, list_size)
            parent = idx % list_size               # [B, L] source path
            u = (idx >= list_size).astype(jnp.float32)
            perm = (parent[..., None]
                    == jnp.arange(list_size, dtype=idx.dtype)
                    ).astype(jnp.float32)          # [B, L, L]
            return u[..., None], u[..., None], -neg_vals, perm
        half = (hi - lo) // 2
        la = llr[..., :half]
        lb = llr[..., half:]
        u1, x1, pm, p1 = self._scl(self._f(la, lb), lo, lo + half,
                                   pm, list_size, kernel_w, interpret)
        # tensors taking the same reorder are stacked so each path
        # permutation is ONE einsum instead of two (halves the matmul
        # count down the tree)
        if p1 is not None:
            ab = self._apply(p1, jnp.concatenate([la, lb], axis=-1))
            la, lb = ab[..., :half], ab[..., half:]
        g = lb + (1.0 - 2.0 * x1) * la
        u2, x2, pm, p2 = self._scl(g, lo + half, hi, pm, list_size,
                                   kernel_w, interpret)
        if p2 is not None:
            ux = self._apply(p2, jnp.concatenate([u1, x1], axis=-1))
            u1, x1 = ux[..., :half], ux[..., half:]
        xor = x1 + x2 - 2.0 * x1 * x2
        return (jnp.concatenate([u1, u2], axis=-1),
                jnp.concatenate([xor, x2], axis=-1),
                pm, self._compose(p2, p1))

    def decode_list(self, llrs: jnp.ndarray, list_size: int = 8,
                    crc=None, backend: str = "auto",
                    kernel_w: int | None = None,
                    interpret: bool | None = None) -> jnp.ndarray:
        """``[..., N]`` channel LLRs -> ``[..., K]`` hard data bits by
        successive-cancellation LIST decoding.

        ``list_size`` parallel decoding paths survive per codeword
        (L=1 reproduces :meth:`decode` exactly). ``crc``: an optional
        :class:`modem_tpu.fec.crc.Crc` whose checksum occupies the tail
        of the K data bits (CRC-aided SCL, the 5G arrangement): the
        winner is the lowest-metric path whose CRC passes, falling back
        to the lowest-metric path when none do.

        ``backend``: ``"pallas"`` runs the decode tree fused in Pallas
        kernels (:mod:`modem_tpu.ops.pallas_scl`), bit-identical to the
        ``"xla"`` traced-tree form (chip-verified at (64,32) and the
        production (256,128)); ``"auto"`` (default) picks pallas on a
        TPU backend when list_size is 8 (the kernel's sublane-group
        size). ``kernel_w`` caps the fused subtree width; ``None``
        defaults to ``min(n, 128)``: subtree kernels up to w=128 under
        XLA top levels measured fastest on the chip at the production
        (256,128) — 286 Mbit/s vs the XLA tree's 20 (kw 32/64/full:
        133/234-at-same-geometry/unstable), and the full-tree w=256
        Mosaic compile is additionally UNPREDICTABLE (41.8 s once, then
        twice >570 s wedging the shared tunnel server-side), so the
        bounded hybrid is both the fast and the safe default. Pass an
        explicit ``kernel_w=n`` to force the single-kernel form.
        """
        if llrs.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} LLRs, got {llrs.shape[-1]}")
        if list_size < 1:
            raise ValueError("list_size must be >= 1")
        if backend == "auto":
            backend = ("pallas" if list_size == 8 and self.n >= 4
                       and jax.default_backend() in ("tpu", "axon")
                       else "xla")
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "pallas" and list_size != 8:
            raise ValueError("pallas SCL is specialized to list_size 8 "
                             "(use the XLA backend)")
        kw = 0
        if backend == "pallas":
            kw = (min(self.n, 128) if kernel_w is None
                  else int(kernel_w))
        batch = llrs.shape[:-1]
        lam = llrs.astype(jnp.float32).reshape((-1, 1, self.n))
        b = lam.shape[0]
        if kw < self.n:
            # the XLA tree levels need the explicit list axis; with the
            # kernel at the root the path-broadcast [B, 1, N] is kept
            # (the kernel defers broadcasting until a reorder happens)
            lam = jnp.broadcast_to(lam, (b, list_size, self.n))
        # Only path 0 is alive at the start; clones carry a huge metric
        # and lose every top-k until real splits populate the list. The
        # clones start at 2*_BIG (not _BIG) so a never-populated path —
        # possible when 2^|info prefix| < list_size — can never tie with
        # a real CRC-failing path (pm + _BIG == _BIG in float32) and win
        # the post-CRC argmin fallback below.
        pm0 = jnp.where(jnp.arange(list_size) == 0, 0.0, 2.0 * self._BIG)
        pm0 = jnp.broadcast_to(pm0[None, :], (b, list_size))
        u, _, pm, _ = self._scl(lam, 0, self.n, pm0, list_size, kw,
                                interpret)
        # per-path data bits, [B, L, K] (one-hot extraction matmul)
        data = jnp.einsum("bln,nk->blk", u,
                          jnp.asarray(self._extract, jnp.float32),
                          precision=lax.Precision.HIGHEST)
        data_i = (data > 0.5).astype(jnp.int32)
        if crc is not None:
            ok = crc.check(data_i)                 # [B, L] bool
            pm = pm + jnp.where(ok, 0.0, self._BIG)
        best = jnp.argmin(pm, axis=-1)             # [B]
        sel = (best[..., None] == jnp.arange(list_size)
               ).astype(jnp.float32)               # [B, L]
        out = jnp.einsum("bl,blk->bk", sel, data,
                         precision=lax.Precision.HIGHEST)
        return (out > 0.5).astype(jnp.int32).reshape(batch + (self.k,))

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


def _z_udomain(z: np.ndarray) -> np.ndarray:
    """Per-channel BEC erasure probs ``z [N]`` (coded-bit domain, natural
    order) -> u-domain erasure probs, matching the SC decode order (the
    tree's f-half first): the top split pairs ``a = z[:N/2]`` with
    ``b = z[N/2:]`` elementwise — f-combined (worse) channels
    ``a + b - ab`` feed u[:N/2], g-combined (better) ``ab`` feed
    u[N/2:]. With uniform ``z`` this reproduces `_bhattacharyya_order`'s
    ranking; non-uniform ``z`` is what rate matching needs (punctured
    coded bits are erased with certainty, z = 1). Linear float64: exact
    0s/1s propagate exactly; deep z^2 chains may underflow to 0 and tie,
    but ties only occur among effectively-perfect channels."""
    if z.size == 1:
        return z
    half = z.size // 2
    a, b = z[:half], z[half:]
    return np.concatenate([_z_udomain(a + b - a * b), _z_udomain(a * b)])


class PolarCode:
    """(N, K) polar code with SC decoding.

    ``n`` must be a power of two; the ``K`` most reliable synthetic
    channels carry data, the rest are frozen to zero.

    ``force_frozen``: u-positions that must be frozen regardless of
    reliability (rate-matched shortening needs the tail structurally
    frozen so the shortened coded bits are zero). ``channel_z``:
    per-coded-bit initial BEC erasure probabilities (default uniform
    0.5) — puncturing marks dropped positions ``z = 1`` so the
    construction freezes the u-channels that became undecodable.
    """

    def __init__(self, n: int = 256, k: int = 128,
                 force_frozen=None, channel_z=None):
        if n & (n - 1) or n < 2:
            raise ValueError("n must be a power of two >= 2")
        if not 0 < k <= n:
            raise ValueError("need 0 < k <= n")
        self.n = int(n)
        self.k = int(k)
        self.n_bits = int(np.log2(n))
        if channel_z is None:
            order = _bhattacharyya_order(self.n_bits)
        else:
            z = np.asarray(channel_z, np.float64)
            if z.shape != (n,):
                raise ValueError(f"channel_z must have shape ({n},)")
            zu = _z_udomain(z)
            order = np.argsort(zu, kind="stable")
            self._z_u = zu
        if force_frozen is not None:
            banned = np.zeros(n, bool)
            banned[np.asarray(force_frozen, np.int64)] = True
            order = order[~banned[order]]
            if order.size < k:
                raise ValueError(
                    f"only {order.size} usable channels after "
                    f"force-freezing, need k={k}")
        if channel_z is not None and float(self._z_u[order[k - 1]]) >= 1.0:
            # only exact z == 1 channels are structurally undecodable
            # (exact 1s propagate exactly in the float64 recursion,
            # _z_udomain docstring); z in (0.999, 1) is merely weak
            raise ValueError(
                "k exceeds the number of usable synthetic channels for "
                "this puncturing pattern (selected a z=1 channel)")
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

    def _sc(self, llr: jnp.ndarray, lo: int, hi: int, kernel_w: int = 0,
            interpret=None):
        """SC over u-positions [lo, hi); returns (u_hat, x_hat), both
        int32 ``[..., hi-lo]``. Traced recursion — unrolls to ~2N nodes.

        ``kernel_w``: subtrees of width <= ``kernel_w`` (with at least
        one info leaf) run fused in ONE Pallas kernel
        (:mod:`modem_tpu.ops.pallas_sc`), bit-identical.
        """
        if (kernel_w and hi - lo <= kernel_w and hi - lo >= 2
                and not self.frozen[lo:hi].all()):
            from ..ops.pallas_sc import sc_subtree
            return sc_subtree(self, llr, lo, hi, interpret)
        if hi - lo == 1:
            if self.frozen[lo]:
                u = jnp.zeros(llr.shape, jnp.int32)
            else:
                u = (llr < 0).astype(jnp.int32)
            return u, u
        half = (hi - lo) // 2
        la = llr[..., :half]
        lb = llr[..., half:]
        u1, x1 = self._sc(self._f(la, lb), lo, lo + half, kernel_w,
                          interpret)
        u2, x2 = self._sc(self._g(la, lb, x1), lo + half, hi, kernel_w,
                          interpret)
        return (jnp.concatenate([u1, u2], axis=-1),
                jnp.concatenate([x1 ^ x2, x2], axis=-1))

    def decode(self, llrs: jnp.ndarray, backend: str = "auto",
               kernel_w: int | None = None,
               interpret: bool | None = None) -> jnp.ndarray:
        """``[..., N]`` channel LLRs (positive = bit 0) -> ``[..., K]``
        hard data bits (successive cancellation).

        ``backend``: ``"pallas"`` runs the decode tree fused in Pallas
        kernels (:mod:`modem_tpu.ops.pallas_sc`), bit-identical to the
        ``"xla"`` traced-tree form; ``"auto"`` (default) picks pallas on
        a TPU backend for n <= 1024 (mirroring
        :meth:`decode_list`'s verified range) when the batch is at
        least half the kernel's 1024-codeword tile — smaller
        latency-shaped batches would be zero-padded up to 16x and pay
        full-tile compute, so they keep the XLA tree. ``kernel_w`` caps
        the fused subtree width (default ``min(n, 128)`` — the SCL
        Mosaic-compile-variance lesson, BENCH.md "Fused Pallas CA-SCL").
        """
        if llrs.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} LLRs, got {llrs.shape[-1]}")
        if backend == "xla" and (kernel_w is not None
                                 or interpret is not None):
            raise ValueError("kernel_w/interpret only apply to "
                             "backend='pallas'; they would be silently "
                             "ignored under backend='xla'")
        if backend == "auto":
            batch_n = int(np.prod(llrs.shape[:-1], dtype=np.int64))
            backend = ("pallas" if 4 <= self.n <= 1024
                       and batch_n >= 512
                       and jax.default_backend() in ("tpu", "axon")
                       else "xla")
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "pallas" and kernel_w is not None and kernel_w < 2:
            raise ValueError("kernel_w < 2 would silently run the XLA "
                             "path; pass backend='xla' instead")
        kw = 0
        if backend == "pallas":
            kw = (min(self.n, 128) if kernel_w is None
                  else int(kernel_w))
        batch = llrs.shape[:-1]
        lam = llrs.astype(jnp.float32).reshape((-1, self.n))
        u_hat, _ = self._sc(lam, 0, self.n, kw, interpret)
        return (u_hat @ jnp.asarray(self._extract)).reshape(
            batch + (self.k,))

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
        A PATH-INDEPENDENT ``arr`` (list axis of size 1 — nothing up to
        here depended on the path) is also an identity: every survivor
        copies some parent's row and all rows are identical, so the
        reorder is skipped and the tensor stays narrow (the round-5 cure
        for the 8x-broadcast top levels — DESIGN.md section 15 item 1).
        """
        if perm is None or arr.shape[-2] == 1:
            return arr
        return jnp.einsum("blp,bpw->blw", perm, arr,
                          precision=lax.Precision.HIGHEST)

    @staticmethod
    def _cat(a, b):
        """Concatenate along the symbol axis, broadcasting a narrow
        (path-independent) list axis when the two sides differ."""
        if a.shape[-2] != b.shape[-2]:
            l_sz = max(a.shape[-2], b.shape[-2])
            a = jnp.broadcast_to(a, a.shape[:-2] + (l_sz, a.shape[-1]))
            b = jnp.broadcast_to(b, b.shape[:-2] + (l_sz, b.shape[-1]))
        return jnp.concatenate([a, b], axis=-1)

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
        return (self._cat(u1, u2), self._cat(xor, x2),
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
        if backend == "xla" and (kernel_w is not None
                                 or interpret is not None):
            raise ValueError("kernel_w/interpret only apply to "
                             "backend='pallas'; they would be silently "
                             "ignored under backend='xla'")
        if backend == "auto":
            # pallas only on the chip-verified size range: hybrid
            # (kernel_w=128) parity + compile validated on hardware at
            # (64,32), (256,128), (512,256) and (1024,512). Larger
            # codes' subtree frozen patterns were never compile-checked
            # and Mosaic compile of this kernel family has shown
            # pathological variance (BENCH.md caveat), so they keep the
            # XLA form unless pallas is requested explicitly.
            backend = ("pallas" if list_size == 8 and 4 <= self.n <= 1024
                       and jax.default_backend() in ("tpu", "axon")
                       else "xla")
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "pallas" and list_size != 8:
            raise ValueError("pallas SCL is specialized to list_size 8 "
                             "(use the XLA backend)")
        if backend == "pallas" and kernel_w is not None and kernel_w < 2:
            raise ValueError("kernel_w < 2 would silently run the XLA "
                             "path; pass backend='xla' instead")
        kw = 0
        if backend == "pallas":
            kw = (min(self.n, 128) if kernel_w is None
                  else int(kernel_w))
        batch = llrs.shape[:-1]
        # the path-broadcast [B, 1, N] is kept all the way down: the XLA
        # tree levels propagate the narrow list axis until the first
        # reorder materializes (`_apply` skips path-independent tensors)
        # and the kernel ingests [B, 1, w] natively — no level ever
        # computes on 8x-redundant rows (DESIGN.md section 15 item 1)
        lam = llrs.astype(jnp.float32).reshape((-1, 1, self.n))
        b = lam.shape[0]
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
        # u can come back narrow when no reorder ever materialized
        # (e.g. the whole tree inside one kernel with <= 1 info leaf)
        u = jnp.broadcast_to(u, (b, list_size, self.n))
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


class RateMatchedPolar:
    """Polar code rate matching: arbitrary transmitted length E from a
    power-of-two mother code (the 5G arrangement, NR 38.212-shaped).

    Polar codewords are power-of-two sized; real control channels carry
    E coded bits for arbitrary E. Three standard mechanisms, selected by
    ``mode`` (``"auto"`` applies 5G's rule):

    * **shortening** (E < N, rate > 7/16): drop the LAST N-E coded bits.
      The tail set is superset-closed under the bit-domination order
      (i ⊇ j implies i >= j numerically), so structurally freezing the
      SAME u-tail forces those coded bits to zero — the receiver knows
      them and de-matches with a large known-bit LLR.
    * **puncturing** (E < N, rate <= 7/16): drop the FIRST N-E coded
      bits. The receiver knows nothing about them (LLR 0); the
      construction marks them erased-with-certainty (``channel_z = 1``)
      so the u-channels that become undecodable freeze automatically
      (exactly N-E of them end at z = 1).
    * **repetition** (E > N): re-transmit the first E-N coded bits; the
      receiver SUMS the repeated LLRs (independent-observation combine).

    Head/tail patterns are in natural order — the interleaver-free
    analog of 5G's sub-block-interleaved QUP patterns (same structural
    guarantees, no standardized bit positions claimed). TPU shaping:
    matching/de-matching are static slices/pads/adds around the existing
    batched encode/decode, so every backend (XLA SC, SCL, the fused
    Pallas SCL kernel) works unchanged on the mother code.

    New capability (the reference has no FEC; SURVEY.md "What the
    reference is NOT").
    """

    #: LLR magnitude for shortened (known-zero) positions: 2^30 — huge
    #: vs any real channel LLR yet leaves 2^8 headroom of exact-f32
    #: additions before the path-metric scale (PolarCode._BIG = 1e30).
    KNOWN_LLR = np.float32(2.0 ** 30)

    def __init__(self, k: int, e: int, n: int | None = None,
                 mode: str = "auto"):
        if e < 1:
            raise ValueError("need e >= 1")
        if n is None:
            n = 1 << max(2, int(np.ceil(np.log2(e))))
        if n & (n - 1) or n < 2:
            raise ValueError("n must be a power of two >= 2")
        if mode == "auto":
            if e > n:
                mode = "repeat"
            elif e == n:
                mode = "none"
            else:
                mode = "shorten" if k / e > 7.0 / 16.0 else "puncture"
        if mode not in ("none", "shorten", "puncture", "repeat"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode in ("none", "shorten", "puncture") and e > n:
            raise ValueError(f"mode {mode!r} needs e <= n, got {e} > {n}")
        if mode == "repeat" and not n < e <= 2 * n:
            raise ValueError(f"repetition needs n < e <= 2n, got e={e}")
        if mode == "none" and e != n:
            raise ValueError("mode 'none' needs e == n")
        if k > min(e, n):
            raise ValueError(f"need k <= min(e, n) = {min(e, n)}")
        self.k, self.e, self.n, self.mode = int(k), int(e), int(n), mode
        m = abs(n - e)
        if mode == "shorten":
            # shortened coded positions are KNOWN zeros at the receiver
            # (z = 0), which improves the reliability ranking vs keeping
            # the uniform-z order; force_frozen keeps the structural
            # zero-tail guarantee independent of the construction
            z = np.full(n, 0.5)
            z[n - m:] = 0.0
            self.code = PolarCode(n, k, force_frozen=np.arange(n - m, n),
                                  channel_z=z)
        elif mode == "puncture":
            z = np.full(n, 0.5)
            z[:m] = 1.0
            self.code = PolarCode(n, k, channel_z=z)
        else:
            self.code = PolarCode(n, k)

    def encode(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., K]`` data bits -> ``[..., E]`` transmitted bits."""
        x = self.code.encode(bits)
        if self.mode == "shorten":
            return x[..., : self.e]
        if self.mode == "puncture":
            return x[..., self.n - self.e:]
        if self.mode == "repeat":
            return jnp.concatenate(
                [x, x[..., : self.e - self.n]], axis=-1)
        return x

    def dematch(self, llrs: jnp.ndarray) -> jnp.ndarray:
        """``[..., E]`` received LLRs -> ``[..., N]`` mother-code LLRs
        (known-zero tail for shortening, zero-information head for
        puncturing, summed repeats for repetition)."""
        if llrs.shape[-1] != self.e:
            raise ValueError(f"expected {self.e} LLRs, got {llrs.shape[-1]}")
        lam = llrs.astype(jnp.float32)
        pad = self.n - self.e
        if self.mode == "shorten":
            known = jnp.full(lam.shape[:-1] + (pad,), self.KNOWN_LLR,
                             jnp.float32)
            return jnp.concatenate([lam, known], axis=-1)
        if self.mode == "puncture":
            return jnp.concatenate(
                [jnp.zeros(lam.shape[:-1] + (pad,), jnp.float32), lam],
                axis=-1)
        if self.mode == "repeat":
            r = self.e - self.n
            head = lam[..., : r] + lam[..., self.n:]
            return jnp.concatenate([head, lam[..., r: self.n]], axis=-1)
        return lam

    def decode(self, llrs: jnp.ndarray, **kwargs) -> jnp.ndarray:
        """``[..., E]`` LLRs -> ``[..., K]`` bits (SC on the mother
        code; all `PolarCode.decode` backends apply unchanged)."""
        return self.code.decode(self.dematch(llrs), **kwargs)

    def decode_list(self, llrs: jnp.ndarray, list_size: int = 8,
                    crc=None, **kwargs) -> jnp.ndarray:
        """``[..., E]`` LLRs -> ``[..., K]`` bits (CA-SCL on the mother
        code; all `PolarCode.decode_list` backends apply unchanged)."""
        return self.code.decode_list(self.dematch(llrs), list_size,
                                     crc=crc, **kwargs)

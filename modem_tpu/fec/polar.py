"""Polar codes: Arikan butterfly encoder + batched successive-cancellation
decoder.

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
* **The frozen set** comes from the Bhattacharyya/BEC recursion
  ``z -> [2z - z^2, z^2]`` (Arikan's heuristic construction), computed
  host-side at build time.

LLR convention matches the framework (positive = bit 0,
:mod:`modem_tpu.ops.llr`), so chain/OFDM/SC-FDE soft outputs feed straight
in.
"""

from __future__ import annotations

import numpy as np

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

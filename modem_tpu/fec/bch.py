"""Binary BCH codes over GF(256): the precise-rate outer code family.

New capability (the reference has no FEC). BCH is the outer code modern
standards pair with LDPC (DVB-S2's BCH ⊗ LDPC arrangement mirrors the
classic RS ⊗ convolutional stack this package already provides) — it
mops up the low error floor the inner soft decoder leaves, with finer
rate granularity than Reed-Solomon because it corrects single BITS, not
whole 8-bit symbols.

TPU shaping (same playbook as :mod:`modem_tpu.fec.rs`):

* a binary BCH code is cyclic over GF(2), so the systematic **encoder**
  (``parity = msg·x^p mod g``) is ONE ``[k, p]`` bit-matmul mod 2 (the
  CRC form), built host-side by long division;
* **syndromes** ``S_j = r(α^j)``, j = 1..2t, are GF(2)-linear in the
  received bits: one ``[n, 2t·8]`` bit-matmul, then pack to GF(256)
  elements;
* **Berlekamp-Massey** runs inversionless as a ``lax.scan`` over the
  fixed 2t steps, branchless and batched (the `rs.py` form);
* the **Chien search** evaluates Λ at all n positions with one wide
  gather-free GF multiply + log-depth XOR fold. Binary code, so error
  correction is just XOR at the root positions — no Forney step.

GF(256) arithmetic on device is gather-free (bit-sliced carryless
multiply + polynomial reduction), as in `rs.py`.
"""

from __future__ import annotations

from functools import cached_property

import numpy as np

import jax
import jax.numpy as jnp

from .rs import _gf_tables


def _poly_mul_gf2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """GF(2)[x] product, low-degree-first coefficient arrays."""
    out = np.zeros(len(a) + len(b) - 1, np.int64)
    for i, c in enumerate(a):
        if c:
            out[i:i + len(b)] ^= b
    return out


class Bch:
    """Binary BCH(n=255, t) code: corrects up to ``t`` bit errors.

    ``k`` is derived from the generator polynomial degree (e.g. t=2 ->
    (255, 239), t=8 -> (255, 191) — the standard tables). Codewords are
    systematic: ``[k msg bits | n-k parity bits]``, msg bit 0 the
    highest-degree coefficient.
    """

    def __init__(self, t: int = 8, primitive: int = 0x11D):
        self.n = 255
        self.t = int(t)
        if not 1 <= self.t <= 31:
            raise ValueError("need 1 <= t <= 31")
        self.primitive = int(primitive)
        self._exp, self._log = _gf_tables(primitive)
        # generator = lcm of minimal polynomials of alpha^1 .. alpha^2t
        seen: set = set()
        g = np.array([1], np.int64)
        for i in range(1, 2 * self.t + 1):
            if i in seen:
                continue
            coset = []
            j = i
            while j not in coset:
                coset.append(j)
                seen.add(j)
                j = (2 * j) % 255
            # minimal poly: prod (x - alpha^j) over the coset, computed
            # in GF(256); coefficients land in {0, 1}
            m = np.array([1], np.int64)
            for j in coset:
                root = int(self._exp[j])
                nm = np.zeros(len(m) + 1, np.int64)
                for d, c in enumerate(m):
                    nm[d + 1] ^= c
                    nm[d] ^= self._gmul_np(int(c), root)
                m = nm
            assert np.all((m == 0) | (m == 1)), "minimal poly not binary"
            g = _poly_mul_gf2(g, m) % 2
        self._gen = g.astype(np.int64)     # low-degree-first, g[p] = 1
        self.p = len(g) - 1
        self.k = self.n - self.p
        if self.k <= 0:
            raise ValueError(f"t={t} leaves no data bits at n=255")

    def _gmul_np(self, a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return int(self._exp[(self._log[a] + self._log[b]) % 255])

    # ---- host-built GF(2) matrices ----

    @cached_property
    def _encode_matrix(self) -> np.ndarray:
        """[k, p]: parity bits = msg bits @ M (mod 2). Msg bit i is the
        coefficient of x^{n-1-i}; parity bit j of x^{p-1-j}."""
        m = np.zeros((self.k, self.p), np.uint8)
        for i in range(self.k):
            # x^(n-1-i) mod g by long division
            r = np.zeros(self.n, np.int64)
            r[self.n - 1 - i] = 1
            for d in range(self.n - 1, self.p - 1, -1):
                if r[d]:
                    r[d - self.p: d + 1] ^= self._gen
            m[i] = r[self.p - 1:: -1][: self.p]
        return m

    @cached_property
    def _syndrome_matrix(self) -> np.ndarray:
        """[n, 2t*8]: syndrome bits = recv bits @ M (mod 2), packed
        MSB-first per GF(256) syndrome S_j = r(alpha^j), j = 1..2t."""
        m = np.zeros((self.n, 2 * self.t * 8), np.uint8)
        for i in range(self.n):
            deg = self.n - 1 - i
            for j in range(1, 2 * self.t + 1):
                v = int(self._exp[(deg * j) % 255])
                for b in range(8):
                    m[i, (j - 1) * 8 + b] = (v >> (7 - b)) & 1
        return m

    # ---- device GF(256) ops (gather-free; the rs.py forms) ----

    def _gmul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a = jnp.asarray(a, jnp.int32)
        b = jnp.asarray(b, jnp.int32)
        p = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), jnp.int32)
        for i in range(8):
            p = p ^ (((b >> i) & 1) * (a << i))
        for k in range(14, 7, -1):
            p = p ^ (((p >> k) & 1) * (self.primitive << (k - 8)))
        return p

    @staticmethod
    def _xor_fold(x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[-1]
        while n > 1:
            h = n // 2
            head = x[..., :h] ^ x[..., h:2 * h]
            x = head if n % 2 == 0 else jnp.concatenate(
                [head, x[..., 2 * h:]], axis=-1)
            n = x.shape[-1]
        return x[..., 0]

    # ---- public API ----

    def encode(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., k]`` msg bits -> ``[..., n]`` systematic codeword."""
        if bits.shape[-1] != self.k:
            raise ValueError(f"expected {self.k} bits, got {bits.shape[-1]}")
        b = bits.astype(jnp.int32)
        h = jnp.asarray(self._encode_matrix, jnp.float32)
        par = jnp.mod(b.astype(jnp.float32) @ h, 2.0).astype(jnp.int32)
        return jnp.concatenate([b, par], axis=-1)

    def syndromes(self, recv: jnp.ndarray) -> jnp.ndarray:
        """``[..., n]`` bits -> ``[..., 2t]`` GF(256) syndromes."""
        hs = jnp.asarray(self._syndrome_matrix, jnp.float32)
        s = jnp.mod(recv.astype(jnp.float32) @ hs, 2.0).astype(jnp.int32)
        s = s.reshape(s.shape[:-1] + (2 * self.t, 8))
        w = jnp.asarray(1 << np.arange(7, -1, -1), jnp.int32)
        return jnp.sum(s * w, axis=-1)

    def _berlekamp(self, s: jnp.ndarray):
        """Inversionless BM (the rs.py form at this code's t)."""
        lt = self.t + 1
        batch = s.shape[:-1]
        c0 = jnp.zeros(batch + (lt,), jnp.int32).at[..., 0].set(1)
        b0 = jnp.zeros(batch + (lt,), jnp.int32).at[..., 0].set(1)
        carry0 = (c0, b0, jnp.zeros(batch, jnp.int32),
                  jnp.ones(batch, jnp.int32))
        sp = jnp.moveaxis(s, -1, 0)

        def step(carry, xs):
            c, b, l, bb = carry
            r, s_win = xs
            d = self._xor_fold(self._gmul(c, s_win))
            bs = jnp.concatenate(
                [jnp.zeros_like(b[..., :1]), b[..., :-1]], axis=-1)
            c_new = self._gmul(jnp.broadcast_to(bb[..., None], c.shape), c) \
                ^ self._gmul(jnp.broadcast_to(d[..., None], bs.shape), bs)
            upd = (d != 0) & (2 * l <= r)
            b_new = jnp.where(upd[..., None], c, bs)
            bb_new = jnp.where(upd, d, bb)
            l_new = jnp.where(upd, r + 1 - l, l)
            return (c_new, b_new, l_new, bb_new), None

        two_t = 2 * self.t
        idx = (np.arange(two_t)[:, None] - np.arange(lt)[None, :])
        valid = idx >= 0
        idx = np.where(valid, idx, 0)
        wins = jnp.where(jnp.asarray(valid)[(...,) + (None,) * len(batch)],
                         sp[jnp.asarray(idx)], 0)
        wins = jnp.moveaxis(wins, 1, -1)
        rs = jnp.arange(two_t)
        (c, _, l, _), _ = jax.lax.scan(step, carry0, (rs, wins))
        return c, l

    def decode(self, recv: jnp.ndarray):
        """``[..., n]`` hard bits -> ``(msg [..., k], ok [...])``.

        Corrects up to ``t`` bit errors per codeword; ``ok`` is False
        when the pattern is uncorrectable (root-count mismatch or
        residual syndromes)."""
        if recv.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} bits, got {recv.shape[-1]}")
        recv = recv.astype(jnp.int32)
        s = self.syndromes(recv)
        lam, l = self._berlekamp(s)
        lt = self.t + 1
        degs = self.n - 1 - np.arange(self.n)
        kpow = np.mod(-degs[:, None] * np.arange(lt)[None, :], 255)
        kmat = jnp.asarray(self._exp[kpow], jnp.int32)   # [n, t+1]
        ev = self._xor_fold(self._gmul(lam[..., None, :], kmat))
        err_here = ev == 0
        n_roots = jnp.sum(err_here.astype(jnp.int32), axis=-1)
        corr = recv ^ err_here.astype(jnp.int32)         # binary: flip
        ok = (n_roots == l) & jnp.all(self.syndromes(corr) == 0, axis=-1)
        return corr[..., : self.k], ok

    # FramedLink outer-code hooks (bit-domain, like rs.encode_bits)
    def encode_bits(self, bits: jnp.ndarray) -> jnp.ndarray:
        return self.encode(bits)

    def decode_bits(self, bits: jnp.ndarray):
        return self.decode(bits)


def bch_255_191() -> Bch:
    """t=8 workhorse (DVB-S2-style outer-code strength at n=255)."""
    return Bch(t=8)


def bch_255_239() -> Bch:
    """t=2 light outer code (mops up a low inner-decoder error floor)."""
    return Bch(t=2)

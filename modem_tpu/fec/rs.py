"""Reed–Solomon codes over GF(256): the outer code of the classic
concatenated stack (RS ⊗ interleave ⊗ convolutional — the deep-space /
DVB arrangement; the inner K=7 code is :mod:`modem_tpu.fec.conv`).

New capability (the reference has no FEC of any kind).

TPU shaping — the key observation is that an RS code is **GF(2)-linear**:
multiplication by a *constant* of GF(256) is an 8×8 bit-matrix, so

* the systematic **encoder** (``parity = msg·x^p mod g``) collapses to ONE
  ``[k·8, p·8]`` bit-matmul mod 2 — the same form as :mod:`.crc`, built
  once on the host from ``x^d mod g`` remainders;
* **syndromes** (``S_j = r(α^{fcr+j})``) collapse to a second bit-matmul;

leaving only Berlekamp–Massey as a genuine recursion — run *inversionless*
(no GF division in the loop) as a ``lax.scan`` over the fixed ``2t`` steps
whose state is a handful of length-``t+1`` vectors, fully branchless
(``jnp.where`` on the whole state) and batched over codewords. The Chien
search and Forney evaluation vectorize over all ``n`` positions at once —
no data-dependent control flow anywhere.

On-device GF(256) arithmetic is **gather-free** (log/antilog table lookups
are the classic software form but are poison on TPU): variable×variable
multiply is a bit-sliced carryless product + fixed polynomial reduction
(~50 elementwise integer ops, vectorized over the whole array), inversion
is ``x^254`` by square-and-multiply (13 multiplies), and GF addition is
XOR. All polynomial evaluations batch the terms into one wide multiply and
a log-depth XOR fold.

Errors-only decoding (no erasures), detection via root-count and
post-correction syndrome check.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# GF(256) host tables
# ---------------------------------------------------------------------------

def _gf_tables(primitive: int):
    exp = np.zeros(512, np.int64)
    log = np.zeros(256, np.int64)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= primitive
    exp[255:510] = exp[:255]
    return exp, log


def _gmul_np(a, b, exp, log):
    if a == 0 or b == 0:
        return 0
    return int(exp[log[a] + log[b]])


def _bitmat_of_const(c: int, exp, log) -> np.ndarray:
    """8x8 GF(2) matrix M with bits(c ⊗ v) = M @ bits(v); bit 0 = LSB."""
    m = np.zeros((8, 8), np.uint8)
    for b in range(8):
        p = _gmul_np(c, 1 << b, exp, log)
        for r in range(8):
            m[r, b] = (p >> r) & 1
    return m


# ---------------------------------------------------------------------------
# The code
# ---------------------------------------------------------------------------

class ReedSolomon:
    """RS(n, k) over GF(256), errors-only decoding, ``t = (n-k)//2``.

    ``n < 255`` gives the shortened code (leading symbols implicitly zero).
    ``fcr``: first consecutive root exponent (generator
    ``g(x) = Π_{i=0}^{2t-1} (x − α^{fcr+i})``). Symbols are ints 0..255 on
    the last axis; ``*_bits`` variants speak the modem's bit tensors
    (8 bits per symbol, MSB first).
    """

    def __init__(self, n: int = 255, k: int = 223,
                 primitive: int = 0x11D, fcr: int = 1):
        if not 0 < k < n <= 255:
            raise ValueError("need 0 < k < n <= 255")
        if (n - k) % 2:
            raise ValueError("n - k must be even (t whole)")
        self.n, self.k = int(n), int(k)
        self.p = self.n - self.k
        self.t = self.p // 2
        self.fcr = int(fcr)
        self.primitive = int(primitive)
        self._exp, self._log = _gf_tables(primitive)
        # generator polynomial, low degree first, g[p] = 1
        g = np.zeros(self.p + 1, np.int64)
        g[0] = 1
        deg = 0
        for i in range(self.p):
            root = int(self._exp[(self.fcr + i) % 255])
            ng = np.zeros_like(g)
            for d in range(deg + 1):
                ng[d + 1] ^= g[d]
                ng[d] ^= _gmul_np(int(g[d]), root, self._exp, self._log)
            g = ng
            deg += 1
        self._gen = g  # [p+1]

    # ---- host-built GF(2) matrices ----

    def _xd_mod_g(self, d: int) -> np.ndarray:
        """coeffs (low-first, length p) of x^d mod g(x)."""
        r = np.zeros(self.p, np.int64)
        if d < self.p:
            r[d] = 1
            return r
        r[self.p - 1] = 1  # x^(p-1)
        for _ in range(d - (self.p - 1)):
            top = int(r[self.p - 1])
            r[1:] = r[:-1]
            r[0] = 0
            if top:
                for j in range(self.p):
                    r[j] ^= _gmul_np(top, int(self._gen[j]),
                                     self._exp, self._log)
        return r

    @lru_cache(maxsize=4)
    def _encode_matrix(self) -> np.ndarray:
        """H [k*8, p*8]: parity bits = msg bits @ H (mod 2), MSB first."""
        h = np.zeros((self.k * 8, self.p * 8), np.uint8)
        # incremental: rem_d = x^(p + deg) mod g for msg index i with
        # deg = k-1-i; start at deg 0 and multiply by x each step.
        rem = self._xd_mod_g(self.p)  # deg 0
        rems = [rem.copy()]
        for _ in range(1, self.k):
            top = int(rem[self.p - 1])
            rem[1:] = rem[:-1]
            rem[0] = 0
            if top:
                for j in range(self.p):
                    rem[j] ^= _gmul_np(top, int(self._gen[j]),
                                       self._exp, self._log)
            rems.append(rem.copy())
        for i in range(self.k):
            r = rems[self.k - 1 - i]  # msg index i has degree k-1-i
            for c in range(self.p):
                m = _bitmat_of_const(int(r[c]), self._exp, self._log)
                # parity array index p-1-c holds degree c, MSB-first bits
                for ob in range(8):
                    for ib in range(8):
                        h[i * 8 + (7 - ib), (self.p - 1 - c) * 8 + (7 - ob)] \
                            = m[ob, ib]
        return h

    @lru_cache(maxsize=4)
    def _syndrome_matrix(self) -> np.ndarray:
        """Hs [n*8, 2t*8]: syndrome bits = recv bits @ Hs (mod 2)."""
        hs = np.zeros((self.n * 8, self.p * 8), np.uint8)
        for i in range(self.n):
            d = self.n - 1 - i  # degree of position i
            for j in range(self.p):
                c = int(self._exp[((self.fcr + j) * d) % 255])
                m = _bitmat_of_const(c, self._exp, self._log)
                for ob in range(8):
                    for ib in range(8):
                        hs[i * 8 + (7 - ib), j * 8 + (7 - ob)] = m[ob, ib]
        return hs

    # ---- bit/symbol packing ----

    @staticmethod
    def _to_bits(sym: jnp.ndarray) -> jnp.ndarray:
        sh = jnp.arange(7, -1, -1)
        b = (sym[..., None] >> sh) & 1  # MSB first
        return b.reshape(sym.shape[:-1] + (sym.shape[-1] * 8,))

    @staticmethod
    def _to_syms(bits: jnp.ndarray) -> jnp.ndarray:
        b = bits.reshape(bits.shape[:-1] + (bits.shape[-1] // 8, 8))
        w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1])
        return jnp.sum(b * w, axis=-1)

    # ---- device GF helpers (gather-free) ----

    def _gmul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Elementwise GF(256) multiply, broadcasting: bit-sliced carryless
        product then reduction by the primitive polynomial."""
        a = jnp.asarray(a, jnp.int32)
        b = jnp.asarray(b, jnp.int32)
        p = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), jnp.int32)
        for i in range(8):
            p = p ^ (((b >> i) & 1) * (a << i))
        for k in range(14, 7, -1):
            p = p ^ (((p >> k) & 1) * (self.primitive << (k - 8)))
        return p

    def _ginv(self, x: jnp.ndarray) -> jnp.ndarray:
        """x^254 (= x^{-1} for x != 0; maps 0 -> 0) by square-and-multiply."""
        sq = self._gmul(x, x)
        acc = sq
        for _ in range(6):
            sq = self._gmul(sq, sq)
            acc = self._gmul(acc, sq)
        return acc

    @staticmethod
    def _xor_fold(x: jnp.ndarray) -> jnp.ndarray:
        """XOR-reduce the last axis (GF addition), log-depth."""
        n = x.shape[-1]
        while n > 1:
            h = n // 2
            head = x[..., :h] ^ x[..., h:2 * h]
            x = head if n % 2 == 0 else jnp.concatenate(
                [head, x[..., 2 * h:]], axis=-1)
            n = x.shape[-1]
        return x[..., 0]

    # ---- public API ----

    def encode(self, msg: jnp.ndarray) -> jnp.ndarray:
        """``[..., k]`` symbols -> ``[..., n]`` systematic codeword."""
        if msg.shape[-1] != self.k:
            raise ValueError(f"expected {self.k} symbols, got {msg.shape[-1]}")
        bits = self._to_bits(msg.astype(jnp.int32))
        h = jnp.asarray(self._encode_matrix(), jnp.float32)
        par = jnp.mod(bits.astype(jnp.float32) @ h, 2.0).astype(jnp.int32)
        return jnp.concatenate([msg.astype(jnp.int32),
                                self._to_syms(par)], axis=-1)

    def encode_bits(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., k*8]`` bits -> ``[..., n*8]`` codeword bits."""
        return self._to_bits(self.encode(self._to_syms(bits)))

    def syndromes(self, recv: jnp.ndarray) -> jnp.ndarray:
        """``[..., n]`` received symbols -> ``[..., 2t]`` syndromes."""
        bits = self._to_bits(recv.astype(jnp.int32))
        hs = jnp.asarray(self._syndrome_matrix(), jnp.float32)
        s = jnp.mod(bits.astype(jnp.float32) @ hs, 2.0).astype(jnp.int32)
        return self._to_syms(s)

    def _berlekamp(self, s: jnp.ndarray):
        """Inversionless BM: syndromes ``[..., 2t]`` -> (Λ ``[..., t+1]``,
        L ``[...]``) with Λ low-degree-first (Λ[0] ∝ 1)."""
        lt = self.t + 1
        batch = s.shape[:-1]
        c0 = jnp.zeros(batch + (lt,), jnp.int32).at[..., 0].set(1)
        b0 = jnp.zeros(batch + (lt,), jnp.int32).at[..., 0].set(1)
        carry0 = (c0, b0, jnp.zeros(batch, jnp.int32),
                  jnp.ones(batch, jnp.int32))

        sp = jnp.moveaxis(s, -1, 0)  # [2t, ...]
        # prebuild windows: at step r, need S[r], S[r-1], ..., S[r-t]
        def step(carry, xs):
            c, b, l, bb = carry
            r, s_win = xs  # s_win [..., t+1] = S[r-j] for j=0..t (0 pad)
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

        # windows on host side of the scan: gather S[r-j]
        t_ax = self.t
        idx = (np.arange(self.p)[:, None] - np.arange(t_ax + 1)[None, :])
        valid = idx >= 0
        idx = np.where(valid, idx, 0)
        wins = jnp.where(jnp.asarray(valid)[(...,) + (None,) * len(batch)],
                         sp[jnp.asarray(idx)], 0)  # [2t, t+1, ...]
        wins = jnp.moveaxis(wins, 1, -1)  # [2t, ..., t+1]
        rs = jnp.arange(self.p)
        (c, _, l, _), _ = jax.lax.scan(step, carry0, (rs, wins))
        return c, l

    def decode(self, recv: jnp.ndarray):
        """``[..., n]`` received symbols -> ``(msg [..., k], ok [...])``.

        Corrects up to ``t`` symbol errors per codeword; ``ok`` is False
        when the error pattern is uncorrectable (root count mismatch or
        residual syndromes after correction).
        """
        if recv.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} symbols, got {recv.shape[-1]}")
        recv = recv.astype(jnp.int32)
        s = self.syndromes(recv)
        lam, l = self._berlekamp(s)

        lt = self.t + 1
        # Chien: eval Λ at α^{-d} for every position degree d = n-1-i —
        # one wide multiply [..., n, t+1] + a log-depth XOR fold.
        degs = self.n - 1 - np.arange(self.n)             # [n]
        kpow = np.mod(-degs[:, None] * np.arange(lt)[None, :], 255)
        kmat = jnp.asarray(self._exp[kpow], jnp.int32)    # [n, t+1]
        ev = self._xor_fold(self._gmul(lam[..., None, :], kmat))
        err_here = ev == 0                                 # [..., n]
        n_roots = jnp.sum(err_here.astype(jnp.int32), axis=-1)

        # Ω = S·Λ mod x^{2t}: one outer multiply [..., 2t, t+1], then the
        # anti-diagonal (convolution) sums as t+1 shifted XORs.
        om_len = self.p
        outer = self._gmul(s[..., :, None], lam[..., None, :])
        om = outer[..., :, 0]
        for j in range(1, lt):
            shifted = jnp.concatenate(
                [jnp.zeros_like(outer[..., :j, j]),
                 outer[..., : om_len - j, j]], axis=-1)
            om = om ^ shifted

        # Forney at X = α^{d}: Y = X^{1-fcr} · Ω(X^{-1}) / Λ'(X^{-1})
        opow = np.mod(-degs[:, None] * np.arange(om_len)[None, :], 255)
        omat = jnp.asarray(self._exp[opow], jnp.int32)    # [n, 2t]
        om_x = self._xor_fold(self._gmul(om[..., None, :], omat))
        # Λ'(x) = sum over odd j of Λ_j x^{j-1}: zero the even columns of
        # the power matrix so one wide multiply + fold covers it.
        dpow = np.mod(-degs[:, None] * (np.arange(lt) - 1)[None, :], 255)
        dmat_np = self._exp[dpow].copy()
        dmat_np[:, 0::2] = 0
        dmat = jnp.asarray(dmat_np, jnp.int32)
        dlam_x = self._xor_fold(self._gmul(lam[..., None, :], dmat))
        xfac = jnp.asarray(
            self._exp[np.mod((1 - self.fcr) * degs, 255)], jnp.int32)
        mag = self._gmul(self._gmul(om_x, self._ginv(dlam_x)), xfac)
        corr = recv ^ jnp.where(err_here, mag, 0)

        ok = (n_roots == l) & jnp.all(self.syndromes(corr) == 0, axis=-1)
        # no errors at all: syndromes zero -> Λ = 1, L = 0, no roots... but
        # Chien finds no roots and corr == recv, ok True by the check above.
        return corr[..., : self.k], ok

    def decode_bits(self, bits: jnp.ndarray):
        """``[..., n*8]`` hard bits -> ``(msg bits [..., k*8], ok [...])``."""
        msg, ok = self.decode(self._to_syms(bits))
        return self._to_bits(msg), ok


def rs_255_223() -> ReedSolomon:
    """The classic t=16 deep-space outer code (255, 223)."""
    return ReedSolomon(255, 223)


def rs_dvb() -> ReedSolomon:
    """DVB RS(204, 188): the shortened (255, 239) t=8 code, fcr=0."""
    return ReedSolomon(204, 188, fcr=0)

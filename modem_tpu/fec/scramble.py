"""Additive (synchronous) LFSR scrambler, block-parallel over GF(2).

New capability (the reference has no scrambler; this is part of the framing
layer every deployed modem puts around the mapping the reference implements,
`/root/reference/src/bin/modulate.rs:96-133`).

TPU-first shape: an LFSR is a linear recurrence over GF(2), so the whole
keystream is a *linear function of the seed state* — no scan needed.  With
companion matrix ``M`` and output row ``c``, bit ``j`` of the keystream is
``c · M^j · s0``.  We precompute (host, cached per (poly, block)) the
``[B, m]`` bit matrix ``C`` with rows ``c·M^j`` and the ``[m, m]`` state
advance ``M^B``; on device a block of ``B`` keystream bits is then ONE tiny
``[..., m] x [m, B]`` matmul mod 2, batched over channels, and the carried
state advances by a second ``[m, m]`` matmul — streaming state carry in the
same explicit-pytree style as every other op in this framework.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp


class Scrambler:
    """Additive scrambler with generator polynomial ``poly`` of degree ``m``.

    ``poly``: integer with bit ``i`` set for term ``x^i`` (bit ``m`` — the
    leading term — must be set).  Fibonacci form: feedback bit =
    XOR of state bits at the non-leading set terms; the keystream bit is the
    feedback bit itself (the standard DVB/IESS framing convention).

    ``seed``: initial register contents, bit ``i`` = state cell ``i`` where
    cell ``m-1`` holds the oldest bit (shifted out first).
    """

    def __init__(self, poly: int, seed: int):
        m = poly.bit_length() - 1
        if m < 2:
            raise ValueError("polynomial degree must be >= 2")
        if seed <= 0 or seed >= 1 << m:
            raise ValueError(f"seed must be a nonzero {m}-bit value")
        self.m = m
        self.poly = int(poly)
        self.seed = int(seed)
        # Companion matrix over GF(2): state s' = M s.  State layout:
        # cell i holds the bit produced i steps ago... we use the direct
        # form: feedback f = XOR_{i in taps} s[i]; shift s -> (s << 1 | f)
        # dropping cell m-1;  s'[0] = f, s'[i] = s[i-1].
        taps = [i for i in range(m) if (poly >> i) & 1]
        mat = np.zeros((m, m), np.uint8)
        for i in taps:
            mat[0, i] = 1
        for i in range(1, m):
            mat[i, i - 1] = 1
        self._mat = mat
        self._out = mat[0].copy()  # keystream bit = feedback bit = (M s)[0]

    @lru_cache(maxsize=32)
    def _block_mats(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        """(C [b, m], A [m, m]): keystream = C·s0, next state = A·s0."""
        c = np.zeros((b, self.m), np.uint8)
        p = np.eye(self.m, dtype=np.uint8)  # M^j
        for j in range(b):
            c[j] = (self._out @ p) % 2
            p = (self._mat @ p) % 2
        return c, p

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> jnp.ndarray:
        """Seed register as a ``[..., m]`` int32 bit vector."""
        bits = [(self.seed >> i) & 1 for i in range(self.m)]
        s = jnp.asarray(bits, jnp.int32)
        return jnp.broadcast_to(s, batch_shape + (self.m,))

    def keystream(self, state: jnp.ndarray, length: int):
        """``([..., m] state, B)`` -> (``[..., B]`` keystream, next state)."""
        c, a = self._block_mats(length)
        ks = (state @ jnp.asarray(c.T, jnp.int32)) % 2
        nxt = (state @ jnp.asarray(a.T, jnp.int32)) % 2
        return ks, nxt

    def scramble(self, bits: jnp.ndarray, state: jnp.ndarray):
        """XOR a block of bits with the keystream; returns (out, state).

        Additive scrambling is an involution: applying ``scramble`` again
        from the same state descrambles.
        """
        ks, nxt = self.keystream(state, bits.shape[-1])
        return (bits + ks) % 2, nxt

    descramble = scramble


def dvb_scrambler() -> Scrambler:
    """The DVB framing scrambler: 1 + x^14 + x^15, seed 100101010000000."""
    return Scrambler((1 << 15) | (1 << 14) | 1, 0b100101010000000)


def ieee80211_scrambler(seed: int = 0b1011101) -> Scrambler:
    """The 802.11 scrambler: x^7 + x^4 + 1."""
    return Scrambler((1 << 7) | (1 << 4) | 1, seed)

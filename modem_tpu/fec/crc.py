"""Cyclic redundancy checks as GF(2) linear algebra, batched over channels.

New capability (the reference has no framing/integrity layer; this closes
the burst-modem loop: a CRC tells the link layer whether the payload
:class:`modem_tpu.sync.AcquiringReceiver` + FEC recovered is actually
correct).

TPU-first shape: a (non-reflected) CRC is an *affine* function of the
message bits: ``crc(msg) = H · msg  +  r0(L)  (mod 2)`` where column ``i``
of ``H`` is the remainder ``x^{L-1-i+w} mod g(x)`` and ``r0`` is the
contribution of the ``init`` register.  We precompute ``H`` on the host
(one ``O(L)`` pass of integer shifts, cached per (poly, L)) and evaluate
on device as a single ``[..., L] x [L, w]`` matmul mod 2 — no scan, fully
parallel over time and channels, MXU-friendly for wide batches.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp


class Crc:
    """Bit-level CRC, MSB-first, non-reflected.

    ``poly``: generator without the leading ``x^w`` term (the usual
    truncated notation, e.g. CCITT ``0x1021`` for width 16);
    ``init``: register preload; ``xorout``: final XOR.
    """

    def __init__(self, width: int, poly: int, init: int = 0,
                 xorout: int = 0):
        if width < 2 or width > 64:
            raise ValueError("width must be in [2, 64]")
        self.w = int(width)
        self.poly = int(poly)
        self.init = int(init)
        self.xorout = int(xorout)

    # ---- host-side reference bit loop (also builds the matrices) ----

    def _crc_int(self, bits: np.ndarray, init: int) -> int:
        r = init
        mask = (1 << self.w) - 1
        for b in bits:
            fb = ((r >> (self.w - 1)) & 1) ^ int(b)
            r = ((r << 1) & mask)
            if fb:
                r ^= self.poly
        return r

    @lru_cache(maxsize=32)
    def _affine(self, l: int) -> tuple[np.ndarray, np.ndarray]:
        """(H [l, w], r0 [w]): crc_bits = msg @ H + r0 (mod 2), MSB first."""
        # Column for message bit i = x^{(L-1-i)+w} mod g, built by one
        # backward pass: t <- (t * x) mod g starting from x^w mod g.
        mask = (1 << self.w) - 1
        h = np.zeros((l, self.w), np.uint8)
        t = self.poly & mask  # x^w mod g
        for j in range(l):  # j = L-1-i
            i = l - 1 - j
            for k in range(self.w):
                h[i, k] = (t >> (self.w - 1 - k)) & 1  # MSB first
            fb = (t >> (self.w - 1)) & 1
            t = (t << 1) & mask
            if fb:
                t ^= self.poly
        r0 = self._crc_int(np.zeros(l, np.uint8), self.init) ^ self.xorout
        r0 = np.array([(r0 >> (self.w - 1 - k)) & 1 for k in range(self.w)],
                      np.uint8)
        return h, r0

    # ---- device ops ----

    def compute(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., L]`` message bits -> ``[..., w]`` CRC bits (MSB first)."""
        h, r0 = self._affine(bits.shape[-1])
        c = bits.astype(jnp.int32) @ jnp.asarray(h, jnp.int32)
        return (c + jnp.asarray(r0, jnp.int32)) % 2

    def append(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Message -> message ‖ CRC (``[..., L+w]``)."""
        return jnp.concatenate([bits, self.compute(bits)], axis=-1)

    def check(self, frame: jnp.ndarray) -> jnp.ndarray:
        """``[..., L+w]`` frame -> boolean ``[...]`` pass/fail."""
        msg = frame[..., : frame.shape[-1] - self.w]
        got = frame[..., frame.shape[-1] - self.w:]
        return jnp.all(self.compute(msg) == got, axis=-1)


def crc16_ccitt() -> Crc:
    """CRC-16/CCITT-FALSE (CCSDS TM frames): 0x1021, init 0xFFFF."""
    return Crc(16, 0x1021, init=0xFFFF)


def crc32_mpeg2() -> Crc:
    """CRC-32/MPEG-2: 0x04C11DB7, init 0xFFFFFFFF, non-reflected."""
    return Crc(32, 0x04C11DB7, init=0xFFFFFFFF)

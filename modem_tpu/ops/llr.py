"""Soft-decision output: per-bit log-likelihood ratios.

The reference emits soft I/Q text and stops (`demodulate.rs:41-43`); a
complete receiver also exposes per-bit LLRs for downstream FEC. Max-log LLRs
over an arbitrary constellation as one batched matmul + masked mins:

    LLR_j = (min_{c: bit_j(c)=1} |y-c|^2 - min_{c: bit_j(c)=0} |y-c|^2) / (2*sigma^2)

Positive LLR = bit 0 more likely (the usual convention); the sign of the LLR
therefore reproduces the hard decision's bits exactly for any constellation
where per-bit subsets are decided by the nearest point (tested against
:func:`modem_tpu.ops.slicer.lut_slice`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def lut_llr(
    i: jnp.ndarray,
    q: jnp.ndarray,
    lut: np.ndarray,
    bits_per_symbol: int,
    noise_var: float = 1.0,
) -> jnp.ndarray:
    """Max-log LLRs: decision-point I/Q ``[..., K]`` -> ``[..., K*bps]``.

    ``lut``: static ``[M, 2]`` constellation (symbol index = MSB-first bit
    pattern, as everywhere in this framework); ``noise_var`` is the per-rail
    noise variance sigma^2 at the decision point (``N0/2``).
    """
    lut = np.asarray(lut, np.float32)
    m = lut.shape[0]
    if m != 1 << bits_per_symbol:
        raise ValueError(f"lut has {m} points, expected 2^{bits_per_symbol}")
    y = jnp.stack([i, q], axis=-1)  # [..., K, 2]
    # |y - c|^2 = |y|^2 - 2<y, c> + |c|^2; |y|^2 is common to both mins and
    # cancels in the difference, so skip it.
    cross = y @ jnp.asarray(lut.T)  # [..., K, M]
    d2 = jnp.asarray(np.sum(lut * lut, axis=-1)) - 2.0 * cross

    sym = np.arange(m)
    llrs = []
    for j in range(bits_per_symbol):
        bit = (sym >> (bits_per_symbol - 1 - j)) & 1  # MSB first
        m0 = jnp.asarray(np.where(bit == 0, 0.0, np.inf), jnp.float32)
        m1 = jnp.asarray(np.where(bit == 1, 0.0, np.inf), jnp.float32)
        d0 = jnp.min(d2 + m0, axis=-1)
        d1 = jnp.min(d2 + m1, axis=-1)
        llrs.append(d1 - d0)
    out = jnp.stack(llrs, axis=-1) / jnp.float32(2.0 * noise_var)
    return out.reshape(out.shape[:-2] + (out.shape[-2] * bits_per_symbol,))


def llr_hard_bits(llrs: jnp.ndarray) -> jnp.ndarray:
    """Hard decisions from LLRs: bit = 1 where LLR < 0."""
    return (llrs < 0).astype(jnp.int32)

"""Bit/symbol packing as batched tensor ops.

The reference packs a bit-slice into an integer symbol MSB-first one symbol at a
time (`/root/reference/src/modem/digital/util.rs:5-11`, `bytes_to_bits`) and maps a
bit 0/1 to a sign -1/+1 (`digital/util.rs:1-3`, `bit_to_sign`). Here both are
whole-tensor transforms over a ``[..., n_bits]`` bit plane: a single tiny matmul /
dot against a power-of-two weight vector packs every symbol in the block at once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def max_symbol(bits_per_symbol: int) -> int:
    """2**bps - 1, mirroring `digital/util.rs:13-15`."""
    return (1 << bits_per_symbol) - 1


def pack_bits(bits: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Pack ``[..., K*bps]`` {0,1} bits into ``[..., K]`` int32 symbols, MSB first.

    Vectorized equivalent of `digital/util.rs:5-11`. Trailing bits that do not
    fill a whole symbol must already be trimmed by the caller (the reference's
    `data.rs:54-63` simply stops at the last full symbol).
    """
    if bits.shape[-1] % bits_per_symbol != 0:
        raise ValueError(
            f"bit count {bits.shape[-1]} not a multiple of bps={bits_per_symbol}"
        )
    k = bits.shape[-1] // bits_per_symbol
    groups = bits.reshape(bits.shape[:-1] + (k, bits_per_symbol)).astype(jnp.int32)
    weights = jnp.asarray(
        np.left_shift(1, np.arange(bits_per_symbol - 1, -1, -1)), dtype=jnp.int32
    )
    return jnp.sum(groups * weights, axis=-1)


def unpack_symbols(symbols: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Inverse of :func:`pack_bits`: ``[..., K]`` int32 -> ``[..., K*bps]`` bits."""
    shifts = jnp.arange(bits_per_symbol - 1, -1, -1, dtype=jnp.int32)
    bits = (symbols[..., None] >> shifts) & 1
    return bits.reshape(symbols.shape[:-1] + (symbols.shape[-1] * bits_per_symbol,))


def bit_to_sign(bits: jnp.ndarray) -> jnp.ndarray:
    """0/1 -> -1.0/+1.0, mirroring `digital/util.rs:1-3`."""
    return (2 * bits - 1).astype(jnp.float32)

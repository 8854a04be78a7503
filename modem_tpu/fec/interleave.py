"""Block (row/column) interleaving.

Breaks up burst errors — a fading dip or an equalizer transient corrupts a
run of adjacent code bits; spreading them across the block turns one long
error event into many short ones the convolutional decoder can absorb. Pure
static reshapes/transposes (zero FLOPs, XLA folds them into surrounding
layouts)."""

from __future__ import annotations

import jax.numpy as jnp


def block_interleave(bits: jnp.ndarray, rows: int) -> jnp.ndarray:
    """``[..., L]`` -> ``[..., L]``, written row-wise / read column-wise.
    ``L`` must divide by ``rows``."""
    l = bits.shape[-1]
    if l % rows:
        raise ValueError(f"block length {l} must divide by rows={rows}")
    x = bits.reshape(bits.shape[:-1] + (rows, l // rows))
    return jnp.swapaxes(x, -1, -2).reshape(bits.shape)


def block_deinterleave(bits: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Inverse of :func:`block_interleave` (same ``rows``)."""
    l = bits.shape[-1]
    if l % rows:
        raise ValueError(f"block length {l} must divide by rows={rows}")
    x = bits.reshape(bits.shape[:-1] + (l // rows, rows))
    return jnp.swapaxes(x, -1, -2).reshape(bits.shape)

"""Halo-exchange and prefix-scan collectives for time-axis sharding.

These run *inside* ``jax.shard_map`` over a named mesh axis and compile to XLA
``ppermute``/``all_gather`` over ICI (SURVEY.md section 2.6: the
ring-attention analog for this domain). Devices with no neighbor receive
**zeros** from ``ppermute`` — which exactly matches the reference FIR's
zero-initialized history (`/root/reference/src/modem/fir.rs:12-15`) and the
zero flush convention of the pulse-shaped chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def left_halo(x: jnp.ndarray, h: int, axis_name: str) -> jnp.ndarray:
    """Each device receives the *last* ``h`` samples of its left neighbor.

    ``x``: local block ``[..., n]``. Returns ``[..., h]``; device 0 gets zeros.
    """
    n_dev = jax.lax.axis_size(axis_name)
    tail = x[..., x.shape[-1] - h:]
    if n_dev == 1:
        return jnp.zeros_like(tail)
    perm = [(i, i + 1) for i in range(n_dev - 1)]
    return jax.lax.ppermute(tail, axis_name, perm)


def right_halo(x: jnp.ndarray, h: int, axis_name: str) -> jnp.ndarray:
    """Each device receives the *first* ``h`` samples of its right neighbor.

    Returns ``[..., h]``; the last device gets zeros.
    """
    n_dev = jax.lax.axis_size(axis_name)
    head = x[..., :h]
    if n_dev == 1:
        return jnp.zeros_like(head)
    perm = [(i + 1, i) for i in range(n_dev - 1)]
    return jax.lax.ppermute(head, axis_name, perm)


def exclusive_prefix(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Exclusive prefix sum of per-device values across a mesh axis.

    ``x``: a local per-device value ``[...]`` (e.g. this block's total phase
    increment for a DMPSK/FSK accumulator, SURVEY.md section 3.4). Device ``d``
    receives ``sum_{d' < d} x_{d'}`` — device 0 gets zeros. One tiny
    ``all_gather`` + masked sum: the per-device payload is O(state), not
    O(samples), so this rides ICI in a single microsecond-scale collective.
    """
    n_dev = jax.lax.axis_size(axis_name)
    if n_dev == 1:
        return jnp.zeros_like(x)
    idx = jax.lax.axis_index(axis_name)
    allv = jax.lax.all_gather(x, axis_name, axis=0)  # [n_dev, ...]
    mask = (jnp.arange(n_dev) < idx).astype(allv.dtype)
    mask = mask.reshape((n_dev,) + (1,) * (allv.ndim - 1))
    return jnp.sum(allv * mask, axis=0)

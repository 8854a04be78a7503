"""Hierarchical modular prefix sums.

Every stateful per-symbol ``update()`` in the reference is an associative phase
accumulation (`dmpsk.rs:29-33`, `mfsk.rs:68-75`, `bfsk.rs:43-55`, `dcqpsk.rs:42-44`):
``phase[k] = (phase0 + sum_{j<=k} delta[j]) mod M``. On TPU we replace the sequential
loop with a parallel prefix sum. Two robustness concerns drive the hierarchical
implementation below:

* **int32 overflow**: exact FSK phase arithmetic is done in integer "sample-rate
  units" (phase = 2*pi*u/sr). A flat ``cumsum`` over a long block can overflow
  int32; reducing chunk-wise keeps every partial sum < 256*M.
* **f32 drift**: float accumulators (DMPSK turns) lose precision when the running
  sum grows; chunk-wise mod keeps magnitudes O(chunk).

Both are inclusive scans along the last axis.
"""

from __future__ import annotations

import jax.numpy as jnp

_CHUNK = 256


def cummod(x: jnp.ndarray, m) -> jnp.ndarray:
    """Inclusive prefix-sum of ``x`` modulo ``m`` along the last axis.

    Works for integer ``x`` with integer ``m`` (exact) and float ``x`` with float
    ``m``. Inputs are reduced mod ``m`` first, so arbitrary-magnitude deltas are
    fine. The result is always in ``[0, m)``.
    """
    x = x % m
    n = x.shape[-1]
    if n <= _CHUNK:
        return jnp.cumsum(x, axis=-1) % m

    pad = (-n) % _CHUNK
    if pad:
        xp = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)], axis=-1
        )
    else:
        xp = x
    chunks = xp.reshape(x.shape[:-1] + ((n + pad) // _CHUNK, _CHUNK))
    inner = jnp.cumsum(chunks, axis=-1) % m  # [..., n_chunks, CHUNK]
    totals = inner[..., -1]  # [..., n_chunks]
    # Exclusive prefix over chunk totals, itself reduced recursively.
    carry = cummod(totals, m)
    carry = jnp.concatenate(
        [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1
    )
    out = (inner + carry[..., None]) % m
    return out.reshape(x.shape[:-1] + (n + pad,))[..., :n]

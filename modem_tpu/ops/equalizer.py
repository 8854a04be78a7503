"""Data-aided linear MMSE equalization at symbol rate.

New capability (the reference has no equalizer — its channel is a shell
pipe). A preamble-trained complex FIR corrects inter-symbol interference
from multipath that the matched filter alone cannot: taps are the
regularized least-squares solution of ``min ||conv(d, w) - a||^2`` over the
known preamble, computed **on device** as batched normal equations — a
``[2T, 2T]`` solve per channel, which is exactly the small-matmul shape the
MXU eats — so training jits, vmaps, and shards with the rest of the
acquisition graph (no scipy round-trip).

Complex math uses the real 2x-block formulation (the axon backend has no
complex dtype): with windows ``X = Xr + j*Xi`` and taps ``w = wr + j*wi``,

    [yr]   [Xr  -Xi] [wr]
    [yi] = [Xi   Xr] [wi]

Functions:
* :func:`symbol_windows` — centered ``[..., K, T]`` gather of a symbol
  sequence (zero-padded edges).
* :func:`train_lmmse` — taps from received preamble + known symbols.
* :func:`apply_equalizer` — run the trained taps over a sequence.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def symbol_windows(d: jnp.ndarray, n_taps: int) -> jnp.ndarray:
    """``[..., K] -> [..., K, n_taps]``: row ``k`` holds
    ``d[k-c .. k+n_taps-1-c]`` with ``c = n_taps//2`` (cursor-centered,
    zero-padded at the edges)."""
    c = n_taps // 2
    pad_l = jnp.zeros(d.shape[:-1] + (c,), d.dtype)
    pad_r = jnp.zeros(d.shape[:-1] + (n_taps - 1 - c,), d.dtype)
    dp = jnp.concatenate([pad_l, d, pad_r], axis=-1)
    k = d.shape[-1]
    idx = (jnp.arange(k, dtype=jnp.int32)[:, None]
           + jnp.arange(n_taps, dtype=jnp.int32)[None, :])
    return dp[..., idx]


def train_lmmse(
    di: jnp.ndarray,
    dq: jnp.ndarray,
    targets: np.ndarray | jnp.ndarray,
    n_taps: int,
    ridge: float = 1e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LMMSE taps from received preamble decision points.

    ``di, dq [..., P]``: received symbol-rate samples over the known
    preamble; ``targets [P, 2]`` (or ``[..., P, 2]``): the transmitted
    symbols' I/Q. Returns ``(wr, wi) [..., n_taps]`` minimizing
    ``||X w - a||^2 + ridge*trace(X^H X)/(2T) * ||w||^2`` — the ridge is
    scaled by the data power so regularization strength is SNR-relative,
    not unit-dependent.
    """
    t = jnp.asarray(targets, jnp.float32)
    ar, ai = t[..., 0], t[..., 1]
    xr = symbol_windows(di, n_taps)  # [..., P, T]
    xi = symbol_windows(dq, n_taps)
    # G = [[Xr, -Xi], [Xi, Xr]]  (2P x 2T), b = [ar; ai]  (2P)
    top = jnp.concatenate([xr, -xi], axis=-1)
    bot = jnp.concatenate([xi, xr], axis=-1)
    g = jnp.concatenate([top, bot], axis=-2)  # [..., 2P, 2T]
    b = jnp.concatenate([ar, ai], axis=-1)[..., None]  # [..., 2P, 1]
    gtg = jnp.swapaxes(g, -1, -2) @ g  # [..., 2T, 2T]
    gtb = jnp.swapaxes(g, -1, -2) @ b  # [..., 2T, 1]
    tt = 2 * n_taps
    scale = jnp.trace(gtg, axis1=-2, axis2=-1)[..., None, None] / tt
    w = jnp.linalg.solve(gtg + ridge * scale * jnp.eye(tt, dtype=gtg.dtype),
                         gtb)[..., 0]
    return w[..., :n_taps], w[..., n_taps:]


def apply_equalizer(
    di: jnp.ndarray,
    dq: jnp.ndarray,
    wr: jnp.ndarray,
    wi: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex FIR at symbol rate with (possibly per-channel) trained taps:
    ``y = conv(d, w)``, cursor-centered like :func:`symbol_windows`."""
    n_taps = wr.shape[-1]
    xr = symbol_windows(di, n_taps)
    xi = symbol_windows(dq, n_taps)
    yr = jnp.einsum("...kt,...t->...k", xr, wr) - jnp.einsum(
        "...kt,...t->...k", xi, wi)
    yi = jnp.einsum("...kt,...t->...k", xi, wr) + jnp.einsum(
        "...kt,...t->...k", xr, wi)
    return yr, yi

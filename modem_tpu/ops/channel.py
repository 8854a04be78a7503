"""Channel models for BER harnesses (new capability; the reference has no
channel or noise model — SURVEY.md "What the reference is NOT")."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn(
    key: jax.Array,
    i: jnp.ndarray,
    q: jnp.ndarray,
    snr_db: float,
    signal_power: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Add complex white Gaussian noise at the given SNR (per complex sample).

    ``signal_power``: average |s|^2; measured from the block if None.
    Noise variance N0 = P / 10^(SNR/10), split evenly across I and Q.
    """
    if signal_power is None:
        p = jnp.mean(i * i + q * q)
    else:
        p = jnp.float32(signal_power)
    n0 = p / (10.0 ** (snr_db / 10.0))
    k1, k2 = jax.random.split(key)
    sigma = jnp.sqrt(n0 / 2.0)
    ni = sigma * jax.random.normal(k1, i.shape, i.dtype)
    nq = sigma * jax.random.normal(k2, q.shape, q.dtype)
    return i + ni, q + nq


def awgn_real(
    key: jax.Array, x: jnp.ndarray, snr_db: float,
    signal_power: float | None = None,
) -> jnp.ndarray:
    """AWGN for a real passband waveform."""
    p = jnp.mean(x * x) if signal_power is None else jnp.float32(signal_power)
    sigma = jnp.sqrt(p / (10.0 ** (snr_db / 10.0)))
    return x + sigma * jax.random.normal(key, x.shape, x.dtype)

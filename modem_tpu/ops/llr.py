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


def _bitwise_min_llrs(
    d2: jnp.ndarray, bits_per_symbol: int, noise_var: float
) -> jnp.ndarray:
    """Shared max-log core: per-candidate squared distances ``[..., K, M]``
    -> per-bit LLRs ``[..., K*bps]`` via masked mins (MSB-first bits)."""
    m = d2.shape[-1]
    sym = np.arange(m)
    llrs = []
    for j in range(bits_per_symbol):
        bit = (sym >> (bits_per_symbol - 1 - j)) & 1
        m0 = jnp.asarray(np.where(bit == 0, 0.0, np.inf), jnp.float32)
        m1 = jnp.asarray(np.where(bit == 1, 0.0, np.inf), jnp.float32)
        llrs.append(jnp.min(d2 + m1, axis=-1) - jnp.min(d2 + m0, axis=-1))
    out = jnp.stack(llrs, axis=-1) / jnp.float32(2.0 * noise_var)
    return out.reshape(out.shape[:-2] + (out.shape[-2] * bits_per_symbol,))


def fsk_llr(
    mean_f: jnp.ndarray,
    coefs: np.ndarray,
    dev_rad_per_sample: float,
    bits_per_symbol: int,
    noise_var: float = 1.0,
) -> jnp.ndarray:
    """Discriminator-domain max-log LLRs for the FSK family.

    The FSK decision statistic is the per-symbol interior mean of the
    instantaneous frequency (:func:`modem_tpu.ops.slicer.fsk_symbol_means`);
    at moderate SNR it is approximately Gaussian around the TX tone
    ``coef * dev`` (rad/sample), so

        LLR_j = (min_{m: bit_j=1} (f - c_m*dev)^2
                 - min_{m: bit_j=0} (f - c_m*dev)^2) / (2 * noise_var)

    with ``noise_var`` the discriminator-domain variance of ``mean_f``.
    Sign-of-LLR reproduces :func:`modem_tpu.ops.slicer.fsk_slice` exactly.
    The reference stops at soft I/Q for every scheme (`demodulate.rs:41-43`);
    this closes the soft surface for the FSK family.
    """
    targets = np.asarray(coefs, np.float32) * np.float32(dev_rad_per_sample)
    if 1 << bits_per_symbol != targets.shape[0]:
        raise ValueError(
            f"{targets.shape[0]} coefs for 2^{bits_per_symbol} symbols"
        )
    d2 = (mean_f[..., None] - jnp.asarray(targets)) ** 2  # [..., K, M]
    return _bitwise_min_llrs(d2, bits_per_symbol, noise_var)


def dmpsk_llr(
    dphi: jnp.ndarray,
    shift: float,
    bits_per_symbol: int,
    noise_var: float = 1.0,
) -> jnp.ndarray:
    """Differential-phase max-log LLRs for DMPSK (DBPSK/DQPSK).

    ``dphi``: per-symbol phase change between consecutive decision points
    ``[..., K]`` (radians, as computed by
    :func:`modem_tpu.ops.slicer.diff_phase_slice`); candidate symbols sit at
    ``m * shift`` on the circle, compared by *wrapped* angular distance, so
    the sign of each LLR reproduces the hard differential decisions for any
    full-circle shift (``shift = 2*pi / M``). ``noise_var`` is the
    differential-phase variance (~2x the per-decision phase variance, since
    two noisy decision points enter each difference).
    """
    m = 1 << bits_per_symbol
    cand = shift * np.arange(m, dtype=np.float32)
    err = dphi[..., None] - jnp.asarray(cand)
    two_pi = jnp.float32(2.0 * np.pi)
    wrapped = jnp.mod(err + jnp.float32(np.pi), two_pi) - jnp.float32(np.pi)
    return _bitwise_min_llrs(wrapped * wrapped, bits_per_symbol, noise_var)

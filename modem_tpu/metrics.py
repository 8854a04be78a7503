"""Link-quality metrics: BER / SER / EVM / SNR estimate.

First-class outputs of the chain (the reference has no metrics at all —
SURVEY.md section 5 'Metrics / logging / observability')."""

from __future__ import annotations

import jax.numpy as jnp


def bit_errors(tx_bits: jnp.ndarray, rx_bits: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(tx_bits.astype(jnp.int32) != rx_bits.astype(jnp.int32))


def ber(tx_bits: jnp.ndarray, rx_bits: jnp.ndarray) -> jnp.ndarray:
    return bit_errors(tx_bits, rx_bits) / tx_bits.size


def ser(tx_syms: jnp.ndarray, rx_syms: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(tx_syms != rx_syms) / tx_syms.size


def evm_rms(
    rx_i: jnp.ndarray, rx_q: jnp.ndarray, ref_i: jnp.ndarray, ref_q: jnp.ndarray
) -> jnp.ndarray:
    """RMS error-vector magnitude, normalized to RMS reference power."""
    err = (rx_i - ref_i) ** 2 + (rx_q - ref_q) ** 2
    ref = ref_i**2 + ref_q**2
    return jnp.sqrt(jnp.mean(err) / jnp.mean(ref))


def snr_estimate_db(
    rx_i: jnp.ndarray, rx_q: jnp.ndarray, ref_i: jnp.ndarray, ref_q: jnp.ndarray
) -> jnp.ndarray:
    err = (rx_i - ref_i) ** 2 + (rx_q - ref_q) ** 2
    ref = ref_i**2 + ref_q**2
    return 10.0 * jnp.log10(jnp.mean(ref) / jnp.mean(err))

"""Link-level simulation harnesses: BER waterfalls on hardware.

The fused chain kernel (:mod:`modem_tpu.ops.pallas_chain`) draws AWGN with
the on-core PRNG, so an entire Monte-Carlo BER point — TX waveform synthesis,
channel, matched filter, decisions, error counting — runs on-chip per block.
Calibration is validated against closed-form theory (see
:func:`qpsk_ber_theory`; measured/theory agrees to a few percent).

The reference has no channel, no noise, and no BER measurement (SURVEY.md
"What the reference is NOT") — this subsystem is new capability.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax.numpy as jnp

from .chain import PulseShapedChain
from .utils.bits import unpack_symbols


def q_function(x: float) -> float:
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def qpsk_ber_theory(es_n0_db: float) -> float:
    """QPSK (gray, per-rail) BER = Q(sqrt(Es/N0)) = Q(sqrt(2*Eb/N0))."""
    return q_function(math.sqrt(10.0 ** (es_n0_db / 10.0)))


def natural_binary_flip_factor(levels: int) -> float:
    """Average bit flips per adjacent-level error for natural binary codes.

    The reference's QAM maps each rail as level = 2*s - max with *natural
    binary* s (`qam.rs:32-38`), not gray code, so an adjacent-level slip can
    flip several bits: e.g. 01 -> 10. For L levels the average over the L-1
    adjacent transitions is sum(trailing_ones(i) + 1) / (L - 1): 4/3 for
    L=4 (16-QAM), ~1.53 for L=16 (256-QAM).
    """
    total = 0
    for i in range(levels - 1):
        t, v = 1, i
        while v & 1:
            t += 1
            v >>= 1
        total += t
    return total / (levels - 1)


def mqam_ber_theory(es_n0_db: float, m: int, gray: bool = False) -> float:
    """Square M-QAM nearest-neighbor BER approximation:
    4/log2(M) * (1 - 1/sqrt(M)) * Q(sqrt(3/(M-1) * Es/N0)), scaled by the
    natural-binary flip factor unless ``gray`` (this framework reproduces the
    reference's natural-binary mapping, `qam.rs:32-38`)."""
    k = math.log2(m)
    es_n0 = 10.0 ** (es_n0_db / 10.0)
    ber = (4.0 / k) * (1.0 - 1.0 / math.sqrt(m)) * q_function(
        math.sqrt(3.0 / (m - 1.0) * es_n0)
    )
    if not gray:
        ber *= natural_binary_flip_factor(int(math.isqrt(m)))
    return ber


@dataclasses.dataclass(frozen=True)
class BerPoint:
    snr_db: float
    bit_errors: int
    bits: int

    @property
    def ber(self) -> float:
        return self.bit_errors / self.bits


def fused_ber_point(
    chain: PulseShapedChain,
    snr_db: float,
    n_symbols: int = 4096,
    channels: int = 64,
    seed: int = 0,
) -> BerPoint:
    """One Monte-Carlo BER point through the fused on-chip chain.

    ``snr_db`` is Es/N0 at the matched-filter decision point (unit-energy
    RRC). TPU only — the Pallas PRNG has no CPU lowering.
    """
    from .models.qam import QAM
    from .ops.pallas_chain import fused_pulse_chain, fused_pulse_chain_qam

    bps = chain.scheme.bits_per_symbol
    rng = np.random.default_rng(seed)
    syms = jnp.asarray(
        rng.integers(0, 1 << bps, (channels, n_symbols)), jnp.int32
    )
    kwargs = dict(rrc_taps=np.asarray(chain.rrc), sps=chain.sps,
                  span=chain.span, snr_db=snr_db, seed=seed + 1)
    if (isinstance(chain.scheme, QAM) and bps % 2 == 0
            and not chain.scheme.gray):  # algebraic path = natural binary
        dec = fused_pulse_chain_qam(
            syms, bps, chain.scheme.phase, chain.scheme.amplitude, **kwargs
        )
    else:
        dec = fused_pulse_chain(syms, chain.lut, **kwargs)
    tx_bits = unpack_symbols(syms, bps)
    rx_bits = unpack_symbols(dec, bps)
    errors = int(jnp.sum(tx_bits != rx_bits))
    return BerPoint(snr_db, errors, tx_bits.size)


def ber_waterfall(
    chain: PulseShapedChain,
    snrs_db,
    n_symbols: int = 4096,
    channels: int = 64,
    seed: int = 0,
) -> list[BerPoint]:
    """BER across an Es/N0 sweep, one fused on-chip run per point."""
    return [
        fused_ber_point(chain, s, n_symbols, channels, seed + 17 * i)
        for i, s in enumerate(snrs_db)
    ]


def ofdm_ber_point(
    scheme,
    es_n0_db: float,
    n_symbols: int = 40,
    channels: int = 32,
    seed: int = 0,
) -> BerPoint:
    """One Monte-Carlo BER point through the OFDM payload path.

    With the unitary reduced-DFT grid, per-bin Es/N0 equals the
    time-domain per-sample ratio, so OFDM over AWGN must reproduce the
    single-carrier constellation theory exactly (``qpsk_ber_theory`` /
    ``mqam_ber_theory`` with the natural-binary flip factor). The modem
    is built pilotless with an ideal (known) channel so the point
    measures the detector, not the estimators. Runs on CPU or TPU
    (jax.random noise, not the Pallas PRNG).
    """
    import jax

    from .ofdm import OfdmModem, _default_grid

    data, pilots = _default_grid(64)
    modem = OfdmModem(scheme, data_bins=data + pilots, pilot_bins=())
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(
        rng.integers(0, 2, (channels, modem.bits_per_frame(n_symbols))),
        jnp.int32)
    i, q = modem.tx_payload(bits)
    es = float(np.mean(np.sum(modem.lut ** 2, axis=-1)))
    sigma = math.sqrt(es / (10.0 ** (es_n0_db / 10.0)) / 2.0)
    key = jax.random.key(seed + 1)
    k1, k2 = jax.random.split(key)
    ni = i + sigma * jax.random.normal(k1, i.shape, i.dtype)
    nq = q + sigma * jax.random.normal(k2, q.shape, q.dtype)
    out = modem.rx_payload(ni, nq, n_symbols)
    errors = int(jnp.sum(out != bits))
    return BerPoint(es_n0_db, errors, bits.size)

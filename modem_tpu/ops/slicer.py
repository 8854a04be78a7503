"""Hard-decision symbol slicers — the bits-recovery stage the reference lacks.

The reference demodulator stops at soft I/Q text output
(`/root/reference/src/bin/demodulate.rs:41-43`); closing the loop bits->bits
is a required new capability (SURVEY.md "What the reference is NOT",
BASELINE.md). Decisions are batched tensor ops:

* constellation schemes — minimum-distance via one small matmul against the
  scheme's constellation LUT (MXU-friendly: argmax of 2*<y, c> - |c|^2);
* differential PSK — phase-difference quantization between consecutive
  decisions;
* FSK family — FM discriminator (phase increments -> per-symbol frequency
  average -> nearest coefficient).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def lut_map(symbols: jnp.ndarray, lut) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Constellation mapping (the inverse of :func:`lut_slice`):
    ``[..., K]`` int32 symbols -> per-symbol ``(i, q)``.

    Computed as a one-hot ``[..., K, M] @ [M, 2]`` matmul instead of a
    table gather — measured 4x faster on this TPU (gathers serialize on
    the VPU; the iota-compare one-hot fuses straight into an MXU matmul,
    and 2M MACs/symbol is nothing at M <= 256). Bit-identical to the
    gather: exactly one row contributes, and ``0 + v == v`` in f32.
    """
    lut = jnp.asarray(np.asarray(lut, np.float32))
    oh = (symbols[..., None]
          == jnp.arange(lut.shape[0], dtype=symbols.dtype))
    iq = jnp.dot(oh.astype(jnp.float32), lut,
                 preferred_element_type=jnp.float32)
    return iq[..., 0], iq[..., 1]


def lut_slice(i: jnp.ndarray, q: jnp.ndarray, lut: np.ndarray) -> jnp.ndarray:
    """Nearest constellation point: ``[..., K]`` I/Q -> ``[..., K]`` int32 symbols.

    ``lut`` is a static ``[M, 2]`` (i, q) table (e.g. ``scheme.lut``).
    argmin |y - c|^2 == argmax (2*<y, c> - |c|^2): one [K, M] matmul.
    """
    lut = np.asarray(lut, np.float32)
    y = jnp.stack([i, q], axis=-1)  # [..., K, 2]
    score = 2.0 * (y @ jnp.asarray(lut.T)) - jnp.asarray(
        np.sum(lut * lut, axis=-1)
    )
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def diff_phase(
    i: jnp.ndarray,
    q: jnp.ndarray,
    prev: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Phase change between consecutive symbol decision points,
    ``angle(y_k * conj(y_{k-1}))`` on real I/Q planes — the differential-PSK
    decision statistic, shared by the hard slicer and the DMPSK LLRs.
    ``prev``: previous block's last (i, q) pair ``[..., 2]`` ((1, 0) if
    None)."""
    if prev is None:
        pi_, pq_ = jnp.ones_like(i[..., :1]), jnp.zeros_like(q[..., :1])
    else:
        pi_, pq_ = prev[..., 0][..., None], prev[..., 1][..., None]
    ip = jnp.concatenate([pi_, i[..., :-1]], axis=-1)
    qp = jnp.concatenate([pq_, q[..., :-1]], axis=-1)
    # angle(y * conj(yprev)) in real planes (no complex dtypes on TPU).
    return jnp.arctan2(q * ip - i * qp, i * ip + q * qp)


def diff_phase_slice(
    i: jnp.ndarray,
    q: jnp.ndarray,
    shift: float,
    bits_per_symbol: int,
    prev: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Differential PSK decisions: quantize the phase *change* between
    consecutive symbol samples to the nearest multiple of ``shift``
    (inverse of `dmpsk.rs:29-33`). ``prev``: previous block's last (i, q)
    pair ``[..., 2]``; defaults to the DMPSK initial phase being unknown —
    callers should seed it with cos/sin of the TX's initial phase."""
    m = 1 << bits_per_symbol
    dphi = diff_phase(i, q, prev)
    sym = jnp.round(dphi / shift).astype(jnp.int32) % m
    return sym


def fm_discriminate(
    i: jnp.ndarray, q: jnp.ndarray, prev: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Instantaneous frequency (radians/sample) of a complex baseband signal:
    angle(y[n] * conj(y[n-1])) computed on real I/Q planes (complex dtypes are
    kept off the TPU path). ``prev``: previous block's last sample [..., 2].
    """
    if prev is None:
        pi_, pq_ = i[..., :1], q[..., :1]
    else:
        pi_, pq_ = prev[..., 0][..., None], prev[..., 1][..., None]
    ip = jnp.concatenate([pi_, i[..., :-1]], axis=-1)
    qp = jnp.concatenate([pq_, q[..., :-1]], axis=-1)
    return jnp.arctan2(q * ip - i * qp, i * ip + q * qp)


def fsk_symbol_means(
    inst_freq: jnp.ndarray, sps: int, guard: int = 1
) -> jnp.ndarray:
    """Per-symbol mean instantaneous frequency over the interior samples
    (``guard`` boundary samples skipped): the FSK decision statistic,
    shared by the hard slicer and the discriminator-domain LLRs."""
    k = inst_freq.shape[-1] // sps
    per_sym = inst_freq[..., : k * sps].reshape(inst_freq.shape[:-1] + (k, sps))
    return jnp.mean(per_sym[..., guard:], axis=-1)  # [..., K]


def fsk_slice(
    inst_freq: jnp.ndarray,
    coefs: np.ndarray,
    dev_rad_per_sample: float,
    sps: int,
    guard: int = 1,
) -> jnp.ndarray:
    """Per-symbol frequency decisions: average the instantaneous frequency
    over the interior of each symbol (skipping ``guard`` transition samples),
    then pick the nearest ``coef * dev`` (the inverse of the FSK phasors'
    ``coef(sym) * w_dev`` trajectories, `mfsk.rs:60-66`, `cpfsk.rs:26-31`).

    ``inst_freq``: ``[..., K*sps]`` radians/sample; ``coefs``: static [M]
    coefficient table. Returns ``[..., K]`` int32 symbols.

    Discriminator Nyquist constraint: every |coef * dev| must stay below pi
    rad/sample, or the phase-increment angle wraps and symbols alias.
    """
    mean_f = fsk_symbol_means(inst_freq, sps, guard)
    return fsk_slice_means(mean_f, coefs, dev_rad_per_sample)


def fsk_slice_means(
    mean_f: jnp.ndarray, coefs: np.ndarray, dev_rad_per_sample: float
) -> jnp.ndarray:
    """Nearest-frequency decisions from the per-symbol mean statistic
    (``[..., K]`` rad/sample) — the symbol-rate back half of
    :func:`fsk_slice`, shared with the fused discriminator kernel."""
    targets = jnp.asarray(
        np.asarray(coefs, np.float32) * np.float32(dev_rad_per_sample)
    )
    err = jnp.abs(mean_f[..., None] - targets)
    return jnp.argmin(err, axis=-1).astype(jnp.int32)

"""Channel impairment models and their correction primitives.

New capability (SURVEY.md "What the reference is NOT": the reference has no
channel model at all — a pipe either flows or EOFs). A production receiver
must acquire under carrier frequency offset (CFO), static phase/gain error,
fractional symbol-timing offset, and mild multipath; this module provides
block transforms to *impose* those impairments (test apparatus and channel
emulation) and the traced-parameter primitives the feedforward synchronizers
in :mod:`modem_tpu.sync` use to *correct* them.

All functions follow the framework conventions: real I/Q planes (the axon
backend has no complex dtype), shape-static, jit/vmap-friendly, channel-major
``[..., N]`` blocks.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import TWO_PI
from .fir import fir_filter


# ---------------------------------------------------------------------------
# Rotation impairments: CFO, static phase, gain
# ---------------------------------------------------------------------------

def apply_cfo(
    i: jnp.ndarray,
    q: jnp.ndarray,
    cfo_hz,
    sample_rate: int,
    phase0=0.0,
    n0=0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate baseband I/Q by ``exp(j*(2*pi*cfo*(n0+n)/sr + phase0))``.

    ``cfo_hz``/``phase0`` may be traced scalars (or ``[..., 1]`` arrays for
    per-channel offsets); pass a negative ``cfo_hz`` to correct an estimated
    offset. ``n0`` is the block's starting sample index for streaming
    continuity.
    """
    n = jnp.arange(i.shape[-1], dtype=jnp.float32) + jnp.float32(n0)
    theta = (TWO_PI / sample_rate) * jnp.asarray(cfo_hz, jnp.float32) * n
    theta = theta + jnp.asarray(phase0, jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return i * c - q * s, i * s + q * c


def apply_gain_phase(
    i: jnp.ndarray, q: jnp.ndarray, gain=1.0, phase=0.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multiply by ``gain * exp(j*phase)`` (both may be traced scalars)."""
    g = jnp.asarray(gain, jnp.float32)
    c = g * jnp.cos(jnp.asarray(phase, jnp.float32))
    s = g * jnp.sin(jnp.asarray(phase, jnp.float32))
    return i * c - q * s, i * s + q * c


# ---------------------------------------------------------------------------
# Multipath: static complex FIR channel
# ---------------------------------------------------------------------------

def multipath_fir(
    i: jnp.ndarray,
    q: jnp.ndarray,
    taps_i: np.ndarray,
    taps_q: np.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convolve I/Q with a static complex channel ``h = taps_i + j*taps_q``.

    ``(i + j q) * (hi + j hq)``: four real FIR passes through the shared
    engine (:func:`modem_tpu.ops.fir.fir_filter`), causal, zero history.
    """
    ii, _ = fir_filter(i, taps_i)
    qq, _ = fir_filter(q, taps_q)
    iq, _ = fir_filter(i, taps_q)
    qi, _ = fir_filter(q, taps_i)
    return ii - qq, iq + qi


# ---------------------------------------------------------------------------
# Fractional delay: static windowed-sinc (imposing) and Farrow (correcting)
# ---------------------------------------------------------------------------

def sinc_delay_taps(mu: float, num_taps: int = 63,
                    beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed sinc fractional-delay filter (host-side, static
    ``mu``): total delay ``num_taps//2 + mu`` samples (``num_taps`` odd).

    This is the high-fidelity *imposing* path for tests and channel
    emulation; the receiver-side correction uses :func:`farrow_delay`, whose
    delay parameter can be a traced estimate.
    """
    if num_taps % 2 == 0:
        raise ValueError("sinc_delay_taps wants an odd num_taps")
    c = num_taps // 2
    n = np.arange(num_taps, dtype=np.float64)
    h = np.sinc(n - c - mu) * np.kaiser(num_taps, beta)
    return (h / h.sum()).astype(np.float32)


def apply_static_delay(
    i: jnp.ndarray, q: jnp.ndarray, mu: float, num_taps: int = 63
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Delay I/Q by ``num_taps//2 + mu`` samples (static ``mu``)."""
    h = sinc_delay_taps(mu, num_taps)
    di, _ = fir_filter(i, h)
    dq, _ = fir_filter(q, h)
    return di, dq


def farrow_delay(x: jnp.ndarray, mu) -> jnp.ndarray:
    """Cubic-Lagrange (Farrow) fractional delay by ``1 + mu`` samples.

    ``mu`` in [0, 1) may be a traced scalar (or ``[..., 1]`` per-channel
    array) — the tap weights are cubic polynomials in ``mu`` evaluated on
    device, which is what makes feedforward timing correction jittable
    (:func:`modem_tpu.sync.correct_timing`). Output ``y[n] ~= x(n - 1 - mu)``
    with zero history (first 3 outputs are edge-affected).

    The Farrow structure is the TPU-native replacement for a per-sample
    interpolating timing loop: one 4-tap FIR with data-independent control
    flow instead of a feedback recursion.
    """
    f = 1.0 - jnp.asarray(mu, jnp.float32)  # sample point in (0, 1]
    # Lagrange basis on nodes {-1, 0, 1, 2} relative to x[n-2], evaluated
    # at f: y[n] = sum_i L_i(f) * x[n-2+i].
    l_m1 = -f * (f - 1.0) * (f - 2.0) / 6.0
    l_0 = (f * f - 1.0) * (f - 2.0) / 2.0
    l_1 = -f * (f + 1.0) * (f - 2.0) / 2.0
    l_2 = f * (f * f - 1.0) / 6.0
    pad = jnp.zeros(x.shape[:-1] + (3,), x.dtype)
    xp = jnp.concatenate([pad, x], axis=-1)
    n = x.shape[-1]
    return (
        l_m1 * xp[..., 0:n]          # x[n-3]
        + l_0 * xp[..., 1:n + 1]     # x[n-2]
        + l_1 * xp[..., 2:n + 2]     # x[n-1]
        + l_2 * xp[..., 3:n + 3]     # x[n]
    )


# ---------------------------------------------------------------------------
# Doppler fading: each path rotates at its own Doppler shift
# ---------------------------------------------------------------------------

def doppler_multipath(
    i: jnp.ndarray,
    q: jnp.ndarray,
    taps_i: np.ndarray,
    taps_q: np.ndarray,
    doppler_hz: np.ndarray,
    sample_rate: int,
    n0: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Time-varying multipath: ``y[n] = sum_l h_l e^{j 2 pi f_l n / sr}
    x[n - l]`` — each delay tap carries its own Doppler shift ``f_l``
    (a discrete Jakes-style fading model: two paths with opposite
    Doppler beat at the difference frequency).

    TPU shaping: ``L`` static shifted copies of the input, each rotated
    by its own phasor ramp — elementwise, no scan, no gathers. ``n0`` is
    the block's first absolute sample index for streaming continuity.
    Degenerates to :func:`multipath_fir` at ``doppler_hz = 0``.
    """
    hi = np.asarray(taps_i, np.float32)
    hq = np.asarray(taps_q, np.float32)
    fd = np.asarray(doppler_hz, np.float64)
    if not (hi.shape == hq.shape == fd.shape) or hi.ndim != 1:
        raise ValueError("taps_i, taps_q, doppler_hz must be 1-D and "
                         "equal length")
    n = i.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32) + jnp.float32(n0)
    yi = jnp.zeros_like(i)
    yq = jnp.zeros_like(q)
    for l in range(hi.shape[0]):
        if hi[l] == 0.0 and hq[l] == 0.0:
            continue
        xi = i if l == 0 else jnp.concatenate(
            [jnp.zeros(i.shape[:-1] + (l,), i.dtype), i[..., :-l]], -1)
        xq = q if l == 0 else jnp.concatenate(
            [jnp.zeros(q.shape[:-1] + (l,), q.dtype), q[..., :-l]], -1)
        th = t * jnp.float32(TWO_PI * fd[l] / sample_rate)
        c, s = jnp.cos(th), jnp.sin(th)
        gi = hi[l] * c - hq[l] * s   # h_l * e^{j th}
        gq = hi[l] * s + hq[l] * c
        yi = yi + xi * gi - xq * gq
        yq = yq + xi * gq + xq * gi
    return yi, yq

"""Rational sample-rate conversion: polyphase up/down resampler.

New capability (SURVEY.md "What the reference is NOT": no resampler exists in
the reference). Implements ``y = downsample_M(lowpass(upsample_L(x)))`` without
ever materializing the upsampled stream, via the polyphase identity

    y[m] = sum_k h[k*L + p_m] * x[b_m - k],   p_m = (m*M) mod L,
                                              b_m = (m*M) div L.

Outputs with the same phase ``r = m mod L`` form a decimated FIR on ``x``
(stride M, offset ``b_r``), so each of the L phase branches is one
:func:`modem_tpu.ops.polyphase.polyphase_decim` call — L symbol-rate passes,
``len(h)/L`` MACs per branch output, all static shapes.

Streaming: like every op in this framework (`fir_filter`, `polyphase_interp`,
the scheme programs), the resampler carries explicit state — the previous
block's last ``taps_per_phase - 1`` input samples — so chunked streams are
bit-identical to one-shot processing. Block lengths must satisfy
``N * up % down == 0`` (an integer number of outputs per block), which keeps
the polyphase pattern aligned at block seams with no fractional-phase state.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .polyphase import polyphase_decim


def design_lowpass(num_taps: int, cutoff: float, beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass; ``cutoff`` in (0, 1] of Nyquist."""
    if not 0.0 < cutoff <= 1.0:
        raise ValueError("cutoff must be in (0, 1]")
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(cutoff * n) * cutoff
    h *= np.kaiser(num_taps, beta)
    return (h / h.sum()).astype(np.float32)


def resample_taps(up: int, down: int, taps_per_phase: int = 16,
                  beta: float = 8.0) -> np.ndarray:
    """Anti-aliasing/interpolation prototype for an up/down converter: cutoff
    at the tighter of the two Nyquists, gain ``up`` (to preserve amplitude
    through zero-stuffing)."""
    num = up * taps_per_phase
    h = design_lowpass(num, 1.0 / max(up, down), beta)
    return (h * up).astype(np.float32)


def resample_state_len(taps, up: int, down: int) -> int:
    """Length of the carried input history: ``taps_per_phase - 1`` samples
    (the longest lookback of any polyphase branch)."""
    g = math.gcd(up, down)
    up = up // g
    padded = len(np.asarray(taps)) + ((-len(np.asarray(taps))) % up)
    return padded // up - 1


def rational_resample(
    x: jnp.ndarray,
    up: int,
    down: int,
    taps: np.ndarray | None = None,
    taps_per_phase: int = 16,
    state: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Resample ``x [..., N]`` by ``up/down``. Returns ``(y [..., N*up//down],
    new_state)`` (requires ``N*up % down == 0``); causal (no group-delay
    compensation). ``state`` is the previous block's last
    ``taps_per_phase - 1`` input samples (zero history if None) — chunked
    streams are bit-identical to one-shot processing.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if taps is None:
        taps = resample_taps(up, down, taps_per_phase)
    taps = np.asarray(taps, np.float32)
    n = x.shape[-1]
    if (n * up) % down:
        raise ValueError(f"N*up ({n}*{up}) must divide by down ({down})")
    n_out = n * up // down
    pad = (-len(taps)) % up
    h = np.concatenate([taps, np.zeros(pad, np.float32)])
    kp = len(h) // up  # taps per polyphase branch
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (kp - 1,), x.dtype)
    if state.shape[-1] != kp - 1:
        raise ValueError(
            f"resampler state must hold {kp - 1} samples, got {state.shape[-1]}"
        )
    xh = jnp.concatenate([state, x], axis=-1) if kp > 1 else x
    new_state = xh[..., xh.shape[-1] - (kp - 1):] if kp > 1 else state
    if up == 1 and down == 1:
        from .fir import fir_filter

        y, _ = fir_filter(x, taps, state=state)
        return y, new_state

    # Phase branch r decides outputs m = r + t*up:
    #   y_r[t] = sum_k h[k*up + p_r] * x[b_r + t*down - k]
    branches = []
    lengths = []
    for r in range(up):
        p_r = (r * down) % up
        b_r = (r * down) // up
        h_r = h[p_r::up]  # [kp]
        t_r = max(-(-(n_out - r) // up), 0)  # outputs in this branch
        lengths.append(t_r)
        if t_r == 0:
            branches.append(jnp.zeros(x.shape[:-1] + (0,), x.dtype))
            continue
        # The last window ends at b_r + (t_r-1)*down <= N-1 whenever
        # down | N*up (checked above), so every branch fits in the block.
        assert b_r + (t_r - 1) * down < n, "resampler window overran the block"
        # h is zero-padded to a multiple of `up`, so every phase row is
        # non-empty (kp entries); lookback beyond the block start comes from
        # the carried history.
        branches.append(polyphase_decim(x, h_r, down, b_r, t_r, state=state))
    # Interleave branches: output m = r + t*up.
    t_max = max(lengths)
    cols = []
    for r, (br, t_r) in enumerate(zip(branches, lengths)):
        if t_r < t_max:
            br = jnp.concatenate(
                [br, jnp.zeros(br.shape[:-1] + (t_max - t_r,), br.dtype)],
                axis=-1,
            )
        cols.append(br)
    y = jnp.stack(cols, axis=-1).reshape(x.shape[:-1] + (t_max * up,))
    return y[..., :n_out], new_state

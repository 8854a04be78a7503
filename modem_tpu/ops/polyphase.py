"""Polyphase interpolation / decimation: the FLOP-optimal pulse-shaping path.

The naive flagship chain filters a zero-stuffed full-rate stream on TX (7/8 of
the MACs multiply zeros at sps=8) and computes the matched filter at every
sample on RX only to keep one in ``sps`` (`chain.py` decimation). The
polyphase decomposition removes both wastes — the classic multirate identity,
re-derived here for block tensors:

* **interp**: ``y[m*sps + p] = sum_k taps[k*sps + p] * x[m - k]`` — ``sps``
  phase sub-filters of ``ceil(L/sps)`` taps each, evaluated at *symbol* rate
  and interleaved; identical (up to f32 reassociation) to
  ``fir_filter(upsample_zero_stuff(x, sps), taps)``.
* **decim**: ``z[m] = y[d + m*sps]`` with ``y`` the causal FIR of ``x`` —
  computed directly as ``L`` strided symbol-rate slices, never materializing
  the full-rate filtered stream.

Total work in both directions: ``L`` MACs per *symbol* instead of ``L`` per
*sample* — an ``sps``-fold FLOP reduction, and all slices are static so XLA
fuses each direction into one VPU pass.

The reference has no pulse shaping at all (SURVEY.md "What the reference is
NOT"); this is a new capability designed TPU-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fir import _as_f32


def _phase_bank(taps: np.ndarray, sps: int) -> np.ndarray:
    """[sps, ceil(L/sps)] matrix with T[p, k] = taps[k*sps + p] (zero-padded)."""
    length = taps.shape[0]
    k_per_phase = -(-length // sps)
    bank = np.zeros((sps, k_per_phase), np.float32)
    for p in range(sps):
        row = taps[p::sps]
        bank[p, : row.shape[0]] = row
    return bank


def polyphase_interp(
    x: jnp.ndarray, taps, sps: int, state: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pulse-shape symbol-rate values to sample rate without zero-stuffing.

    ``x``: ``[..., M]`` symbol-rate values. Returns ``(y [..., M*sps],
    new_state)``; ``state`` is the previous block's last ``ceil(L/sps)-1``
    symbols (zeros if None). Equivalent to the zero-stuff + full-rate FIR
    path up to f32 summation order.
    """
    taps = _as_f32(taps)
    bank = _phase_bank(taps, sps)
    kp = bank.shape[1]
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (kp - 1,), x.dtype)
    xp = jnp.concatenate([state, x], axis=-1) if kp > 1 else x
    m = x.shape[-1]
    phases = []
    for p in range(sps):
        acc = jnp.zeros(x.shape[:-1] + (m,), x.dtype)
        for k in range(kp):
            if bank[p, k] == 0.0:
                continue
            acc = acc + bank[p, k] * jax.lax.dynamic_slice_in_dim(
                xp, kp - 1 - k, m, axis=-1
            )
        phases.append(acc)
    y = jnp.stack(phases, axis=-1).reshape(x.shape[:-1] + (m * sps,))
    new_state = xp[..., xp.shape[-1] - (kp - 1):] if kp > 1 else state
    return y, new_state


def polyphase_decim(
    x: jnp.ndarray,
    taps,
    sps: int,
    delay: int,
    n_out: int,
    state: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Matched-filter + symbol-instant decimation in one symbol-rate pass.

    ``z[m] = sum_j taps[j] * xh[delay + m*sps - j]`` for ``m in [0, n_out)``,
    where ``xh`` is ``x`` preceded by ``state`` (the previous block's last
    ``L-1`` samples; zeros if None). Identical to
    ``fir_filter(x, taps)[0][..., delay::sps][..., :n_out]``.

    Requires ``delay - j + (n_out-1)*sps < x_len`` for all tap indices ``j``,
    i.e. ``x`` must cover the last decision instant (the chain's flush
    guarantees this).
    """
    taps = _as_f32(taps)
    length = taps.shape[0]
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (length - 1,), x.dtype)
    xh = jnp.concatenate([state, x], axis=-1) if length > 1 else x
    span_needed = delay + (n_out - 1) * sps + 1
    if span_needed > x.shape[-1]:
        raise ValueError(
            f"decimation needs {span_needed} input samples, got {x.shape[-1]}"
        )
    z = jnp.zeros(x.shape[:-1] + (n_out,), x.dtype)
    for j in range(length):
        start = length - 1 + delay - j
        sl = jax.lax.slice_in_dim(
            xh, start, start + (n_out - 1) * sps + 1, stride=sps, axis=-1
        )
        z = z + taps[j] * sl
    return z

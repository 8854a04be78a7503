"""Puncturing: higher code rates from the rate-1/2 mother code.

New capability (reference has no FEC at all). A puncture pattern ``P`` is a
static ``[n, p]`` 0/1 mask over the mother code's ``n`` output streams and
a period of ``p`` trellis steps; transmitted bits are the 1-positions, in
time-major order (the same ``c_0[k], c_1[k], c_0[k+1], ...`` interleave as
:meth:`modem_tpu.fec.ConvCode.encode`). Deleted positions are restored at
the receiver as zero-LLR *erasures*, which the Viterbi ACS already handles
(a zero branch cost contributes to neither hypothesis).

TPU-first shape: both directions are static index maps — ``puncture`` is a
gather with host-precomputed indices, ``depuncture`` a scatter into a zero
block — so they trace to pure data movement with no control flow.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class Puncturer:
    """Static puncture/depuncture maps for a rate-``k/p``→``k/m`` pattern.

    ``pattern``: ``[n, p]`` array of 0/1; column ``j`` gives which of the
    ``n`` code bits of trellis step ``t ≡ j (mod p)`` are transmitted.
    Standard rate-2/3 and rate-3/4 patterns for the K=7 mother code are in
    :func:`rate23_pattern` / :func:`rate34_pattern`.
    """

    def __init__(self, pattern: np.ndarray):
        pat = np.asarray(pattern, np.int64)
        if pat.ndim != 2 or not np.isin(pat, (0, 1)).all():
            raise ValueError("pattern must be a 2D 0/1 array [n, period]")
        if pat.sum() == 0:
            raise ValueError("pattern deletes everything")
        self.n, self.period = map(int, pat.shape)
        self.pattern = pat
        # time-major flat order within one period: [p, n] -> kept positions
        self._keep = np.flatnonzero(pat.T.reshape(-1))
        self.kept_per_period = int(self._keep.size)

    def _flat_indices(self, steps: int) -> np.ndarray:
        if steps % self.period:
            raise ValueError(
                f"trellis length {steps} must divide by period {self.period}")
        reps = steps // self.period
        base = np.arange(reps) * (self.n * self.period)
        return (base[:, None] + self._keep[None, :]).reshape(-1)

    def out_bits(self, steps: int) -> int:
        """Punctured length for ``steps`` trellis steps."""
        return (steps // self.period) * self.kept_per_period

    def puncture(self, code_bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., n*T]`` mother-code bits -> ``[..., kept]`` wire bits."""
        steps = code_bits.shape[-1] // self.n
        idx = jnp.asarray(self._flat_indices(steps))
        return code_bits[..., idx]

    def depuncture(self, llrs: jnp.ndarray, steps: int) -> jnp.ndarray:
        """``[..., kept]`` wire LLRs -> ``[..., n*T]`` with zero erasures."""
        idx = self._flat_indices(steps)
        if llrs.shape[-1] != idx.size:
            raise ValueError(
                f"{llrs.shape[-1]} LLRs for {idx.size} kept positions")
        out = jnp.zeros(llrs.shape[:-1] + (self.n * steps,), llrs.dtype)
        return out.at[..., jnp.asarray(idx)].set(llrs)

    def rate(self, mother_rate: float) -> float:
        return mother_rate * (self.n * self.period) / self.kept_per_period


def rate23_pattern() -> np.ndarray:
    """Rate 2/3 from rate 1/2 (the standard DVB/802.11 pattern)."""
    return np.array([[1, 1], [1, 0]])


def rate34_pattern() -> np.ndarray:
    """Rate 3/4 from rate 1/2 (the standard DVB/802.11 pattern)."""
    return np.array([[1, 1, 0], [1, 0, 1]])

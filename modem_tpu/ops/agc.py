"""Automatic gain control: log-domain feedback AGC at sub-block rate.

New capability (the reference assumes unit-amplitude input everywhere; its
only gain handling is the fixed amplitude constant baked into each scheme,
`/root/reference/src/bin/modulate.rs:74-95`). A deployed receiver sits
behind an analog front end whose level drifts; the AGC normalizes it before
acquisition/slicing.

TPU shape: the classic per-sample feedback loop is hostile (sequential at
sample rate); level drift is slow, so the loop runs at **sub-block rate** —
a ``lax.scan`` whose step applies the carried gain to ``sub_block`` samples
at once, measures the output RMS, and nudges the log-gain toward the
target (log domain = the standard dB-linear AGC; multiplicative
convergence independent of signal scale). State is one scalar log-gain per
channel — an explicit pytree like every other streaming op here; chunked
streaming is bit-identical to one-shot when chunks are sub-block multiples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_rms(i: jnp.ndarray, q: jnp.ndarray, target_rms: float = 1.0,
                  eps: float = 1e-12):
    """Feedforward whole-block normalization to ``target_rms`` (complex
    magnitude RMS over the last axis). The one-shot form for burst work."""
    p = jnp.mean(i * i + q * q, axis=-1, keepdims=True)
    g = jnp.float32(target_rms) / jnp.sqrt(jnp.maximum(p, eps))
    return i * g, q * g


class Agc:
    """Feedback AGC with log-domain loop gain.

    ``loop_gain`` is the fraction of the measured log-level error folded in
    per sub-block (0 < g <= 1): convergence to 1% of a level step takes
    about ``ln(0.01)/ln(1-g)`` sub-blocks.
    """

    def __init__(self, target_rms: float = 1.0, loop_gain: float = 0.25,
                 sub_block: int = 64, eps: float = 1e-12):
        if not 0.0 < loop_gain <= 1.0:
            raise ValueError("loop_gain must be in (0, 1]")
        self.target = float(target_rms)
        self.loop_gain = float(loop_gain)
        self.sub_block = int(sub_block)
        self.eps = float(eps)

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> jnp.ndarray:
        """Initial log-gain (0 = unity)."""
        return jnp.zeros(batch_shape, jnp.float32)

    def process(self, i: jnp.ndarray, q: jnp.ndarray, state: jnp.ndarray):
        """``[..., n]`` I/Q (n a multiple of ``sub_block``) -> gained I/Q
        and the advanced log-gain state."""
        n = i.shape[-1]
        l = self.sub_block
        if n % l:
            raise ValueError(f"block length {n} must divide by {l}")
        bshape = i.shape[:-1] + (n // l, l)
        bi = jnp.moveaxis(i.reshape(bshape), -2, 0)  # [nb, ..., l]
        bq = jnp.moveaxis(q.reshape(bshape), -2, 0)
        log_target = jnp.float32(jnp.log(self.target))

        def step(lg, xs):
            xi, xq = xs
            g = jnp.exp(lg)[..., None]
            yi, yq = xi * g, xq * g
            p = jnp.mean(yi * yi + yq * yq, axis=-1)
            err = log_target - 0.5 * jnp.log(jnp.maximum(p, self.eps))
            return lg + self.loop_gain * err, (yi, yq)

        state_new, (yi, yq) = jax.lax.scan(step, state, (bi, bq))
        yi = jnp.moveaxis(yi, 0, -2).reshape(i.shape)
        yq = jnp.moveaxis(yq, 0, -2).reshape(q.shape)
        return (yi, yq), state_new

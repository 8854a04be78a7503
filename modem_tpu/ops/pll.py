"""First-order PLL carrier-phase acquisition.

The reference runs a 1st-order loop for a fixed 64-sample preamble and then
freezes the acquired offset (`/root/reference/src/modem/pll.rs:10-22`,
`demodulator.rs:5,32-36`): per sample,

    err    = arg(x * conj(e^{j(theta + phi)}))
    phi   += 0.447214 * err

A 64-step sequential recurrence is negligible work, so it compiles as a
``lax.scan`` — the one place the reference's sequential state is kept
sequential on purpose (SURVEY.md section 3.5: one-shot acquisition, not
tracking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Loop gain, `pll.rs:3`.
PLL_GAIN = 0.447214
#: Acquisition length, `demodulator.rs:5`.
LOCK_SAMPLES = 64


def pll_lock(
    xi: jnp.ndarray, xq: jnp.ndarray, theta: jnp.ndarray,
    gain: float = PLL_GAIN
) -> jnp.ndarray:
    """Run the PLL over analytic samples (``xi + j*xq``, split real planes —
    complex dtypes are avoided throughout: the TPU compute path works on I/Q
    plane pairs) against carrier phases ``theta`` ``[n]``; returns the final
    phase offset ``[...]``.

    err = arg(x * e^{-j(theta+phi)}) computed as atan2 of the rotated planes.
    """

    def step(phi, inp):
        si, sq, th = inp
        inner = th + phi
        c, s = jnp.cos(inner), jnp.sin(inner)
        err = jnp.arctan2(sq * c - si * s, si * c + sq * s)
        return phi + gain * err.astype(jnp.float32), None

    # scan over the sample axis; batch dims ride along in the carry.
    if theta.ndim != 1 or theta.shape[0] != xi.shape[-1]:
        raise ValueError("theta must be [n] matching x's last axis")
    phi0 = jnp.zeros(xi.shape[:-1], jnp.float32)
    phi, _ = jax.lax.scan(
        step, phi0,
        (jnp.moveaxis(xi, -1, 0), jnp.moveaxis(xq, -1, 0),
         theta.astype(jnp.float32)),
    )
    return phi

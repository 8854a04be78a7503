"""Numerically-controlled oscillator and I/Q mixing as block transforms.

The reference computes the carrier phase non-recursively per sample,
``theta(s) = mod_2pi(omega * s)`` (`/root/reference/src/modem/carrier.rs:17-19`,
`util.rs:3-6`), and upconverts one sample at a time
(`modulator.rs:37-48`: ``re = i*cos - q*sin``, ``im = i*sin + q*cos``).

Here the phase for a whole block is computed with **exact integer arithmetic**:
for an integer carrier ``hz`` and sample rate ``sr``,

    theta(s) = 2*pi * ((hz * (s mod sr)) mod sr) / sr

which is bit-stable for unbounded stream lengths (the reference's f32
``omega * s`` loses precision for s >~ 1e6; we deliberately do better while
agreeing with it to f32 tolerance on short blocks). ``hz*(s mod sr)`` fits int32
for sr*hz < 2^31, i.e. every CLI-reachable configuration.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import TWO_PI


def carrier_phase(
    hz: int, sr: int, n: int, s0_mod: jnp.ndarray | int = 0
) -> jnp.ndarray:
    """Phase ``theta(s0+k) for k in [0, n)`` as f32 radians in [0, 2*pi).

    ``s0_mod`` is the block's starting sample index modulo ``sr`` (carried as a
    traced int32 scalar so streaming blocks don't retrigger compilation).
    """
    s = (jnp.asarray(s0_mod, jnp.int32) + jnp.arange(n, dtype=jnp.int32)) % sr
    u = (s * jnp.int32(hz)) % sr
    return u.astype(jnp.float32) * jnp.float32(TWO_PI / sr)


def mix_up(i: jnp.ndarray, q: jnp.ndarray, theta: jnp.ndarray):
    """Upconvert baseband I/Q to passband, mirroring `modulator.rs:37-48`.

    Returns ``(re, im)``; the reference's real-output mode keeps only ``re``
    (`modulate.rs:128-133`).
    """
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    return i * c - q * s, i * s + q * c


def mix_down(x: jnp.ndarray, theta: jnp.ndarray):
    """Coherent product detector pre-filter terms, mirroring `demodulator.rs:50-55`.

    Given real passband ``x`` and total phase ``theta`` (carrier + PLL offset),
    returns the two mixer products that feed the I/Q lowpass filters:
    ``(x*cos(theta), -x*sin(theta))``.
    """
    return x * jnp.cos(theta), -x * jnp.sin(theta)

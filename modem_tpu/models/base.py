"""Scheme -> block-waveform compilation: the core TPU-first design.

The reference evaluates one sample at a time through a stateful trait object
(`/root/reference/src/modem/digital/phasor.rs:1-12`: per-symbol ``update()`` +
per-sample ``i()/q()``). That shape is hostile to XLA, so this framework inverts
it: **every modulation scheme compiles its symbol block into one of two small
parameter programs**, and a single fused elementwise kernel synthesizes the
baseband for all 13 schemes:

* :class:`IQProgram` — memoryless constellation schemes (ASK/PSK/QAM/APSK and
  differential PSK after a prefix-sum): per-*slot* constant I/Q values, expanded
  to the sample rate by a static ``repeat``.
* :class:`PhaseProgram` — frequency/phase-trajectory schemes (BFSK/MFSK/CPFSK/
  MSK): per-slot integer frequency numerators and phase offsets in **exact
  integer units of a static denominator** ``den`` (usually the sample rate):

      theta(s) = 2*pi * ((fnum[slot(s)] * (t(s) mod den) + pnum[slot(s)]) mod den) / den
      i(s) = gi[slot(s)] * cos(theta)        q(s) = gq[slot(s)] * cos(theta + qshift)

  Integer phase arithmetic makes long streams bit-stable (no f32 omega*s drift)
  while matching the reference's f32 values on short blocks.

A *slot* is a symbol (``slots_per_symbol=1``) or half-symbol for the staggered
MSK/OQPSK sources (``slots_per_symbol=2``), which turns the reference's
`EvenOddOffset` pull-protocol (`data.rs:81-123`) into a static shift of the Q
bit-plane.

``time_offset=1`` reproduces the reference driver's indexing quirk: the carrier
phase is evaluated at sample ``s`` but the phasor at ``s+1``
(`carrier.rs:21-26` post-increments before `modulator.rs:85-100` calls the
phasor with ``carrier.sample``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..config import TWO_PI, Rates


@dataclasses.dataclass
class IQProgram:
    """Per-slot constant baseband I/Q, ``[..., n_slots]`` each."""

    i: jnp.ndarray
    q: jnp.ndarray
    slots_per_symbol: int = 1


@dataclasses.dataclass
class PhaseProgram:
    """Per-slot integer phase trajectory (see module docstring)."""

    gi: jnp.ndarray  # [..., n_slots] f32 gain on the cos (I) arm
    gq: jnp.ndarray  # [..., n_slots] f32 gain on the Q arm
    fnum: jnp.ndarray  # [..., n_slots] int32 frequency numerator
    pnum: jnp.ndarray  # [..., n_slots] int32 phase offset numerator, in [0, den)
    den: int  # static denominator (phase units per turn)
    qshift: float = -0.25 * TWO_PI  # Q arm shift: cos(theta - pi/2) = sin(theta)
    slots_per_symbol: int = 1


class Scheme:
    """Base for all modulation schemes.

    Subclasses set ``bits_per_symbol`` and implement :meth:`program`. Scheme
    objects are static (closed over at trace time); all runtime state lives in
    the pytree returned by :meth:`init_state`.
    """

    bits_per_symbol: int
    #: static phase denominator used by PhaseProgram schemes (0 = IQ scheme)
    den: int = 0

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> Any:
        """Streaming state carried across blocks (empty tuple if stateless)."""
        return ()

    def program(
        self,
        symbols: jnp.ndarray,
        state: Any,
        rates: Rates,
        t0_mod: jnp.ndarray | int,
    ) -> tuple[IQProgram | PhaseProgram, Any]:
        """Compile a ``[..., K]`` int32 symbol block into a baseband program.

        ``t0_mod`` is the absolute sample index of the block's first sample,
        modulo ``self.den`` (ignored by IQ schemes).
        """
        raise NotImplementedError


def _expand(a: jnp.ndarray, slot_len: int) -> jnp.ndarray:
    """Repeat each slot value ``slot_len`` times along the last axis.

    Static-shape equivalent of holding a symbol's value for
    ``samples_per_symbol`` samples (`rates.rs:16`, `data.rs:14-33`).
    """
    if slot_len == 1:
        return a
    return jnp.repeat(a, slot_len, axis=-1, total_repeat_length=a.shape[-1] * slot_len)


def synthesize(
    prog: IQProgram | PhaseProgram,
    sps: int,
    t0_mod: jnp.ndarray | int = 0,
    time_offset: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand a baseband program to per-sample I/Q ``[..., n_slots*slot_len]``.

    One fused elementwise pass; for IQ programs no trig is evaluated at all.
    """
    slot_len = sps // prog.slots_per_symbol
    if slot_len * prog.slots_per_symbol != sps:
        raise ValueError(f"sps={sps} not divisible by {prog.slots_per_symbol} slots")

    if isinstance(prog, IQProgram):
        return _expand(prog.i, slot_len), _expand(prog.q, slot_len)

    den = prog.den
    n = prog.fnum.shape[-1] * slot_len
    # t(s) = s + time_offset, reduced mod den. fnum*t + pnum stays within int32
    # as long as max|fnum| * den < 2^31 (asserted by scheme constructors).
    t = (jnp.asarray(t0_mod, jnp.int32) + jnp.arange(n, dtype=jnp.int32)
         + jnp.int32(time_offset)) % den
    fnum = _expand(prog.fnum, slot_len)
    pnum = _expand(prog.pnum, slot_len)
    u = (fnum * t + pnum) % den
    theta = u.astype(jnp.float32) * jnp.float32(TWO_PI / den)
    i = _expand(prog.gi, slot_len) * jnp.cos(theta)
    q = _expand(prog.gq, slot_len) * jnp.cos(theta + jnp.float32(prog.qshift))
    return i, q


def stagger_bit_planes(
    b0: jnp.ndarray, b1: jnp.ndarray, prev_b1: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Half-symbol staggering for MSK/OQPSK as a static shift of the Q plane.

    Reproduces `EvenOddOffset` (`data.rs:81-123`): the I bit updates at symbol
    boundaries, the Q bit half a symbol later, so on the half-symbol slot grid

        slot 2m   -> (b0[m], b1[m-1])
        slot 2m+1 -> (b0[m], b1[m])

    with ``b1[-1]`` supplied by ``prev_b1`` (0 on the first block, matching the
    reference's zero-initialized ``cur`` buffer, `data.rs:97-99`).

    Returns per-slot bit planes ``[..., 2K]`` and the carry for the next block.
    """
    k = b0.shape[-1]
    b0_slots = _expand(b0, 2)
    b1_shift = jnp.concatenate(
        [jnp.broadcast_to(prev_b1[..., None], b1.shape[:-1] + (1,)), b1[..., :-1]],
        axis=-1,
    )
    b1_slots = jnp.stack([b1_shift, b1], axis=-1).reshape(b1.shape[:-1] + (2 * k,))
    return b0_slots, b1_slots, b1[..., -1]

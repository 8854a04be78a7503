"""Time-sharded digital modulator: stateful phase carry across devices.

The reference's per-symbol ``update()`` accumulators (SURVEY.md section 3.4:
DMPSK `dmpsk.rs:29-33`, MFSK `mfsk.rs:68-75`, BFSK `bfsk.rs:43-55`, DCQPSK
parity `dcqpsk.rs:42-44`, the MSK/OQPSK staggered-bit carry `data.rs:97-99`)
are already modular prefix sums *within* a block (see ``modem_tpu.models``).
Splitting one stream's symbol axis across a mesh axis adds exactly two
cross-device dependencies, each resolved with one tiny collective:

1. **boundary state** — the first symbol of shard ``t`` compares against the
   last symbol of shard ``t-1`` (BFSK's ``prev``, MFSK's ``cur_coef``, the
   MSK/OQPSK staggered bit): one nearest-neighbor ``ppermute`` of the final
   symbol. Device 0 receives zeros, matching every scheme's zero initial state.
2. **phase offset** — the additive phase accumulator entering shard ``t`` is
   the sum of all previous shards' local phase totals: an exclusive prefix
   scan (:func:`..parallel.collectives.exclusive_prefix`). Integer-turn
   schemes apply it as a ``pnum`` shift (exact); DMPSK applies it as a complex
   rotation of its constellation output.

DCQPSK's parity and the NCO/time origins need no collective at all: they are
closed-form in the device index (parity = ``(t*K_local) % 2``, time origin =
``t * n_local mod den``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TWO_PI
from ..models.base import IQProgram, PhaseProgram, synthesize
from ..models.fsk import BFSK, MFSK, MSK
from ..models.psk import DCQPSK, DMPSK, OQPSK
from ..tx import Modulator, REF_TIME_OFFSET
from ..utils.bits import pack_bits
from .collectives import exclusive_prefix, left_halo


def _boundary_state(scheme, symbols_l: jnp.ndarray, axis_name: str):
    """Per-shard initial scheme state with zeroed additive phase parts.

    Uses one ppermute of the previous shard's final symbol; device 0's zeros
    reproduce each scheme's documented initial state.
    """
    batch = symbols_l.shape[:-1]
    prev_sym = left_halo(symbols_l, 1, axis_name)[..., 0]  # [batch]
    t_idx = jax.lax.axis_index(axis_name)
    k_local = symbols_l.shape[-1]

    if isinstance(scheme, BFSK):
        return {"prev": prev_sym, "pnum": jnp.zeros(batch, jnp.int32)}
    if isinstance(scheme, MFSK):
        # coef(0) != 0 for the bipolar map, so shard 0 must keep the true
        # initial coefficient 0 (`mfsk.rs:57`).
        cur = jnp.where(t_idx == 0, jnp.zeros(batch, jnp.int32),
                        scheme.coef(prev_sym))
        return {"cur_coef": cur, "pnum": jnp.zeros(batch, jnp.int32)}
    if isinstance(scheme, DMPSK):
        return jnp.where(t_idx == 0,
                         jnp.full(batch, scheme.phase0_turns, jnp.float32),
                         jnp.zeros(batch, jnp.float32))
    if isinstance(scheme, DCQPSK):
        return jnp.broadcast_to((t_idx * k_local) % 2, batch).astype(jnp.int32)
    if isinstance(scheme, (MSK, OQPSK)):
        return (prev_sym & 1).astype(jnp.int32)
    return scheme.init_state(batch)  # stateless / closed-form schemes


def _apply_phase_offset(scheme, prog, new_state, axis_name: str):
    """Add the cross-device exclusive-prefix of additive phase accumulators."""
    if isinstance(scheme, (BFSK, MFSK)):
        off = exclusive_prefix(new_state["pnum"], axis_name) % scheme.den
        prog = PhaseProgram(
            gi=prog.gi, gq=prog.gq, fnum=prog.fnum,
            pnum=(prog.pnum + off[..., None]) % scheme.den,
            den=prog.den, qshift=prog.qshift,
            slots_per_symbol=prog.slots_per_symbol,
        )
        return prog
    if isinstance(scheme, DMPSK):
        off = exclusive_prefix(new_state, axis_name) % 1.0
        theta = (off * jnp.float32(TWO_PI))[..., None]
        c, s = jnp.cos(theta), jnp.sin(theta)
        return IQProgram(i=prog.i * c - prog.q * s, q=prog.i * s + prog.q * c,
                         slots_per_symbol=prog.slots_per_symbol)
    return prog


def time_sharded_baseband(
    mod: Modulator, bits: jnp.ndarray, mesh: Mesh,
    time_axis: str = "time", ch_axis: str | None = "ch",
):
    """bits ``[C, K*bps]`` (or ``[K*bps]``) -> baseband I/Q, sharded over the
    mesh, with decisions identical to :meth:`Modulator.baseband` from a fresh
    state. Integer-phase schemes are bit-exact; DMPSK matches to f32 rotation
    accuracy."""
    scheme, rates = mod.scheme, mod.rates
    sps = rates.samples_per_symbol

    def local(bits_l):
        symbols = pack_bits(bits_l, scheme.bits_per_symbol)
        n_local = symbols.shape[-1] * sps
        t_idx = jax.lax.axis_index(time_axis)
        t0_mod = (t_idx * (n_local % mod.den)) % mod.den
        state = _boundary_state(scheme, symbols, time_axis)
        prog, new_state = scheme.program(symbols, state, rates, t0_mod)
        prog = _apply_phase_offset(scheme, prog, new_state, time_axis)
        return synthesize(prog, sps, t0_mod, REF_TIME_OFFSET)

    if bits.ndim > 1 and ch_axis:
        spec = P(ch_axis, *([None] * (bits.ndim - 2)), time_axis)
    else:
        spec = P(time_axis)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec,),
                       out_specs=(spec, spec), check_vma=False)
    sharded = jax.device_put(bits, NamedSharding(mesh, spec))
    return jax.jit(fn)(sharded)

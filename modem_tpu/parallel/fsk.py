"""Time-sharded fused FSK loopback: the fused discriminator kernel on every
device with cross-device phase continuity.

Two properties make this composition tight:

* the continuity accumulators cross shard boundaries exactly as in
  :func:`.modulator.time_sharded_baseband` (boundary ppermute + exclusive
  prefix scan of per-shard phase totals);
* each device evaluates its waveform in *local* time by folding its global
  sample offset ``S0 = t * n_local`` into the phase numerator —
  ``fnum*(t_local + S0) + pnum == fnum*t_local + (pnum + fnum*S0)`` mod den —
  so the kernel needs no notion of global position;
* the discriminator's ``guard >= 1`` already discards every
  boundary-crossing increment, so no waveform halo is exchanged at all.

Noiseless decisions equal the single-device fused kernel exactly (tested).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Rates
from ..tx import Modulator
from ..utils.bits import pack_bits, unpack_symbols
from .modulator import _apply_phase_offset, _boundary_state


def time_sharded_fsk_roundtrip_fn(
    scheme, rates: Rates, mesh: Mesh, guard: int = 1,
    snr_db: float | None = None,
    time_axis: str = "time", ch_axis: str | None = "ch",
):
    """Returns jit(f(bits [C, K*bps], seed) -> decided bits), the fused FSK
    chain sharded over the mesh. ``snr_db`` as in ``fused_fsk_chain``."""
    from ..ops.pallas_fsk import fsk_coef_table, fsk_decide_from_program

    coefs = fsk_coef_table(scheme)
    amp = float(scheme.amplitude)
    mod = Modulator(scheme, rates)  # for den resolution / validation
    den = mod.den
    sps = rates.samples_per_symbol
    sigma = None
    if snr_db is not None:
        sigma = amp / math.sqrt(2.0) * 10.0 ** (-snr_db / 20.0)

    def local(bits_l, seed):
        symbols = pack_bits(bits_l, scheme.bits_per_symbol)
        t_idx = jax.lax.axis_index(time_axis)
        n_local = symbols.shape[-1] * sps
        s0 = (t_idx * (n_local % den)) % den
        state = _boundary_state(scheme, symbols, time_axis)
        prog, new_state = scheme.program(symbols, state, rates, s0)
        prog = _apply_phase_offset(scheme, prog, new_state, time_axis)
        # Fold the shard's global sample offset into the phase numerator so
        # the kernel evaluates in local time. fnum*s0 stays in int32: the
        # scheme constructors assert max|fnum|*den < 2^31 and s0 < den.
        pnum = (prog.pnum + prog.fnum * s0) % den
        dev_seed = (jnp.asarray(seed, jnp.int32)
                    + t_idx * jnp.int32(104729)
                    + (jax.lax.axis_index(ch_axis) * jnp.int32(15485863)
                       if ch_axis and bits_l.ndim > 1 else 0))
        dec = fsk_decide_from_program(
            prog.fnum, pnum, coefs, den, sps, amp, float(prog.qshift),
            guard, sigma=sigma, seed=dev_seed,
        )
        return unpack_symbols(dec, scheme.bits_per_symbol)

    spec = (P(ch_axis, time_axis) if ch_axis else P(time_axis))
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, P()),
                       out_specs=spec, check_vma=False)

    def run(bits, seed):
        placed = jax.device_put(bits, NamedSharding(mesh, spec))
        return jax.jit(fn)(placed, seed)

    return run

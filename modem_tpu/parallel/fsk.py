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
    chunk_sym: int | None = None,
    interpret: bool | None = None,
):
    """Returns jit(f(bits [C, K*bps] or [K*bps], seed) -> decided bits), the
    fused FSK chain sharded over the mesh. ``snr_db`` as in
    ``fused_fsk_chain``; ``chunk_sym``/``interpret`` are forwarded to the
    kernel (``chunk_sym`` defaults to the kernel's tile size; pick a smaller
    multiple of 32 when per-device symbol counts are small, to avoid padding
    whole tiles)."""
    from ..ops.pallas_fsk import (
        DEFAULT_CHUNK_SYM, fsk_coef_table, fsk_decide_from_program,
        fsk_noise_sigma,
    )

    coefs = fsk_coef_table(scheme)
    amp = float(scheme.amplitude)
    mod = Modulator(scheme, rates)  # for den resolution / validation
    den = mod.den
    sps = rates.samples_per_symbol
    sigma = None if snr_db is None else fsk_noise_sigma(amp, snr_db)
    if chunk_sym is None:
        chunk_sym = DEFAULT_CHUNK_SYM

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
        dev_seed = jnp.asarray(seed, jnp.int32) + t_idx * jnp.int32(104729)
        if bits_l.ndim > 1 and ch_axis:
            dev_seed = dev_seed + (jax.lax.axis_index(ch_axis)
                                   * jnp.int32(15485863))
        dec = fsk_decide_from_program(
            prog.fnum, pnum, coefs, den, sps, amp, float(prog.qshift),
            guard, chunk_sym, interpret, sigma, dev_seed,
        )
        return unpack_symbols(dec, scheme.bits_per_symbol)

    return _make_runner(local, mesh, time_axis, ch_axis)


def _make_runner(local, mesh, time_axis, ch_axis):
    def run(bits, seed):
        # Spec follows the input rank (1-D streams shard over time only,
        # matching time_sharded_baseband's accepted shapes).
        if bits.ndim > 1 and ch_axis:
            spec = P(ch_axis, *([None] * (bits.ndim - 2)), time_axis)
        else:
            spec = P(time_axis)
        fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, P()),
                           out_specs=spec, check_vma=False)
        placed = jax.device_put(bits, NamedSharding(mesh, spec))
        return jax.jit(fn)(placed, seed)

    return run

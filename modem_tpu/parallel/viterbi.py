"""Time-sharded Viterbi decoding over the mesh.

The Viterbi ACS recursion is sequential over trellis steps — the FEC analog
of the long-context problem (SURVEY.md §5): a single ``lax.scan`` cannot
span devices. The production answer is the same one every streaming
hardware decoder uses and :meth:`modem_tpu.fec.ConvCode.decode_soft_windowed`
implements on one chip: *truncated traceback*. Each device decodes its
contiguous slab of the LLR stream with ``halo_steps`` of context from both
neighbors (one ``ppermute`` each — the identical halo pattern to the
sharded FIR, :mod:`modem_tpu.parallel.fir`), starts from free path metrics
(device 0: the exact terminated-trellis metric), and tracks back from its
best final state. Survivor paths merge within ~5–10 constraint lengths, so
the sharded decisions match the single-device full-block decode except with
vanishing probability; the tests pin exact equality at the default halo.

Per-device work is ``T/D + 2h`` steps — ≥85% scaling efficiency whenever
the slab dwarfs the halo (h = 70 steps for K=7 vs slabs of many thousands).

The per-slab decode here is the exact-parity XLA scan form — on a real
pod where per-chip throughput matters, shard the CHANNEL axis instead
(``parallel/generic.channel_sharded``) and run
``decode_soft_windowed(backend="pallas")`` per shard: the fused kernel
(`modem_tpu.ops.pallas_viterbi`, ~5x) composes with shard_map directly,
and batch sharding is the natural layout for wide channel banks anyway.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fec.conv import ConvCode, _GUARD
from .collectives import left_halo, right_halo


def viterbi_with_halo(llrs: jnp.ndarray, code: ConvCode, halo_steps: int,
                      axis_name: str) -> jnp.ndarray:
    """Local slab of a time-sharded soft decode. Call inside ``shard_map``.

    ``llrs``: local flat slab ``[..., n*T_local]`` of the per-code-bit LLR
    stream (positive = bit 0). Returns the slab's per-step input-bit
    decisions ``[..., T_local]`` (the global K-1 flush-bit trim is the
    caller's, after unsharding).
    """
    n = code.n
    h = int(halo_steps)
    lh = left_halo(llrs, h * n, axis_name)
    # Device 0 has no left neighbor: its halo is the pre-stream guard
    # region, which pins it to the exact terminated-trellis start (see
    # ``modem_tpu.fec.conv._GUARD``).
    lh = jnp.where(jax.lax.axis_index(axis_name) == 0,
                   jnp.full_like(lh, _GUARD), lh)
    rh = right_halo(llrs, h * n, axis_name)
    # The last device's halo is the post-stream guard region, and its
    # traceback is pinned to the terminated end state (state 0) — together
    # these reproduce the exact terminated-trellis end constraint.
    last = jax.lax.axis_index(axis_name) == jax.lax.axis_size(axis_name) - 1
    rh = jnp.where(last, jnp.full_like(rh, _GUARD), rh)
    x = jnp.concatenate([lh, llrs, rh], axis=-1)
    t = x.shape[-1] // n
    lam = x.reshape(x.shape[:-1] + (t, n))
    pm0 = jnp.zeros((code.n_states,), jnp.float32)
    pin = jnp.full((code.n_states,), 1e9, jnp.float32).at[0].set(0.0)
    bias = jnp.where(last, pin, jnp.zeros_like(pin))
    bits = code._acs(lam, pm0=pm0, end_state="argmin", trim=False,
                     end_bias=bias)
    return bits[..., h:t - h]


def sharded_viterbi_fn(code: ConvCode, mesh: Mesh, halo_steps: int | None
                       = None, time_axis: str = "time",
                       batch_axis: str | None = "ch"):
    """Jitted ``llrs [..., n*T] -> data bits [..., T - (K-1)]`` with the
    LLR stream sharded over ``time_axis`` (and channels over
    ``batch_axis``); ``n*T`` must divide by the time-axis size into slabs
    of at least ``halo_steps`` (default ``10*K``) trellis steps."""
    h = 10 * code.k if halo_steps is None else int(halo_steps)

    def fn(llrs):
        d = mesh.shape[time_axis]
        if llrs.shape[-1] % (d * code.n):
            raise ValueError(
                f"flat LLR length {llrs.shape[-1]} must divide by "
                f"{d} devices x n={code.n} into whole-step slabs")
        if llrs.shape[-1] // (d * code.n) < h:
            raise ValueError(
                f"slab of {llrs.shape[-1] // (d * code.n)} steps is smaller "
                f"than the {h}-step halo; use fewer devices or less halo")
        spec = P(*((batch_axis,) + (None,) * (llrs.ndim - 2) + (time_axis,))
                 if batch_axis and llrs.ndim > 1 else (time_axis,))
        dec = jax.shard_map(
            partial(viterbi_with_halo, code=code, halo_steps=h,
                    axis_name=time_axis),
            mesh=mesh, in_specs=(spec,), out_specs=spec,
        )(llrs)
        return dec[..., : dec.shape[-1] - (code.k - 1)]

    return jax.jit(fn)

"""Generic channel sharding: wrap ANY batched block transform.

Every chain in this framework is a pure batched function over a leading
channel axis, so "data parallelism" for a new chain should not require a
bespoke wrapper. ``channel_sharded`` turns any ``[C, ...] pytree ->
[C, ...] pytree`` callable into a jitted ``shard_map`` over the ``"ch"``
mesh axis with zero collectives — the pattern of
:func:`modem_tpu.parallel.acquire.sharded_acquire_fn` and
:mod:`modem_tpu.parallel.ofdm`, generalized. Use the bespoke wrappers
when cross-channel structure exists (time sharding, halos, psum'd
metrics); use this for embarrassingly-parallel chains (GMSK, STBC,
per-channel receivers).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def channel_sharded(fn, mesh: Mesh, ch_axis: str = "ch"):
    """``fn``: pure function of arrays whose leading axis is the channel
    bank (every argument and every output sharded the same way). Returns
    the jitted sharded function; outputs are bitwise those of ``fn``
    (the per-shard computation is identical, just narrower).

    ``C`` must divide by the mesh's ``ch_axis`` size.
    """

    def wrapped(*args):
        shaped = jax.eval_shape(fn, *args)
        in_specs = jax.tree.map(lambda _: P(ch_axis), tuple(args))
        out_specs = jax.tree.map(lambda _: P(ch_axis), shaped)
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(*args)

    return jax.jit(wrapped)

"""Numeric sanity and shard-consistency checks (SURVEY.md section 5).

The reference is single-threaded with no sanitizers; a pure-functional JAX
chain has no data races by construction, so the useful checks here are
numeric (NaN/Inf creeping through a filter chain) and distributed-boundary
consistency (halo regions must agree across devices bit-for-bit — the
overlap-save seams are where off-by-one bugs live, SURVEY.md section 7
"Hard parts" (3)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def finite_fraction(tree) -> jnp.ndarray:
    """Fraction of finite float leaves' elements (1.0 = all finite)."""
    leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.float32(1.0)
    tot = sum(leaf.size for leaf in leaves)
    fin = sum(jnp.sum(jnp.isfinite(leaf)) for leaf in leaves)
    return fin / tot


def assert_finite(tree, name: str = "value") -> None:
    """Eager check (host sync): raise if any float leaf has NaN/Inf."""
    frac = float(finite_fraction(tree))
    if frac < 1.0:
        raise FloatingPointError(
            f"{name}: {100 * (1 - frac):.4f}% of elements are NaN/Inf"
        )


def halo_mismatch(
    x: jnp.ndarray, mesh: Mesh, halo: int, time_axis: str = "time",
    batch_axis: str | None = "ch",
) -> jnp.ndarray:
    """Max |boundary disagreement| between neighboring time shards.

    For a stream sharded along ``time_axis``, each device's first ``halo``
    samples are compared against what its left neighbor would hand it (the
    neighbor's last ``halo`` samples are NOT the same samples — this checks
    *redundantly computed* overlap regions, e.g. a waveform each shard
    recomputed in its halo). For exact overlap-save implementations the
    result must be exactly 0.0; device 0 is excluded (no left neighbor).
    """
    if x.ndim > 1 and batch_axis:
        spec = P(batch_axis, *([None] * (x.ndim - 2)), time_axis)
    else:
        spec = P(time_axis)

    def local(blk):
        n_dev = jax.lax.axis_size(time_axis)
        recv = jax.lax.ppermute(
            blk[..., blk.shape[-1] - halo:], time_axis,
            [(i, i + 1) for i in range(n_dev - 1)],
        )
        diff = jnp.max(jnp.abs(recv - blk[..., :halo]))
        idx = jax.lax.axis_index(time_axis)
        diff = jnp.where(idx == 0, 0.0, diff)
        diff = jax.lax.pmax(diff, time_axis)
        if batch_axis and x.ndim > 1:
            diff = jax.lax.pmax(diff, batch_axis)
        return diff

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec,), out_specs=P(),
        check_vma=False,
    ))(x)

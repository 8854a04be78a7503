"""Time-sharded FIR: overlap-save across devices via halo exchange.

A causal FIR over a stream split across a mesh axis needs only the ``taps-1``
trailing samples of the left neighbor (SURVEY.md section 5 "Long-context /
sequence parallelism"); the exchange is one ``ppermute`` and the result is
bitwise identical to the single-device filter (same backend, same summation
order), because :func:`modem_tpu.ops.fir.fir_filter` already treats the left
history as an explicit ``state`` tensor.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fir import fir_filter
from .collectives import left_halo


def fir_with_halo(
    x: jnp.ndarray, taps, axis_name: str, backend: str = "direct"
) -> jnp.ndarray:
    """Local shard of a globally-causal FIR. Call inside ``shard_map``.

    ``x``: local block ``[..., n_local]`` of a stream sharded over
    ``axis_name``. Device 0's history is zeros (fresh filter,
    `/root/reference/src/modem/fir.rs:12-15`).
    """
    taps = np.asarray(taps, np.float32)
    k = taps.shape[0]
    state = left_halo(x, k - 1, axis_name) if k > 1 else None
    y, _ = fir_filter(x, taps, state, backend)
    return y


def sharded_fir(
    x: jnp.ndarray,
    taps,
    mesh: Mesh,
    time_axis: str = "time",
    backend: str = "direct",
    batch_axis: str | None = "ch",
) -> jnp.ndarray:
    """Jitted globally-causal FIR over a time-sharded (and optionally
    channel-sharded) array ``x [..., n]``; ``n`` must divide by the time-axis
    size. Returns ``y`` with the same sharding."""
    spec = P(*((batch_axis,) + (None,) * (x.ndim - 2) + (time_axis,))
             if batch_axis and x.ndim > 1 else (time_axis,))
    fn = jax.shard_map(
        partial(fir_with_halo, taps=taps, axis_name=time_axis, backend=backend),
        mesh=mesh, in_specs=(spec,), out_specs=spec,
    )
    return jax.jit(fn)(x)

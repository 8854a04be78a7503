"""Channel-sharded burst acquisition.

Burst acquisition (:class:`modem_tpu.sync.AcquiringReceiver`) is
embarrassingly parallel over channels — every estimator (Oerder&Meyr
timing, differential frame sync, preamble carrier fit, LMMSE solve, the
block phase-tracking scan) is an independent per-channel reduction — so the
distributed form is a pure ``shard_map`` over the ``"ch"`` mesh axis with
zero collectives: a 256-channel burst bank acquires on N devices at N-fold
throughput (the config #5 pattern of `BASELINE.json`, applied to the
acquisition path).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def sharded_acquire_fn(rxr, mesh: Mesh, n_payload: int,
                       ch_axis: str = "ch"):
    """A jitted ``(i [C, N], q [C, N]) -> bits [C, n_payload*bps]`` with
    channels sharded over ``ch_axis``; decisions bitwise-equal to the
    single-device :meth:`modem_tpu.sync.AcquiringReceiver.rx`.

    ``C`` must divide by the mesh's ``ch_axis`` size; all other mesh axes
    are replicated (acquisition of one burst is a single-shard problem in
    time — the search window is acquisition-sized, not stream-sized).
    """
    spec = P(ch_axis, None)

    def local(i, q):
        return rxr.rx(i, q, n_payload)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)

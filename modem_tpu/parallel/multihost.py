"""Multi-host bootstrap (the NCCL/MPI-equivalent layer, SURVEY.md section 2.6).

There is no custom transport in this framework: within a slice the XLA
collectives ride ICI, across hosts DCN — all compiled from the same
``shard_map`` programs. The only host-side requirement is process bootstrap,
which ``jax.distributed`` handles; this module wraps it with the modem
defaults and returns the global mesh.

Typical pod usage (same script on every host):

    from modem_tpu.parallel.multihost import initialize_multihost
    mesh = initialize_multihost(ch=-1, time=4)
    sc = ShardedPulseChain(chain, mesh)   # unchanged from single-host code

Single-host/multi-device falls through to a plain local mesh, so the same
entry point runs everywhere.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh

from .mesh import make_modem_mesh


def initialize_multihost(
    ch: int = -1,
    time: int = 1,
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> Mesh:
    """Initialize ``jax.distributed`` (when running under a multi-process
    launcher or given explicit coordinates) and build the global
    ``("ch", "time")`` mesh over all devices in the job.

    With no arguments and no launcher environment this is a no-op wrapper
    around :func:`make_modem_mesh` on the local devices.
    """
    want_init = (
        coordinator_address is not None
        or num_processes is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    # jax.process_count() would itself initialize the XLA backend (which must
    # not happen before jax.distributed.initialize), so query the distributed
    # runtime's own state instead.
    if want_init and not jax.distributed.is_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_modem_mesh(ch=ch, time=time)

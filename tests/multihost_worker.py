"""Worker for the 2-process ``jax.distributed`` test (run by
``tests/test_multihost.py``, one instance per process).

Each process owns 4 virtual CPU devices (8 global), initializes the
``jax.distributed`` bootstrap through
:func:`modem_tpu.parallel.multihost.initialize_multihost` — the actual
cross-process collective path a pod deployment uses — and runs the full
distributed flagship step (sharded TX -> matched filter with cross-process
ppermute halos -> slicer -> global psum BER) on a ("ch", "time") mesh that
spans both processes.

Usage: python multihost_worker.py <coordinator_addr> <num_procs> <proc_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main(coordinator: str, num_procs: int, proc_id: int) -> None:
    from modem_tpu.chain import qpsk_reference_chain
    from modem_tpu.config import Rates
    from modem_tpu.parallel.chain import ShardedPulseChain
    from modem_tpu.parallel.multihost import initialize_multihost

    mesh = initialize_multihost(
        ch=2, time=4,
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    chain = qpsk_reference_chain(Rates(baud_rate=1250, sample_rate=10000))
    sharded = ShardedPulseChain(chain, mesh)

    # Identical host-side data on every process; each device materializes its
    # own shard of the global array.
    n_ch, n_sym = 4, 64
    bps = chain.scheme.bits_per_symbol
    rng = np.random.default_rng(0)
    bits_host = rng.integers(0, 2, (n_ch, n_sym * bps)).astype(np.int32)
    sharding = NamedSharding(mesh, P("ch", "time"))
    bits = jax.make_array_from_callback(
        bits_host.shape, sharding, lambda idx: bits_host[idx]
    )

    # Noiseless distributed roundtrip: decisions must be exact, so the global
    # error count (psum across both processes) must be zero.
    err, tot = sharded.ber_fn(snr_db=None)(bits, jax.random.key(0))
    err, tot = int(err), int(tot)
    assert tot == bits_host.size, (tot, bits_host.size)
    assert err == 0, f"{err} bit errors across processes"

    # High-SNR AWGN leg exercises the per-shard RNG folding too.
    err20, tot20 = sharded.ber_fn(snr_db=20.0)(bits, jax.random.key(1))
    assert int(tot20) == bits_host.size
    assert int(err20) == 0, f"{int(err20)} errors at 20 dB"

    jax.distributed.shutdown()
    print(f"proc {proc_id}: OK err={err} tot={tot}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

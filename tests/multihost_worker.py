"""Worker for the multi-process ``jax.distributed`` tests (run by
``tests/test_multihost.py``, one instance per process).

Each process owns ``devs`` virtual CPU devices, initializes the
``jax.distributed`` bootstrap through
:func:`modem_tpu.parallel.multihost.initialize_multihost` — the actual
cross-process collective path a pod deployment uses — and runs:

1. the full distributed flagship step (sharded TX -> matched filter with
   ppermute halos -> slicer -> global psum BER) on a ("ch", "time") mesh
   spanning all processes, and
2. an explicit time-sharded FIR whose halo exchange crosses the process
   boundary (with devs=1 and time>1 every ppermute hop is inter-process),
   asserted bitwise against the single-device filter on each local shard.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
                                  [ch] [time] [devs_per_proc]
"""

import os
import sys

N_DEVS = int(sys.argv[6]) if len(sys.argv) > 6 else 4

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEVS}"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def _check_cross_process_fir(mesh, t_axis: int) -> None:
    """Time-sharded FIR parity: each local shard of the distributed result
    must equal the same slice of the single-device filter bitwise. With one
    device per process the ``ppermute`` halo hop is pure inter-process DCN
    (well, TCP here) traffic — the exact path a pod halo exchange takes."""
    from modem_tpu.ops.fir import fir_filter
    from modem_tpu.parallel.fir import sharded_fir

    taps = np.arange(1, 16, dtype=np.float32) / 16.0   # 15 taps -> 14 halo
    n_ch = mesh.shape["ch"] * 2
    n = t_axis * 256
    rng = np.random.default_rng(42)
    x_host = rng.standard_normal((n_ch, n)).astype(np.float32)

    sharding = NamedSharding(mesh, P("ch", "time"))
    x = jax.make_array_from_callback(
        x_host.shape, sharding, lambda idx: x_host[idx])
    y = sharded_fir(x, taps, mesh)

    # Single-device reference on this process's local CPU device.
    y_ref, _ = jax.jit(lambda a: fir_filter(a, taps, None, "direct"))(
        jnp.asarray(x_host))
    y_ref = np.asarray(y_ref)
    for shard in y.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), y_ref[shard.index],
            err_msg=f"halo mismatch on shard {shard.index}")


def main(coordinator: str, num_procs: int, proc_id: int,
         ch: int, t_axis: int) -> None:
    from modem_tpu.chain import qpsk_reference_chain
    from modem_tpu.config import Rates
    from modem_tpu.parallel.chain import ShardedPulseChain
    from modem_tpu.parallel.multihost import initialize_multihost

    mesh = initialize_multihost(
        ch=ch, time=t_axis,
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == N_DEVS * num_procs, len(jax.devices())

    _check_cross_process_fir(mesh, t_axis)

    chain = qpsk_reference_chain(Rates(baud_rate=1250, sample_rate=10000))
    sharded = ShardedPulseChain(chain, mesh)

    # Identical host-side data on every process; each device materializes its
    # own shard of the global array.
    n_ch, n_sym = 2 * ch, 32 * t_axis
    bps = chain.scheme.bits_per_symbol
    rng = np.random.default_rng(0)
    bits_host = rng.integers(0, 2, (n_ch, n_sym * bps)).astype(np.int32)
    sharding = NamedSharding(mesh, P("ch", "time"))
    bits = jax.make_array_from_callback(
        bits_host.shape, sharding, lambda idx: bits_host[idx]
    )

    # Noiseless distributed roundtrip: decisions must be exact, so the global
    # error count (psum across all processes) must be zero.
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
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
         int(sys.argv[4]) if len(sys.argv) > 4 else 2,
         int(sys.argv[5]) if len(sys.argv) > 5 else 4)

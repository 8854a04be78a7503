"""Scaling-efficiency harness: the 256-channel bank across a device mesh.

BASELINE.md's scaling target (>=85% efficiency at N>=2) needs real multi-chip
hardware; this environment exposes one chip, so by default this harness runs
on a virtual CPU mesh (``--platform cpu --devices 8``), which validates the
*distributed program* (shard_map, ppermute halos, psum) and measures the
collective/stitching overhead of the sharded chain — the quantity that
determines scaling efficiency once per-device compute is fixed. On a real
pod, run with ``--platform tpu`` unchanged.

Method: run the SAME total workload (a 256-channel bank by default) once
unsharded on a 1-device mesh and once sharded over N devices, and report
``efficiency = T_unsharded / T_sharded``. On virtual CPU devices all "chips"
share one host's cores, so total compute capacity is constant and any
shortfall from 1.0 is exactly the cost the distributed program adds
(ppermute halos, psum, stitching) — the overhead term of real-pod scaling
efficiency. On a real pod the same number is weak-scaling efficiency with
the workload scaled N-fold. Timing uses the device-side scan + checksum
methodology of bench.py.

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def collective_overheads(mesh, axis: str, shape, repeats=(8, 64)):
    """Marginal per-call cost of each collective the sharded chain uses.

    Times a ``shard_map`` program that applies the collective R times inside
    a ``lax.scan`` (carry-dependent, so nothing is DCE'd), at two repeat
    counts, and reports the slope ``(t_R2 - t_R1) / (R2 - R1)`` — the
    dispatch floor and the local compute cancel, leaving the collective
    itself (bench_device.py methodology). Returns ``{name: seconds_per_call}``.
    """
    import time as _time
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def ppermute(x):
        return lax.ppermute(x, axis, perm)

    def psum(x):
        # psum output is axis-invariant; pvary restores the varying type so
        # it can sit in a scan carry of sharded values.
        return lax.pvary(lax.psum(x, axis), axis) / n_dev

    def all_gather(x):
        g = lax.all_gather(x, axis, axis=-1, tiled=True)
        return lax.dynamic_slice_in_dim(
            g, lax.axis_index(axis) * x.shape[-1], x.shape[-1], -1)

    def all_to_all(x):
        # split the last dim across the axis and re-concatenate
        return lax.all_to_all(x, axis, split_axis=x.ndim - 1,
                              concat_axis=x.ndim - 1, tiled=True)

    colls = {"ppermute": ppermute, "psum": psum,
             "all_gather": all_gather, "all_to_all": all_to_all}

    spec = P(*((None,) * (len(shape) - 1) + (axis,)))
    sharding = NamedSharding(mesh, spec)
    x0 = jax.device_put(jnp.ones(shape, jnp.float32), sharding)
    out = {}
    for name, coll in colls.items():
        def local(x, r):
            def body(c, _):
                return coll(c) * 0.999 + 1e-6, 0
            y, _ = lax.scan(body, x, None, length=r)
            return y

        def run(r):
            fn = jax.jit(jax.shard_map(partial(local, r=r), mesh=mesh,
                                       in_specs=(spec,), out_specs=spec))
            s = jax.jit(lambda a: jnp.sum(fn(a)))
            float(s(x0))  # compile + absorb first sync
            best = float("inf")
            for _ in range(3):
                t0 = _time.perf_counter()
                float(s(x0))
                best = min(best, _time.perf_counter() - t0)
            return best

        r1, r2 = repeats
        out[name] = max(0.0, (run(r2) - run(r1)) / (r2 - r1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "axon"])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--channels-per-device", type=int, default=32)
    ap.add_argument("--symbols", type=int, default=2048)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--collectives", action="store_true",
                    help="also report per-collective marginal cost "
                         "(ppermute/psum/all_gather/all_to_all) on the mesh")
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from modem_tpu import Rates
    from modem_tpu.chain import qpsk_reference_chain
    from modem_tpu.parallel import ShardedPulseChain, make_modem_mesh

    rates = Rates(1250, 10000)
    chain = qpsk_reference_chain(rates)
    rng = np.random.default_rng(0)

    full_ch = max(1, args.devices // 2)
    full_t = args.devices // full_ch

    def run_config(n_dev: int) -> float:
        ch_axis = max(1, n_dev // 2)
        t_axis = n_dev // ch_axis
        mesh = make_modem_mesh(ch=ch_axis, time=t_axis,
                               devices=jax.devices()[:n_dev])
        sc = ShardedPulseChain(chain, mesh)
        # Total workload is FIXED across configs (sized by the full mesh).
        channels = args.channels_per_device * full_ch
        n_sym = args.symbols * full_t
        from jax.sharding import NamedSharding, PartitionSpec as P

        bits_np = rng.integers(
            0, 2, (args.blocks, channels, n_sym * 2)).astype(np.int32)
        blocks = jax.device_put(
            jnp.asarray(bits_np),
            NamedSharding(mesh, P(None, "ch", "time")),
        )
        step = sc.ber_fn(snr_db=10.0)

        def sweep(bl):
            def body(c, b):
                e, t = step(b, jax.random.key(0))
                return c, e
            _, errs = jax.lax.scan(body, 0, bl)
            return jnp.sum(errs)

        fn = jax.jit(sweep)
        fn(blocks).block_until_ready()
        int(fn(blocks))  # absorb first-sync anomaly
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(fn(blocks))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run_config(1)
    tn = run_config(args.devices)
    eff = t1 / tn  # same total work: shortfall from 1.0 = stitching overhead

    record = {
        "metric": "sharding_overhead_efficiency",
        "value": round(eff, 3),
        "unit": f"T1/T{args.devices}",
        "vs_baseline": round(eff / 0.85, 3),
        "platform": args.platform,
        "devices": args.devices,
    }
    if args.collectives:
        mesh = make_modem_mesh(ch=1, time=args.devices)
        per_shard = (8, 2048 * args.devices // args.devices)
        us = collective_overheads(mesh, "time",
                                  (8, 2048 * args.devices))
        record["collective_us_per_call"] = {
            k: round(v * 1e6, 1) for k, v in us.items()}
        record["collective_shape_per_shard"] = list(per_shard)
    print(json.dumps(record))


if __name__ == "__main__":
    main()

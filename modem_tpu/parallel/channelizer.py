"""Distributed wideband channelizer: the BASELINE config #5 front end.

One wideband antenna stream is **time-sharded** across the mesh, each
device runs the polyphase analysis bank on its slice (overlap-save: the
bank's full lookback — ``J*M`` wideband samples — arrives from the left
neighbor as a single ``ppermute`` halo), and one ``all_to_all`` re-deals
the result from time-sharding to **channel-sharding**, where the
per-channel demod chains / acquiring receivers already run data-parallel
(`parallel/chain.py`, `parallel/acquire.py`). The TX direction is the
mirror image. Together: channel-sharded modems on every device ↔ one
wideband stream at M× the channel rate, with exactly one halo exchange
and one all-to-all per direction, both riding ICI.

Edge devices receive zeros from ``ppermute`` — identical to the banks'
zero-initialized streaming history, so the sharded math is the same sum
as the single-device :class:`modem_tpu.ops.channelizer.Channelizer`
(waveforms match to float32 ULP — XLA orders the DFT-matmul accumulation
differently inside ``shard_map`` — and decisions match exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.channelizer import Channelizer
from .collectives import left_halo


def sharded_analyze_fn(bank: Channelizer, mesh: Mesh,
                       time_axis: str = "time"):
    """A jitted ``(wi [N], wq [N]) -> (yi, yq) [M, N/M]`` with the wideband
    input time-sharded over ``time_axis`` and the channel outputs sharded
    the same way along time. ULP-parity vs ``bank.analyze``.

    Local slice lengths must divide by ``M`` and exceed the bank lookback
    ``J*M`` (true for any production block size).
    """
    m, j = bank.m, bank.taps_per_phase

    def local(wi, wq):
        hi = left_halo(wi, j * m, time_axis)
        hq = left_halo(wq, j * m, time_axis)
        yi, yq = bank.analyze(jnp.concatenate([hi, wi], axis=-1),
                              jnp.concatenate([hq, wq], axis=-1))
        return yi[..., j:], yq[..., j:]  # drop the halo's J warm-up rows

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(time_axis), P(time_axis)),
        out_specs=(P(None, time_axis), P(None, time_axis)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_synthesize_fn(bank: Channelizer, mesh: Mesh,
                          time_axis: str = "time"):
    """A jitted ``(ci [M, K], cq [M, K]) -> (wi, wq) [M*K]`` with channel
    inputs time-sharded along their sample axis and the wideband output
    time-sharded. ULP-parity vs ``bank.synthesize``."""
    j = bank.taps_per_phase

    def local(ci, cq):
        hi = left_halo(ci, j - 1, time_axis)
        hq = left_halo(cq, j - 1, time_axis)
        wi, wq = bank.synthesize(jnp.concatenate([hi, ci], axis=-1),
                                 jnp.concatenate([hq, cq], axis=-1))
        return wi[..., (j - 1) * bank.m:], wq[..., (j - 1) * bank.m:]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, time_axis), P(None, time_axis)),
        out_specs=(P(time_axis), P(time_axis)),
        check_vma=False,
    )
    return jax.jit(fn)


def wideband_rx_fn(bank: Channelizer, mesh: Mesh, time_axis: str = "time"):
    """Analysis + re-deal: ``(wi [N], wq [N]) -> (yi, yq) [M, N/M]`` with
    the wideband input time-sharded and the outputs **channel-sharded**
    (dim 0 over ``time_axis``), ready for the data-parallel per-channel
    receivers. ``M`` and ``N/M`` must divide by the axis size."""
    m, j = bank.m, bank.taps_per_phase

    def local(wi, wq):
        hi = left_halo(wi, j * m, time_axis)
        hq = left_halo(wq, j * m, time_axis)
        yi, yq = bank.analyze(jnp.concatenate([hi, wi], axis=-1),
                              jnp.concatenate([hq, wq], axis=-1))
        yi, yq = yi[..., j:], yq[..., j:]     # [M, K_local]
        # re-deal: time-sharded channels -> channel-sharded time
        yi = jax.lax.all_to_all(yi, time_axis, split_axis=0,
                                concat_axis=1, tiled=True)
        yq = jax.lax.all_to_all(yq, time_axis, split_axis=0,
                                concat_axis=1, tiled=True)
        return yi, yq                          # [M/D, K]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(time_axis), P(time_axis)),
        out_specs=(P(time_axis, None), P(time_axis, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def wideband_tx_fn(bank: Channelizer, mesh: Mesh, time_axis: str = "time"):
    """Re-deal + synthesis: ``(ci [M, K], cq [M, K]) -> (wi, wq) [M*K]``
    with channel-sharded inputs (dim 0 over ``time_axis``) and a
    time-sharded wideband output — the TX mirror of
    :func:`wideband_rx_fn`."""
    j = bank.taps_per_phase

    def local(ci, cq):
        # channel-sharded time -> time-sharded channels
        ci = jax.lax.all_to_all(ci, time_axis, split_axis=1,
                                concat_axis=0, tiled=True)
        cq = jax.lax.all_to_all(cq, time_axis, split_axis=1,
                                concat_axis=0, tiled=True)
        hi = left_halo(ci, j - 1, time_axis)
        hq = left_halo(cq, j - 1, time_axis)
        wi, wq = bank.synthesize(jnp.concatenate([hi, ci], axis=-1),
                                 jnp.concatenate([hq, cq], axis=-1))
        return wi[..., (j - 1) * bank.m:], wq[..., (j - 1) * bank.m:]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(time_axis, None), P(time_axis, None)),
        out_specs=(P(time_axis), P(time_axis)),
        check_vma=False,
    )
    return jax.jit(fn)

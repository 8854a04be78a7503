"""Channel-sharded OFDM over the device mesh.

An OFDM link (:class:`modem_tpu.ofdm.OfdmModem`) is embarrassingly
parallel over independent streams — the reduced-DFT matmuls, the LS
channel estimate, the pilot CPE correction, and the blind S&C/LTF
acquisition are all per-stream reductions — so the distributed form is a
pure ``shard_map`` over the ``"ch"`` mesh axis with zero collectives,
the same pattern as :mod:`modem_tpu.parallel.acquire`. The per-device
DFT matrices are closed over at trace time and replicated (a few hundred
KB of VMEM-friendly constants), so each device runs the full MXU matmul
pipeline on its channel shard.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def sharded_ofdm_tx_fn(modem, mesh: Mesh, ch_axis: str = "ch"):
    """Jitted ``bits [C, S*bits_per_sym] -> (i, q) [C, frame_len]`` with
    channels sharded over ``ch_axis``; waveform bitwise-equal to the
    single-device :meth:`modem_tpu.ofdm.OfdmModem.tx_frame`."""
    spec = P(ch_axis, None)

    def local(bits):
        return modem.tx_frame(bits)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec),
        check_vma=False))


def sharded_ofdm_rx_fn(modem, mesh: Mesh, n_symbols: int,
                       max_lag: int | None = None, ch_axis: str = "ch"):
    """Jitted ``(i [C, T], q [C, T]) -> bits`` with channels sharded over
    ``ch_axis``. With ``max_lag`` set, runs the blind acquisition path
    (:meth:`OfdmModem.acquire`); otherwise the frame-aligned
    :meth:`OfdmModem.rx_frame`. Decisions are bitwise-equal to the
    single-device receiver."""
    spec = P(ch_axis, None)

    def local(i, q):
        if max_lag is None:
            return modem.rx_frame(i, q, n_symbols)
        bits, _ = modem.acquire(i, q, n_symbols, max_lag)
        return bits

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False))

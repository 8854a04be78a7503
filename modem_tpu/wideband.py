"""WidebandModem: M burst modems behind one wideband front end.

The production composition the pieces were built for, as one object: a
:class:`modem_tpu.sync.AcquiringReceiver` per channel (all channels share
one chain/preamble), a :class:`modem_tpu.ops.channelizer.Channelizer`
synthesis/analysis pair, and — given a device mesh — the distributed
wideband front end (`parallel/channelizer.py`: time-sharded banks,
all_to_all re-deal) plus channel-sharded acquisition.

It owns the bookkeeping the composition needs (the part that is fiddly by
hand, see `examples/wideband_bank.py`): the listen window is extended past
the burst so both banks' group delay (≈ ``2·J`` channel-rate samples) and
the receiver's decision lookahead stay inside the analyzed window, then
rounded so the per-device slices divide evenly. The blind acquisition
absorbs the banks' group delay and gain, so no delay/scale calibration is
ever needed.

Reference: none (strictly single-channel, one stream per process —
`modulate.rs`/`demodulate.rs`); this is BASELINE config #5's "one wideband
antenna, M-channel bank" system surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from .ops.channelizer import Channelizer
from .sync import AcquiringReceiver


class WidebandModem:
    """``tx``: per-channel payload bits ``[M, n_payload*bps]`` -> one
    wideband I/Q stream at ``M×`` the channel rate. ``rx``: the inverse,
    via blind per-channel burst acquisition.

    With ``mesh`` (any mesh whose ``time_axis`` divides both ``M`` and the
    listen window), TX/RX run the distributed front end; without, the
    single-device banks.
    """

    def __init__(self, rxr: AcquiringReceiver, m: int, n_payload: int,
                 taps_per_phase: int = 12, beta: float = 9.0,
                 mesh: Mesh | None = None, time_axis: str = "time"):
        self.rxr = rxr
        self.m = int(m)
        self.n_payload = int(n_payload)
        self.bank = Channelizer(m, taps_per_phase, beta)
        self.mesh = mesh
        self.time_axis = time_axis
        d = mesh.shape[time_axis] if mesh is not None else 1
        if self.m % d:
            raise ValueError(f"M={m} must divide by the {time_axis!r} "
                             f"axis size {d}")
        # Listen window (channel-rate samples): the burst itself, plus the
        # two banks' group delay (~2·J rows), plus the receiver's decision
        # lookahead margin; rounded up to divide by the mesh.
        p = len(rxr.pre_syms)
        # chain TX emits (n_syms + span) * sps samples (span flush symbols)
        burst = (p + n_payload + rxr.chain.span) * rxr.chain.sps
        margin = 2 * taps_per_phase + rxr.max_lag // rxr.chain.sps + 8
        self.window = -(-(burst + margin) // d) * d
        self._burst_len = burst

    # ---- TX ------------------------------------------------------------

    def tx(self, payload_bits: jnp.ndarray):
        """``[M, n_payload*bps]`` bits -> wideband ``(wi, wq)``, each
        ``[M * window]`` samples at the wideband rate."""
        if payload_bits.shape[-2] != self.m:
            raise ValueError(f"expected {self.m} channels")
        ci, cq = self.rxr.tx_burst(payload_bits)
        pad = self.window - ci.shape[-1]
        if pad < 0:
            raise ValueError("burst longer than the listen window")
        z = jnp.zeros(ci.shape[:-1] + (pad,), ci.dtype)
        ci = jnp.concatenate([ci, z], axis=-1)
        cq = jnp.concatenate([cq, z], axis=-1)
        if self.mesh is None:
            return self.bank.synthesize(ci, cq)
        from .parallel.channelizer import wideband_tx_fn

        return wideband_tx_fn(self.bank, self.mesh, self.time_axis)(ci, cq)

    # ---- RX ------------------------------------------------------------

    def rx(self, wi: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
        """Wideband ``[M * window]`` I/Q -> payload bits
        ``[M, n_payload*bps]`` via blind per-channel acquisition."""
        if self.mesh is None:
            yi, yq = self.bank.analyze(wi, wq)
            return self.rxr.rx(yi, yq, self.n_payload)
        from .parallel.acquire import sharded_acquire_fn
        from .parallel.channelizer import wideband_rx_fn
        from .parallel.mesh import make_modem_mesh

        yi, yq = wideband_rx_fn(self.bank, self.mesh, self.time_axis)(
            wi, wq)
        d = self.mesh.shape[self.time_axis]
        ch_mesh = make_modem_mesh(
            ch=d, time=1,
            devices=list(self.mesh.devices.flat))
        return sharded_acquire_fn(self.rxr, ch_mesh, self.n_payload)(yi, yq)

"""Time-sharded reference-parity receiver.

Distributes :class:`modem_tpu.rx.Demodulator`'s coherent product detector
over a ``("ch", "time")`` mesh with the exact reference semantics
(`demodulator.rs:32-56`):

* the 64-sample PLL acquisition runs where the stream starts — on time-shard
  0 — and the acquired offset is broadcast with one ``psum``;
* the carrier phase per shard is closed-form in the device index;
* the steady-state lowpass filters start *fresh* at sample 64 (the reference
  builds them after lock): shard 0 zeroes its first 64 mixer products, which
  makes its filter state at sample 64 exactly a fresh filter's;
* the lowpass FIRs stitch across shards by left-halo ``ppermute``
  (overlap-save), so outputs for samples >= 64 are bitwise those of the
  single-device demodulator.

Outputs for samples < 64 (the lock preamble) are zeros; the CLI drops them.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fir import fir_filter
from ..ops.nco import carrier_phase, mix_down
from ..ops.pll import LOCK_SAMPLES, pll_lock
from ..rx import Demodulator
from .fir import fir_with_halo


def sharded_demodulate(
    demod: Demodulator, x: jnp.ndarray, mesh: Mesh,
    time_axis: str = "time", ch_axis: str | None = "ch",
):
    """``x [C, N]`` (or ``[N]``) real passband -> ``(i, q)`` same shape.

    Requires each time shard to hold at least ``LOCK_SAMPLES`` samples.
    """
    sr = demod.sample_rate
    hz = demod.carrier_hz
    lp = np.asarray(demod.lowpass, np.float32)
    hb = np.asarray(demod.hilbert, np.float32)

    def local(blk):
        n = blk.shape[-1]
        t = jax.lax.axis_index(time_axis)

        # Acquisition on the stream head (shard 0), offset psum-broadcast.
        head = blk[..., :LOCK_SAMPLES]
        h, _ = fir_filter(head, hb)
        theta0 = carrier_phase(hz, sr, LOCK_SAMPLES, 0)
        phi_local = pll_lock(head, h, theta0)
        phi = jax.lax.psum(
            jnp.where(t == 0, phi_local, jnp.zeros_like(phi_local)),
            time_axis,
        )

        # Steady state: closed-form per-shard carrier phase + acquired offset.
        s0 = (t * (n % sr)) % sr
        theta = carrier_phase(hz, sr, n, s0) + phi[..., None]
        mi, mq = mix_down(blk, theta)
        # Fresh-filter semantics at sample 64: zero the pre-lock products.
        idx = jnp.arange(n, dtype=jnp.int32)
        pre = (t == 0) & (idx < LOCK_SAMPLES)
        mi = jnp.where(pre, 0.0, mi)
        mq = jnp.where(pre, 0.0, mq)
        yi = fir_with_halo(mi, lp, time_axis, demod.fir_backend)
        yq = fir_with_halo(mq, lp, time_axis, demod.fir_backend)
        return 2.0 * yi, 2.0 * yq

    if x.ndim > 1 and ch_axis:
        spec = P(ch_axis, *([None] * (x.ndim - 2)), time_axis)
    else:
        spec = P(time_axis)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec,),
                       out_specs=(spec, spec), check_vma=False)
    placed = jax.device_put(x, NamedSharding(mesh, spec))
    return jax.jit(fn)(placed)

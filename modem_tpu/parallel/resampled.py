"""Distributed resampled chain (BASELINE config #4 at scale).

Shards :class:`modem_tpu.resampled.ResampledChain` over ``("ch", "time")``
like the pulse chain: channels are embarrassingly parallel; the time axis
splits the *symbol* stream, each device running the fused resampled kernels
(:mod:`modem_tpu.ops.pallas_resampled`) on its slice with ppermute halos of
the channel-rate waveform.

Alignment: the rational stages are periodically time-varying, so a shard's
slice must start on a pattern boundary — ``Kl * sps % down == 0`` (whole
channel samples per shard) and ``Kl % P == 0`` with ``P = down /
gcd(sps*up, down)`` (the composite RX stage's output period). Halo sizes are
rounded to whole symbols with the same property, making every shard's local
kernel arithmetic identical to the global one shifted by an exact number of
pattern periods. Noiseless decisions equal the single-device fused chain
exactly (tested).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..resampled import ResampledChain
from ..utils.bits import pack_bits, unpack_symbols
from .collectives import left_halo, right_halo


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedResampledChain:
    """Distribute a :class:`ResampledChain` over mesh axes ``("ch", "time")``.

    ``bits [C, K*bps]``: channel axis over ``ch``, symbol axis over ``time``.
    TX emits the channel-rate waveform sharded over time (plus per-shard
    drain tails, the stream's true drain only on the last device — the same
    convention as ``ShardedPulseChain``); RX consumes that pair.
    """

    def __init__(self, chain: ResampledChain, mesh: Mesh):
        self.chain = chain
        self.mesh = mesh
        self.t_dev = mesh.shape["time"]
        c = chain
        self.sps, self.up, self.down = c.sps, c.up, c.down
        g = math.gcd(self.sps * self.up, self.down)
        #: composite RX stage period (symbols) — shard slices must align
        self.period = self.down // g
        #: symbol-count quantum: whole channel samples AND whole RX periods
        q1 = self.down // math.gcd(self.sps, self.down)
        self.quantum = q1 * self.period // math.gcd(q1, self.period)
        # TX symbol lookback: stage-1 taps + RRC span, rounded so the halo
        # covers whole channel samples
        kp1 = -(-len(c.taps1) // self.up)
        e_l = -(-(kp1 - 1) // self.sps) + c.span
        self.e_l = _roundup(max(e_l, 1), self.quantum)
        # RX halos in symbols: left covers the composite lookback (kp2 taps
        # at channel rate ~ 1 symbol), right covers the decision delay
        kp2 = -(-len(c.taps2) // self.down)
        e_sl = -(-((kp2 - 1) * self.down) // (self.sps * self.up)) + 1
        self.e_sl = _roundup(max(e_sl, 1), self.quantum)
        e_sr = -(-(c.delay + 1) // self.sps) + 1
        self.e_sr = _roundup(e_sr, self.quantum)

    def _ch_rows(self, n_sym: int) -> int:
        return n_sym * self.sps * self.up // self.down

    def _check(self, k_local: int):
        if (k_local * self.sps) % self.down or k_local % self.period:
            raise ValueError(
                f"symbols per time-shard ({k_local}) must be a multiple of "
                f"{self.quantum} for up/down {self.up}/{self.down}")
        need = max(self.e_l, self.e_sl, self.e_sr)
        if k_local < need:
            raise ValueError(
                f"symbols per time-shard ({k_local}) smaller than the "
                f"largest halo ({need}): halos ride one ppermute hop, so "
                "each shard must hold at least one halo's worth of symbols")

    # -- local steps (under shard_map) ---------------------------------------

    def _local_tx(self, bits_l: jnp.ndarray):
        """bits [Cl, Kl*bps] -> (wave rails [Cl, Kl*sps*up/down], drain
        rails) — the fused resampled TX on [left symbol halo | local]."""
        from ..ops.pallas_resampled import fused_resampled_tx

        c = self.chain
        syms = pack_bits(bits_l, c.scheme.bits_per_symbol)
        kl = syms.shape[-1]
        self._check(kl)
        t = jax.lax.axis_index("time")
        halo = jnp.where(t == 0, -1, left_halo(syms, self.e_l, "time"))
        ext = jnp.concatenate([halo, syms], axis=-1)
        # local drain: same length the global one-shot appends after the
        # last symbol (flush + delay margin, rounded to `down`)
        k_glob = kl * self.t_dev
        drain = c._padded_len(k_glob) - k_glob * self.sps
        n_modem = (self.e_l + kl) * self.sps + drain
        wi, wq = fused_resampled_tx(
            ext, c.lut, np.asarray(c.rrc), self.sps, c.span,
            self.up, self.down, c.taps1, n_modem,
        )
        lo = self._ch_rows(self.e_l)
        hi = lo + self._ch_rows(kl)
        return ((wi[..., lo:hi], wq[..., lo:hi]),
                (wi[..., hi:], wq[..., hi:]))

    def _local_rx(self, waves, drains, n_sym_l: int):
        """Channel-rate shard + ppermute halos -> this shard's decisions."""
        from ..ops.pallas_resampled import fused_resampled_rx

        c = self.chain
        self._check(n_sym_l)
        t = jax.lax.axis_index("time")
        h_l = self._ch_rows(self.e_sl)
        h_r = self._ch_rows(self.e_sr)
        is_first = t == 0
        is_last = t == self.t_dev - 1
        window = []
        for w, d in zip(waves, drains):
            lh = jnp.where(is_first, 0.0, left_halo(w, h_l, "time"))
            pad = h_r - d.shape[-1]
            d_pad = (jnp.concatenate(
                [d, jnp.zeros(d.shape[:-1] + (max(pad, 0),), d.dtype)],
                axis=-1)[..., :h_r])
            rh = jnp.where(is_last, d_pad, right_halo(w, h_r, "time"))
            window.append(jnp.concatenate([lh, w, rh], axis=-1))
        dec = fused_resampled_rx(
            tuple(window), self.e_sl + n_sym_l, c.lut, np.asarray(c.rrc),
            self.sps, c.span, self.up, self.down, c.taps2, c.delay,
        )
        dec = dec[..., self.e_sl:]
        return unpack_symbols(dec, c.scheme.bits_per_symbol)

    # -- public jitted entry points ------------------------------------------

    def fused_tx_fn(self):
        """jit(f(bits [C, K*bps]) -> (wave, drain) rail tuples), the fused
        resampled TX per shard with a ppermute symbol halo."""
        spec = P("ch", "time")
        fn = jax.shard_map(self._local_tx, mesh=self.mesh, in_specs=(spec,),
                           out_specs=spec, check_vma=False)
        return jax.jit(fn)

    def fused_rx_fn(self):
        """jit(f(wave, drain) -> decided bits) — composes with
        :meth:`fused_tx_fn` to the exact single-device fused decisions."""
        spec = P("ch", "time")

        def step(waves, drains):
            n_sym_l = (waves[0].shape[-1] * self.down
                       // (self.sps * self.up))
            return self._local_rx(waves, drains, n_sym_l)

        fn = jax.shard_map(step, mesh=self.mesh, in_specs=(spec, spec),
                           out_specs=spec, check_vma=False)
        return jax.jit(fn)

    def fused_roundtrip_fn(self):
        """jit(f(bits) -> decided bits): TX and RX shard steps fused in one
        program (the waveform halos still ride ppermute)."""
        spec = P("ch", "time")

        def step(bits_l):
            waves, drains = self._local_tx(bits_l)
            n_sym_l = (bits_l.shape[-1]
                       // self.chain.scheme.bits_per_symbol)
            return self._local_rx(waves, drains, n_sym_l)

        fn = jax.shard_map(step, mesh=self.mesh, in_specs=(spec,),
                           out_specs=spec, check_vma=False)
        return jax.jit(fn)

    def shard_bits(self, bits: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(
            bits, NamedSharding(self.mesh, P("ch", "time")))

"""The 2D-sharded flagship chain: channels x time over a ("ch", "time") mesh.

Implements BASELINE.md's scaling configuration (a bank of independent channels,
each channel's sample stream optionally split across the time axis) as one
``jax.shard_map``-wrapped step whose bits->bits decisions are **exactly** those
of the single-device :class:`modem_tpu.chain.PulseShapedChain`:

* TX pulse shaping and the RX matched filter are globally-causal FIRs stitched
  with left-halo ``ppermute`` exchanges (overlap-save across devices);
* symbol decisions at global index ``span*sps + m*sps`` may fall in the right
  neighbor's shard, so each device receives a ``span*sps``-sample *right* halo
  of the neighbor's filtered output;
* the final device has no right neighbor — it instead filters a local
  ``span*sps``-zero extension, which is by construction identical to the
  single-device chain's flush tail (flush symbols are zero-stuffed zeros).

Every collective is a nearest-neighbor ``ppermute`` (rides ICI) plus one
``psum`` for the BER counters; payloads are O(filter taps), not O(stream).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..chain import PulseShapedChain, upsample_zero_stuff
from ..ops.fir import fir_filter
from ..ops.nco import carrier_phase
from ..ops.slicer import lut_map, lut_slice
from ..utils.bits import pack_bits, unpack_symbols
from .collectives import left_halo, right_halo


class ShardedPulseChain:
    """Distribute a :class:`PulseShapedChain` over ``mesh`` axes ``("ch",
    "time")``. Channel axis 0 of ``bits [C, n_bits]`` is sharded over ``ch``;
    the symbol/sample axis over ``time``.

    Baseband and passband (``carrier_hz``) both supported in the staged and
    fused paths — the per-shard NCO phase is closed-form in the device index
    (no collective).
    """

    def __init__(self, chain: PulseShapedChain, mesh: Mesh):
        self.chain = chain
        self.mesh = mesh
        self.t_dev = mesh.shape["time"]

    def _shard_thetas(self, n: int, ext_len: int):
        """Carrier phases for this shard's samples and its extension region —
        closed-form in the device index (no collective): shard t starts at
        global sample t*n."""
        sr = self.chain.rates.sample_rate
        hz = self.chain.carrier_hz
        t_idx = jax.lax.axis_index("time")
        s0 = (t_idx * (n % sr)) % sr
        th = carrier_phase(hz, sr, n, s0)
        th_e = carrier_phase(hz, sr, ext_len, (s0 + n % sr) % sr)
        return th, th_e

    # -- the local (per-device) step, run under shard_map --------------------

    def _local_tx(self, bits_l: jnp.ndarray):
        """bits [Cl, Kl*bps] -> (wave [Cl, n], ext [Cl, d]) where ``ext`` is
        the locally-filtered zero extension (only meaningful on the last
        device, where it equals the flush tail)."""
        ch = self.chain
        sps, d = ch.sps, ch.span * ch.sps
        syms = pack_bits(bits_l, ch.scheme.bits_per_symbol)
        mi, mq = lut_map(syms, ch.lut)  # one-hot matmul, not a gather
        ui = upsample_zero_stuff(mi, sps)
        uq = upsample_zero_stuff(mq, sps)
        z = jnp.zeros(ui.shape[:-1] + (d,), ui.dtype)
        ui = jnp.concatenate([ui, z], axis=-1)
        uq = jnp.concatenate([uq, z], axis=-1)
        k = ch.rrc.shape[0]
        # Halo over the *zero-stuffed* stream: its last k-1 samples.
        hi = left_halo(ui[..., : ui.shape[-1] - d], k - 1, "time")
        hq = left_halo(uq[..., : uq.shape[-1] - d], k - 1, "time")
        si, _ = fir_filter(ui, ch.rrc, hi, ch.fir_backend)
        sq, _ = fir_filter(uq, ch.rrc, hq, ch.fir_backend)
        n = ui.shape[-1] - d
        return (si[..., :n], sq[..., :n]), (si[..., n:], sq[..., n:])

    def _local_rx(self, wave, ext, n_sym_local: int):
        """Matched filter + decimate + slice, with the right halo stitched
        from the neighbor's filtered output (or the local flush extension on
        the last device)."""
        ch = self.chain
        d = ch.span * ch.sps
        (xi, xq), (ei, eq) = wave, ext
        k = ch.rrc.shape[0]
        hi = left_halo(xi, k - 1, "time")
        hq = left_halo(xq, k - 1, "time")
        # Filter the local block and its extension in one pass.
        yi, _ = fir_filter(jnp.concatenate([xi, ei], axis=-1), ch.rrc, hi,
                           ch.fir_backend)
        yq, _ = fir_filter(jnp.concatenate([xq, eq], axis=-1), ch.rrc, hq,
                           ch.fir_backend)
        n = xi.shape[-1]
        # Right halo of the *valid* filtered region; the last device keeps its
        # locally-computed extension (the flush tail).
        is_last = jax.lax.axis_index("time") == self.t_dev - 1
        ti = jnp.where(is_last, yi[..., n:], right_halo(yi[..., :n], d, "time"))
        tq = jnp.where(is_last, yq[..., n:], right_halo(yq[..., :n], d, "time"))
        zi = jnp.concatenate([yi[..., :n], ti], axis=-1)
        zq = jnp.concatenate([yq[..., :n], tq], axis=-1)
        idx = d + jnp.arange(n_sym_local, dtype=jnp.int32) * ch.sps
        syms = lut_slice(zi[..., idx], zq[..., idx], ch.lut)
        return unpack_symbols(syms, ch.scheme.bits_per_symbol)

    def _local_roundtrip(self, bits_l, key_l, snr_db):
        wave, ext = self._local_tx(bits_l)
        if self.chain.carrier_hz is not None:
            # Passband leg: upconvert to a real waveform (the "channel"
            # signal, `modulate.rs:128-133`), optionally add real AWGN, then
            # coherent product detection (`demodulator.rs:52-55` 2x gain) —
            # all with closed-form per-shard carrier phase.
            n, d = wave[0].shape[-1], ext[0].shape[-1]
            th, th_e = self._shard_thetas(n, d)
            x = wave[0] * jnp.cos(th) - wave[1] * jnp.sin(th)
            xe = ext[0] * jnp.cos(th_e) - ext[1] * jnp.sin(th_e)
            if snr_db is not None:
                kdev = jax.random.fold_in(
                    jax.random.fold_in(key_l, jax.lax.axis_index("time")),
                    jax.lax.axis_index("ch"),
                )
                k1, k2 = jax.random.split(kdev)
                es = float(np.mean(np.sum(np.asarray(self.chain.lut) ** 2,
                                          -1)))
                # Decision-rail noise after the 2x product detector is
                # 2*sigma_pass^2; solve for Es/N0 at the decision point.
                sig = jnp.float32(
                    np.sqrt(es / (10.0 ** (snr_db / 10.0)) / 4.0))
                x = x + sig * jax.random.normal(k1, x.shape)
                xe = xe + sig * jax.random.normal(k2, xe.shape)
            wave = (2.0 * x * jnp.cos(th), -2.0 * x * jnp.sin(th))
            ext = (2.0 * xe * jnp.cos(th_e), -2.0 * xe * jnp.sin(th_e))
            n_sym_l = bits_l.shape[-1] // self.chain.scheme.bits_per_symbol
            return self._local_rx(wave, ext, n_sym_l)
        if snr_db is not None:
            # Per-device noise stream: fold the shard coordinates into the key.
            kdev = jax.random.fold_in(
                jax.random.fold_in(key_l, jax.lax.axis_index("time")),
                jax.lax.axis_index("ch"),
            )
            k1, k2, k3, k4 = jax.random.split(kdev, 4)
            # snr_db is Es/N0 at the matched-filter decision point (the RRC
            # is unit-energy, so per-rail waveform noise sigma^2 = N0/2) —
            # the same convention as the fused kernel's snr_db.
            es = float(np.mean(np.sum(np.asarray(self.chain.lut) ** 2, -1)))
            sig = jnp.float32(np.sqrt(es / (10.0 ** (snr_db / 10.0)) / 2.0))
            wave = (wave[0] + sig * jax.random.normal(k1, wave[0].shape),
                    wave[1] + sig * jax.random.normal(k2, wave[1].shape))
            ext = (ext[0] + sig * jax.random.normal(k3, ext[0].shape),
                   ext[1] + sig * jax.random.normal(k4, ext[1].shape))
        n_sym_l = bits_l.shape[-1] // self.chain.scheme.bits_per_symbol
        return self._local_rx(wave, ext, n_sym_l)

    # -- public jitted entry points -----------------------------------------

    def roundtrip_fn(self, snr_db: float | None = None):
        """Returns jit(f(bits [C, K*bps], key) -> decided bits), sharded over
        the mesh. Noiseless decisions are exactly the single-device chain's."""
        spec = P("ch", "time")

        def step(bits, key):
            return self._local_roundtrip(bits, key, snr_db)

        fn = jax.shard_map(step, mesh=self.mesh, in_specs=(spec, P()),
                           out_specs=spec, check_vma=False)
        return jax.jit(fn)

    def ber_fn(self, snr_db: float | None = None):
        """Returns jit(f(bits, key) -> (errors, total)): the full distributed
        TX -> channel -> RX -> count step with a global ``psum`` reduction."""
        spec = P("ch", "time")

        def step(bits, key):
            out = self._local_roundtrip(bits, key, snr_db)
            err = jnp.sum((out != bits).astype(jnp.int32))
            tot = jnp.int32(bits.size)
            err = jax.lax.psum(jax.lax.psum(err, "time"), "ch")
            tot = jax.lax.psum(jax.lax.psum(tot, "time"), "ch")
            return err, tot

        fn = jax.shard_map(step, mesh=self.mesh, in_specs=(spec, P()),
                           out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn)

    def shard_bits(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Place host bits on the mesh with the chain's sharding."""
        return jax.device_put(
            bits, NamedSharding(self.mesh, P("ch", "time"))
        )

    # -- fused-kernel path: shard_map over chips, one Pallas kernel inside ---

    def _local_fused(self, bits_l, seed, snr_db):
        """Per-device fused chain with symbol halos exchanged via ppermute.

        The kernel needs ``span`` symbols of left context and ``span+1`` of
        right context; beyond-stream positions are marked with the kernel's
        ``-1`` zero-I/Q sentinel (start state / flush). Halo decisions are
        recomputed locally and trimmed, so every symbol is decided once with
        full context — noiseless decisions exactly match the single-device
        fused kernel.
        """
        from ..ops.pallas_chain import fused_pulse_chain
        from ..utils.bits import pack_bits as _pack, unpack_symbols as _unpack

        ch = self.chain
        span = ch.span
        bps = ch.scheme.bits_per_symbol
        syms = _pack(bits_l, bps)
        t = jax.lax.axis_index("time")
        left = left_halo(syms, span, "time")
        right = right_halo(syms, span + 1, "time")
        left = jnp.where(t == 0, -1, left)
        right = jnp.where(t == self.t_dev - 1, -1, right)
        ext = jnp.concatenate([left, syms, right], axis=-1)
        dev_seed = None
        if snr_db is not None:
            dev_seed = (jnp.asarray(seed, jnp.int32)
                        + t * jnp.int32(104729)
                        + jax.lax.axis_index("ch") * jnp.int32(15485863))
        pb = {}
        if ch.carrier_hz is not None:
            # ext[..., 0] is stream-global symbol t*Kl - span; the kernel's
            # integer NCO keeps every shard's passband phase exact.
            pb = dict(carrier_hz=ch.carrier_hz,
                      sample_rate=ch.rates.sample_rate,
                      sym_offset=t * syms.shape[-1] - span)
        dec = fused_pulse_chain(
            ext, ch.lut, np.asarray(ch.rrc), ch.sps, span,
            snr_db=snr_db, seed=dev_seed, **pb,
        )
        dec = dec[..., span: span + syms.shape[-1]]
        return _unpack(dec, bps)

    def fused_roundtrip_fn(self, snr_db: float | None = None):
        """jit(f(bits, seed) -> decided bits): the fused Pallas kernel on
        every device, stitched with ppermute symbol halos."""
        spec = P("ch", "time")
        fn = jax.shard_map(
            lambda b, s: self._local_fused(b, s, snr_db),
            mesh=self.mesh, in_specs=(spec, P()), out_specs=spec,
            check_vma=False,
        )
        return jax.jit(fn)

    # -- fused one-way paths (production TX / RX halves) ---------------------

    def _local_tx_fused(self, bits_l):
        """Per-device fused TX (`ops/pallas_txrx.fused_tx`) with a ppermute
        symbol left-halo. Returns ``(wave, ext)`` tuples of rails (one rail
        at passband): ``wave`` = this shard's Kl*sps final samples; ``ext`` =
        its locally-computed zero-flush tail, the stream's true flush only
        on the last device (same convention as the staged ``_local_tx``)."""
        from ..ops.pallas_txrx import fused_tx
        from ..utils.bits import pack_bits as _pack

        ch = self.chain
        span, sps = ch.span, ch.sps
        syms = _pack(bits_l, ch.scheme.bits_per_symbol)
        kl = syms.shape[-1]
        t = jax.lax.axis_index("time")
        left = jnp.where(t == 0, -1, left_halo(syms, span, "time"))
        ext_syms = jnp.concatenate([left, syms], axis=-1)
        lut, qp = ch._txrx_params()
        pb = {}
        if ch.carrier_hz is not None:
            pb = dict(carrier_hz=ch.carrier_hz,
                      sample_rate=ch.rates.sample_rate,
                      sym_offset=t * kl - span)
        wave = fused_tx(ext_syms, lut, np.asarray(ch.rrc), sps, span,
                        qam_params=qp, **pb)
        waves = (wave,) if ch.carrier_hz is not None else wave
        d, n = span * sps, kl * sps
        return (tuple(w[..., d: d + n] for w in waves),
                tuple(w[..., d + n:] for w in waves))

    def _local_rx_fused(self, waves, exts, n_sym_l: int):
        """Per-device fused RX: right sample-halo via ppermute (the last
        device uses the flush ``ext``), one kernel per shard; decisions
        exactly match the single-device ``rx_fused``."""
        from ..ops.pallas_txrx import fused_rx
        from ..utils.bits import unpack_symbols as _unpack

        ch = self.chain
        d = ch.span * ch.sps
        t = jax.lax.axis_index("time")
        is_last = t == self.t_dev - 1
        z = tuple(
            jnp.concatenate(
                [w, jnp.where(is_last, e, right_halo(w, d, "time"))], axis=-1)
            for w, e in zip(waves, exts)
        )
        lut, qp = ch._txrx_params()
        pb = {}
        if ch.carrier_hz is not None:
            pb = dict(carrier_hz=ch.carrier_hz,
                      sample_rate=ch.rates.sample_rate,
                      sym_offset=t * n_sym_l)
        dec = fused_rx(z[0] if ch.carrier_hz is not None else z, n_sym_l,
                       lut, np.asarray(ch.rrc), ch.sps, ch.span,
                       qam_params=qp, **pb)
        return _unpack(dec, ch.scheme.bits_per_symbol)

    def fused_tx_fn(self):
        """jit(f(bits [C, K*bps]) -> (wave, ext)): the fused TX kernel on
        every device. ``wave`` rails are the sharded stream waveform;
        ``ext`` rails are per-shard flush tails (see ``_local_tx_fused``)."""
        spec = P("ch", "time")
        fn = jax.shard_map(self._local_tx_fused, mesh=self.mesh,
                           in_specs=(spec,), out_specs=spec, check_vma=False)
        return jax.jit(fn)

    def fused_rx_fn(self):
        """jit(f(wave, ext) -> decided bits) through the fused RX kernel;
        composes with :meth:`fused_tx_fn` to the exact single-device
        decisions (tested)."""
        spec = P("ch", "time")

        def step(waves, exts):
            n_sym_l = waves[0].shape[-1] // self.chain.sps
            return self._local_rx_fused(waves, exts, n_sym_l)

        fn = jax.shard_map(step, mesh=self.mesh, in_specs=(spec, spec),
                           out_specs=spec, check_vma=False)
        return jax.jit(fn)

    def fused_ber_fn(self, snr_db: float):
        """jit(f(bits, seed) -> (errors, total)) through the fused kernel
        with in-kernel AWGN and a global psum."""
        spec = P("ch", "time")

        def step(bits, seed):
            out = self._local_fused(bits, seed, snr_db)
            err = jnp.sum((out != bits).astype(jnp.int32))
            tot = jnp.int32(bits.size)
            err = jax.lax.psum(jax.lax.psum(err, "time"), "ch")
            tot = jax.lax.psum(jax.lax.psum(tot, "time"), "ch")
            return err, tot

        fn = jax.shard_map(step, mesh=self.mesh, in_specs=(spec, P()),
                           out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn)


class ShardedDifferentialChain:
    """Time/channel-sharded fused DMPSK (`dmpsk.rs` as a distributed
    program): the phase accumulator's modular prefix is split into a local
    ``cummod`` plus one :func:`..parallel.collectives.exclusive_prefix` of
    per-shard totals; each device then runs the fused LUT kernel on its
    accumulated-symbol block (with ppermute symbol halos, as the LUT path),
    and the differential decode stitches across shards with one more
    ppermute of the final decision. Noiseless decisions exactly equal
    :meth:`modem_tpu.chain.DifferentialChain.roundtrip_fused`.
    """

    def __init__(self, chain, mesh: Mesh):
        import math as _math

        from ..chain import DifferentialChain

        if not isinstance(chain, DifferentialChain):
            raise TypeError("needs a DifferentialChain")
        sch = chain.scheme
        inv = 1.0 / sch.shift_turns
        m_ph = round(inv)
        if abs(inv - m_ph) > 1e-9 or m_ph != 1 << sch.bits_per_symbol:
            raise NotImplementedError(
                "fused DMPSK needs shift = 2*pi / 2^bits_per_symbol"
            )
        self.chain = chain
        self.mesh = mesh
        self.t_dev = mesh.shape["time"]
        self.m_ph = m_ph
        ang = 2.0 * _math.pi * (sch.phase0_turns + np.arange(m_ph) / m_ph)
        self.lut = np.stack(
            [sch.amplitude * np.cos(ang), sch.amplitude * np.sin(ang)],
            axis=-1,
        ).astype(np.float32)

    def _local(self, bits_l: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas_chain import fused_pulse_chain
        from ..utils.scan import cummod
        from .collectives import exclusive_prefix

        ch = self.chain
        bps = ch.scheme.bits_per_symbol
        span = ch.span
        syms = pack_bits(bits_l, bps)
        acc_l = cummod(syms.astype(jnp.int32), self.m_ph)
        off = exclusive_prefix(acc_l[..., -1], "time") % self.m_ph
        acc = (acc_l + off[..., None]) % self.m_ph
        t = jax.lax.axis_index("time")
        left = left_halo(acc, span, "time")
        right = right_halo(acc, span + 1, "time")
        left = jnp.where(t == 0, -1, left)
        right = jnp.where(t == self.t_dev - 1, -1, right)
        ext = jnp.concatenate([left, acc, right], axis=-1)
        dec_abs = fused_pulse_chain(
            ext, self.lut, np.asarray(ch.rrc), ch.sps, span
        )
        dec_abs = dec_abs[..., span: span + acc.shape[-1]]
        # Differential decode across the shard seam: the previous absolute
        # decision for this shard's first symbol is the left neighbor's last
        # (device 0 receives 0 = the TX initial phase index).
        prev_last = left_halo(dec_abs, 1, "time")
        prev = jnp.concatenate([prev_last, dec_abs[..., :-1]], axis=-1)
        dec = (dec_abs - prev) % self.m_ph
        return unpack_symbols(dec, bps)

    def fused_roundtrip_fn(self):
        """jit(f(bits [C, K*bps]) -> decided bits), sharded over the mesh."""
        spec = P("ch", "time")
        fn = jax.shard_map(self._local, mesh=self.mesh, in_specs=(spec,),
                           out_specs=spec, check_vma=False)
        return jax.jit(fn)

    def shard_bits(self, bits: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(
            bits, NamedSharding(self.mesh, P("ch", "time"))
        )

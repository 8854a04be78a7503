"""Streaming front-end for the fused chain: unbounded symbol streams in
blocks with exact state carry.

The fused kernel decides a symbol from ``span`` symbols of context on each
side, so streaming is a classic span-delay pipeline: a block's last ``span``
decisions stay pending until the next block supplies their lookahead. The
carry is the last ``2*span`` symbols (context + pending); the kernel's ``-1``
sentinel marks pre-stream positions on the first block, and :meth:`flush`
finalizes the pending tail against the kernel's own zero-flush.

Decisions are identical to running the one-shot fused chain on the whole
stream (tested across random block splits).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .chain import PulseShapedChain
from .utils.bits import pack_bits, unpack_symbols


class StreamingFusedChain:
    """Block-streaming wrapper over :func:`modem_tpu.ops.pallas_chain
    .fused_pulse_chain` for one :class:`PulseShapedChain` configuration.

    ``push(bits)`` accepts ``[..., L*bps]`` and returns the newly-finalized
    decided bits (lagging ``span`` symbols behind the input); ``flush()``
    returns the rest. Batch shape is fixed at construction.
    """

    def __init__(self, chain: PulseShapedChain,
                 batch_shape: tuple[int, ...] = ()):
        self.chain = chain
        self.bps = chain.scheme.bits_per_symbol
        self.span = chain.span
        self.batch_shape = batch_shape
        self._tail = jnp.full(batch_shape + (2 * self.span,), -1, jnp.int32)
        self._seen = 0  # real symbols consumed so far

    def _run(self, ext: jnp.ndarray) -> jnp.ndarray:
        from .ops.pallas_chain import fused_pulse_chain

        ch = self.chain
        # Passband blocks need the NCO phase of the *stream-global* sample
        # index: ext[..., 0] is global symbol _seen - 2*span.
        pb = {}
        if ch.carrier_hz is not None:
            pb = dict(carrier_hz=ch.carrier_hz,
                      sample_rate=ch.rates.sample_rate,
                      sym_offset=self._seen - 2 * self.span)
        return fused_pulse_chain(
            ext, ch.lut, np.asarray(ch.rrc), ch.sps, self.span, **pb,
        )

    def push(self, bits: jnp.ndarray) -> jnp.ndarray:
        if bits.shape[:-1] != self.batch_shape:
            raise ValueError("batch shape is fixed at construction")
        syms = pack_bits(bits, self.bps)
        length = syms.shape[-1]
        d = self.span
        ext = jnp.concatenate([self._tail, syms], axis=-1)
        dec = self._run(ext)
        # Positions [d, d+L) have full context; drop any that predate the
        # stream (first call: the pending window isn't populated yet).
        skip = max(0, d - self._seen)
        out = dec[..., d + skip: d + length]
        self._tail = ext[..., ext.shape[-1] - 2 * d:]
        self._seen += length
        return unpack_symbols(out, self.bps)

    def flush(self) -> jnp.ndarray:
        """Finalize the pending ``span`` symbols against the stream-end
        flush; the stream is then finished."""
        d = self.span
        dec = self._run(self._tail)
        pending = min(d, self._seen)
        out = dec[..., 2 * d - pending: 2 * d]
        self._seen = 0
        self._tail = jnp.full(self.batch_shape + (2 * d,), -1, jnp.int32)
        return unpack_symbols(out, self.bps)


    # checkpoint/resume (modem_tpu.checkpoint works on any pytree)
    def get_state(self):
        """The stream's full carry as a pytree for
        :func:`modem_tpu.checkpoint.save_state`."""
        return {"tail": self._tail, "seen": jnp.int32(self._seen)}

    def set_state(self, state) -> None:
        """Restore a carry produced by :meth:`get_state` (possibly via
        :func:`modem_tpu.checkpoint.load_state`)."""
        self._tail = state["tail"]
        self._seen = int(state["seen"])


class StreamingFusedTx:
    """Unbounded bits -> waveform through the fused TX kernel
    (:func:`modem_tpu.ops.pallas_txrx.fused_tx`).

    The pulse shaper only looks *back* ``span`` symbols, so TX streaming has
    no decision lag: ``push(bits)`` with ``L`` symbols returns exactly
    ``L*sps`` final waveform samples; the carry is the last ``span`` symbols.
    ``flush()`` emits the ``span*sps``-sample zero-flush tail. Concatenated
    pushes + flush equal the one-shot :meth:`PulseShapedChain.tx_fused`
    output exactly (same kernel, same summation order — tested across random
    splits)."""

    def __init__(self, chain: PulseShapedChain,
                 batch_shape: tuple[int, ...] = (),
                 out_scale: float | None = None):
        self.chain = chain
        self.bps = chain.scheme.bits_per_symbol
        self.span = chain.span
        self.batch_shape = batch_shape
        self.out_scale = out_scale
        self._tail = jnp.full(batch_shape + (self.span,), -1, jnp.int32)
        self._seen = 0

    def _run(self, ext: jnp.ndarray):
        from .ops.pallas_txrx import fused_tx

        ch = self.chain
        lut, qp = ch._txrx_params()
        wave = fused_tx(
            ext, lut, np.asarray(ch.rrc), ch.sps, self.span,
            carrier_hz=ch.carrier_hz,
            sample_rate=ch.rates.sample_rate
            if ch.carrier_hz is not None else None,
            sym_offset=self._seen - self.span, qam_params=qp,
            out_scale=self.out_scale,
        )
        return (wave,) if ch.carrier_hz is not None else wave

    def push(self, bits: jnp.ndarray):
        """``[..., L*bps]`` bits -> ``[..., L*sps]`` final waveform samples
        (``(i, q)`` tuple at baseband, real array at passband)."""
        if bits.shape[:-1] != self.batch_shape:
            raise ValueError("batch shape is fixed at construction")
        syms = pack_bits(bits, self.bps)
        length = syms.shape[-1]
        d, sps = self.span, self.chain.sps
        ext = jnp.concatenate([self._tail, syms], axis=-1)
        waves = self._run(ext)
        out = tuple(w[..., d * sps: (d + length) * sps] for w in waves)
        self._tail = ext[..., ext.shape[-1] - d:]
        self._seen += length
        return out[0] if self.chain.carrier_hz is not None else out

    def flush(self):
        """Emit the ``span*sps`` flush-tail samples; the stream is then
        finished."""
        d, sps = self.span, self.chain.sps
        waves = self._run(self._tail)
        out = tuple(w[..., d * sps: 2 * d * sps] for w in waves)
        self._seen = 0
        self._tail = jnp.full(self.batch_shape + (d,), -1, jnp.int32)
        return out[0] if self.chain.carrier_hz is not None else out


    def get_state(self):
        """Carry pytree (see :meth:`StreamingFusedChain.get_state`)."""
        return {"tail": self._tail, "seen": jnp.int32(self._seen)}

    def set_state(self, state) -> None:
        self._tail = state["tail"]
        self._seen = int(state["seen"])


class StreamingFusedRx:
    """Unbounded waveform -> bits through the fused RX kernel
    (:func:`modem_tpu.ops.pallas_txrx.fused_rx`).

    The matched filter looks *forward* ``span`` symbols, so decisions lag the
    input by ``span*sps`` samples: the carry is the last ``span*sps``
    samples. Pushing a TX stream including its flush tail yields exactly all
    K decisions; :meth:`flush` finalizes against zeros for truncated streams.
    Push lengths must be multiples of ``sps``."""

    def __init__(self, chain: PulseShapedChain,
                 batch_shape: tuple[int, ...] = ()):
        self.chain = chain
        self.bps = chain.scheme.bits_per_symbol
        self.span = chain.span
        self.batch_shape = batch_shape
        n_wave = 1 if chain.carrier_hz is not None else 2
        self._tail = [jnp.zeros(batch_shape + (self.span * chain.sps,),
                                jnp.float32) for _ in range(n_wave)]
        self._seen = 0  # stream samples consumed so far

    def _run(self, ext, n_symbols: int):
        from .ops.pallas_txrx import fused_rx

        ch = self.chain
        lut, qp = ch._txrx_params()
        return fused_rx(
            ext[0] if ch.carrier_hz is not None else tuple(ext),
            n_symbols, lut, np.asarray(ch.rrc), ch.sps, self.span,
            carrier_hz=ch.carrier_hz,
            sample_rate=ch.rates.sample_rate
            if ch.carrier_hz is not None else None,
            sym_offset=self._seen // ch.sps - self.span, qam_params=qp,
        )

    def push(self, wave) -> jnp.ndarray:
        """``[..., L]`` waveform samples (``L % sps == 0``) -> newly-final
        decided bits (lagging ``span`` symbols)."""
        waves = ([wave] if self.chain.carrier_hz is not None
                 else list(wave))
        sps, d = self.chain.sps, self.span
        length = waves[0].shape[-1]
        if length % sps:
            raise ValueError("push length must be a multiple of sps")
        ext = [jnp.concatenate([t, w.astype(jnp.float32)], axis=-1)
               for t, w in zip(self._tail, waves)]
        dec = self._run(ext, length // sps)
        # ext symbol 0 is global symbol _seen/sps - span: the first `skip`
        # local decisions predate the stream on early calls.
        skip = max(0, d - self._seen // sps)
        out = dec[..., skip:]
        self._tail = [e[..., e.shape[-1] - d * sps:] for e in ext]
        self._seen += length
        return unpack_symbols(out, self.bps)

    def flush(self) -> jnp.ndarray:
        """Finalize pending decisions against a zero tail (for streams
        truncated before the TX flush); the stream is then finished."""
        sps, d = self.chain.sps, self.span
        pending = min(d, self._seen // sps)
        if pending == 0:
            out = jnp.zeros(self.batch_shape + (0,), jnp.int32)
            return unpack_symbols(out, self.bps)
        ext = [jnp.concatenate(
            [t, jnp.zeros(self.batch_shape + (d * sps,), jnp.float32)],
            axis=-1) for t in self._tail]
        dec = self._run(ext, d)
        out = dec[..., d - pending: d]
        self._seen = 0
        self._tail = [jnp.zeros_like(t) for t in self._tail]
        return unpack_symbols(out, self.bps)

    def get_state(self):
        """Carry pytree (see :meth:`StreamingFusedChain.get_state`);
        ``tails`` holds one sample tail per rail."""
        return {"tails": list(self._tail), "seen": jnp.int32(self._seen)}

    def set_state(self, state) -> None:
        self._tail = list(state["tails"])
        self._seen = int(state["seen"])

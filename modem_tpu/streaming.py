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

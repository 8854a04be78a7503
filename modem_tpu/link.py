"""The framed production link: one object from payload bits to waveform.

The reference's CLI surface is "ASCII bits in → waveform out"
(`/root/reference/src/bin/modulate.rs:96-133`) with no integrity, coding,
or whitening. :class:`FramedLink` composes the round-2 subsystems into the
complete production arrangement:

    payload → CRC append → scramble (energy dispersal)
            → [RS outer encode] → inner encode (conv [+ puncture] or
              QC-LDPC) → block interleave → chain TX (RRC waveform,
              fused kernels)

and the exact inverse from soft decision LLRs, ending in a per-frame CRC
verdict — so a user gets bits→waveform→bits with integrity in two calls.
Every stage is a static-shape block transform; the whole TX or RX path
jits as one graph and batches over channels.

All size coupling (CRC width, RS block, conv flush bits, puncture period,
interleaver rows, bits/symbol) is solved and validated at construction
with actionable errors.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .fec import (
    ConvCode, Crc, PolarCode, Puncturer, QcLdpc, ReedSolomon, Scrambler,
    TurboCode,
    block_deinterleave, block_interleave, ccsds_code, crc16_ccitt,
    dvb_scrambler,
)


class FramedLink:
    """A complete coded, scrambled, integrity-checked modem link over a
    bits→bits chain (any ``PulseShapedChain``-family object with ``tx`` /
    ``rx_soft``).

    ``payload_bits`` is required without an RS outer code; with one it is
    implied (``rs.k*8 - crc.w``). ``interleave_rows=0`` disables
    interleaving; ``rs=None`` / ``puncturer=None`` drop those stages.
    ``ldpc`` replaces the convolutional inner code with a QC-LDPC
    (:class:`modem_tpu.fec.QcLdpc`): the framed block must then be a whole
    number of LDPC data blocks (``coded_in % ldpc.k == 0``), and
    puncturing does not apply. ``polar`` likewise selects a polar inner
    code (:class:`modem_tpu.fec.PolarCode` or a rate-matched
    :class:`modem_tpu.fec.RateMatchedPolar`, whose E — not N — bits go
    on the wire; ``coded_in % polar.k == 0``; ``polar_list`` upgrades
    the per-codeword decode from SC to metric-best SCL — the frame CRC
    stays the outer verdict, it does not aid the list decode),
    and ``turbo`` an LTE-shaped turbo inner code
    (:class:`modem_tpu.fec.TurboCode`, ``coded_in % turbo.k == 0``).
    """

    def __init__(self, chain, payload_bits: int | None = None,
                 conv: ConvCode | None = None,
                 rs: ReedSolomon | None = None,
                 puncturer: Puncturer | None = None,
                 interleave_rows: int = 8,
                 scrambler: Scrambler | None = None,
                 crc: Crc | None = None,
                 ldpc: QcLdpc | None = None,
                 ldpc_iters: int = 30,
                 ldpc_early_exit: bool = True,
                 ldpc_msg_dtype=None,
                 polar: PolarCode | None = None,
                 polar_list: int | None = None,
                 turbo: TurboCode | None = None,
                 turbo_iters: int | None = None,
                 turbo_early_exit: bool = True,
                 conv_window: int | None | str = "auto"):
        n_inner = sum(x is not None for x in (conv, ldpc, polar, turbo))
        if n_inner > 1:
            raise ValueError(
                "choose one inner code: conv, ldpc, polar, or turbo")
        if puncturer is not None and (ldpc is not None
                                      or polar is not None
                                      or turbo is not None):
            raise ValueError("puncturing applies to the conv inner code")
        self.chain = chain
        self.ldpc = ldpc
        self.ldpc_iters = int(ldpc_iters)
        self.ldpc_early_exit = bool(ldpc_early_exit)
        self.ldpc_msg_dtype = ldpc_msg_dtype
        self.polar = polar
        self.polar_list = None if polar_list is None else int(polar_list)
        if self.polar_list is not None and polar is None:
            raise ValueError("polar_list needs a polar inner code")
        self.turbo = turbo
        self.turbo_iters = turbo_iters
        self.turbo_early_exit = bool(turbo_early_exit)
        self.conv = (None if (ldpc is not None or polar is not None
                              or turbo is not None)
                     else (ccsds_code() if conv is None else conv))
        self.conv_window = conv_window  # "auto" resolved after sizing
        self.rs = rs
        self.puncturer = puncturer
        self.rows = int(interleave_rows)
        self.scrambler = dvb_scrambler() if scrambler is None else scrambler
        self.crc = crc16_ccitt() if crc is None else crc

        if rs is not None:
            implied = rs.k * 8 - self.crc.w
            if payload_bits is not None and payload_bits != implied:
                raise ValueError(
                    f"payload_bits={payload_bits} conflicts with the RS "
                    f"block: rs.k*8 - crc.w = {implied}")
            payload_bits = implied
        if payload_bits is None:
            raise ValueError("payload_bits is required without an RS code")
        self.payload_bits = int(payload_bits)

        framed = self.payload_bits + self.crc.w
        coded_in = rs.n * 8 if rs is not None else framed
        if ldpc is not None:
            if coded_in % ldpc.k:
                raise ValueError(
                    f"framed block of {coded_in} bits must divide by the "
                    f"LDPC data size {ldpc.k}; adjust payload_bits")
            self._steps = coded_in // ldpc.k  # LDPC codewords per frame
            wire = self._steps * ldpc.n
        elif polar is not None:
            if coded_in % polar.k:
                raise ValueError(
                    f"framed block of {coded_in} bits must divide by the "
                    f"polar data size {polar.k}; adjust payload_bits")
            self._steps = coded_in // polar.k  # polar codewords per frame
            # a RateMatchedPolar inner code puts E (not N) bits on the
            # wire; plain PolarCode has no .e
            self._polar_wire = getattr(polar, "e", polar.n)
            wire = self._steps * self._polar_wire
        elif turbo is not None:
            if coded_in % turbo.k:
                raise ValueError(
                    f"framed block of {coded_in} bits must divide by the "
                    f"turbo data size {turbo.k}; adjust payload_bits")
            self._steps = coded_in // turbo.k  # turbo codewords per frame
            wire = self._steps * turbo.n
        else:
            steps = coded_in + (self.conv.k - 1)
            if puncturer is not None and steps % puncturer.period:
                raise ValueError(
                    f"conv trellis length {steps} (= frame {coded_in} + "
                    f"{self.conv.k - 1} flush) must divide by the puncture "
                    f"period {puncturer.period}; adjust payload or pattern")
            self._steps = steps
            wire = (puncturer.out_bits(steps) if puncturer is not None
                    else steps * self.conv.n)
        if self.rows and wire % self.rows:
            raise ValueError(
                f"wire length {wire} must divide by interleave_rows="
                f"{self.rows}")
        bps = chain.scheme.bits_per_symbol
        if wire % bps:
            raise ValueError(
                f"wire length {wire} must divide by bits/symbol {bps}")
        self.wire_bits = wire
        self.n_symbols = wire // bps
        if self.conv_window == "auto":
            # production default: windowed truncated-traceback decode
            # (the fused Pallas kernel on TPU backends, the windowed XLA
            # scan elsewhere — both measured faster than the full-block
            # scan at equal BER, BENCH.md FEC table) once the trellis is
            # long enough for the window to pay; short frames and
            # non-conv inner codes keep their existing forms
            self.conv_window = (512 if self.conv is not None
                                and self._steps >= 1024 else None)
        elif self.conv_window is not None:
            self.conv_window = int(self.conv_window)

    # ---- TX ----

    def frame(self, payload: jnp.ndarray) -> jnp.ndarray:
        """``[..., payload_bits]`` -> wire bits ``[..., wire_bits]``."""
        if payload.shape[-1] != self.payload_bits:
            raise ValueError(
                f"expected {self.payload_bits} payload bits, got "
                f"{payload.shape[-1]}")
        x = self.crc.append(payload)
        x, _ = self.scrambler.scramble(
            x, self.scrambler.init_state(x.shape[:-1]))
        if self.rs is not None:
            x = self.rs.encode_bits(x)
        if self.ldpc is not None:
            m = self._steps
            x = x.reshape(x.shape[:-1] + (m, self.ldpc.k))
            x = self.ldpc.encode(x)
            x = x.reshape(x.shape[:-2] + (m * self.ldpc.n,))
        elif self.polar is not None:
            m = self._steps
            x = x.reshape(x.shape[:-1] + (m, self.polar.k))
            x = self.polar.encode(x)
            x = x.reshape(x.shape[:-2] + (m * self._polar_wire,))
        elif self.turbo is not None:
            m = self._steps
            x = x.reshape(x.shape[:-1] + (m, self.turbo.k))
            x = self.turbo.encode(x)
            x = x.reshape(x.shape[:-2] + (m * self.turbo.n,))
        else:
            x = self.conv.encode(x)
            if self.puncturer is not None:
                x = self.puncturer.puncture(x)
        if self.rows:
            x = block_interleave(x, self.rows)
        return x

    def tx(self, payload: jnp.ndarray):
        """Payload bits -> baseband (or passband) waveform via the chain."""
        return self.chain.tx(self.frame(payload))

    def _fused_ok(self) -> bool:
        """Fused kernels on TPU backends, staged elsewhere (the CLI and
        CPU tests run the identical staged math; chains without fused
        forms — e.g. the OFDM adapter — always take their own path)."""
        import jax

        return (jax.default_backend() in ("tpu", "axon")
                and hasattr(self.chain, "tx_fused")
                and hasattr(self.chain, "rx_soft_fused"))

    def tx_fused(self, payload: jnp.ndarray):
        """Like :meth:`tx` but through the chain's fused TX kernel on
        TPU backends (decisions downstream identical; waveform equal up
        to f32 reassociation)."""
        if self._fused_ok():
            return self.chain.tx_fused(self.frame(payload))
        return self.tx(payload)

    # ---- RX ----

    def decode(self, llrs: jnp.ndarray):
        """Wire LLRs ``[..., wire_bits]`` (positive = bit 0) ->
        ``(payload [..., payload_bits], ok [...])``."""
        x = llrs
        if self.rows:
            x = block_deinterleave(x, self.rows)
        if self.ldpc is not None:
            m = self._steps
            x = x.reshape(x.shape[:-1] + (m, self.ldpc.n))
            # production inner-decode config: layered schedule with the
            # device-side syndrome early exit (stops when every codeword
            # in the batch is a valid codeword; equal-BER tested)
            x = self.ldpc.decode(x, iters=self.ldpc_iters,
                                 early_exit=self.ldpc_early_exit,
                                 msg_dtype=self.ldpc_msg_dtype)
            x = x.reshape(x.shape[:-2] + (m * self.ldpc.k,))
        elif self.polar is not None:
            m = self._steps
            x = x.reshape(x.shape[:-1] + (m, self._polar_wire))
            # polar_list: SCL with metric-best winner (the fused Pallas
            # hybrid kernel on TPU at list 8); default SC
            x = (self.polar.decode(x) if self.polar_list is None
                 else self.polar.decode_list(x, self.polar_list))
            x = x.reshape(x.shape[:-2] + (m * self.polar.k,))
        elif self.turbo is not None:
            m = self._steps
            x = x.reshape(x.shape[:-1] + (m, self.turbo.n))
            # production default: decision-stability early termination
            # (identical decisions at convergence — fec/turbo docstring;
            # disable via turbo_early_exit=False for fixed-iteration runs)
            x = self.turbo.decode(x, iters=self.turbo_iters,
                                  early_exit=self.turbo_early_exit)
            x = x.reshape(x.shape[:-2] + (m * self.turbo.k,))
        else:
            if self.puncturer is not None:
                x = self.puncturer.depuncture(x, self._steps)
            if self.conv_window:
                # throughput form: windowed truncated traceback, fused
                # Pallas kernel on TPU backends (ops/pallas_viterbi) —
                # ~5x the full-block scan at equal BER
                x = self.conv.decode_soft_windowed(x, self.conv_window)
            else:
                x = self.conv.decode_soft(x)
        ok = None
        if self.rs is not None:
            x, ok = self.rs.decode_bits(x)
        x, _ = self.scrambler.descramble(
            x, self.scrambler.init_state(x.shape[:-1]))
        payload = x[..., : self.payload_bits]
        crc_ok = self.crc.check(x)
        if ok is not None:
            crc_ok = crc_ok & ok
        return payload, crc_ok

    def rx(self, iq, noise_var: float):
        """Received waveform -> ``(payload, ok)`` via the chain's soft RX."""
        llrs = self.chain.rx_soft(iq, self.n_symbols, noise_var=noise_var)
        return self.decode(llrs)

    def rx_fused(self, iq, noise_var: float):
        """Like :meth:`rx` but through the chain's fused matched-filter
        kernel on TPU backends."""
        if self._fused_ok():
            llrs = self.chain.rx_soft_fused(iq, self.n_symbols,
                                            noise_var=noise_var)
            return self.decode(llrs)
        return self.rx(iq, noise_var)

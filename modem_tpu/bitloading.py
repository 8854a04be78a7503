"""Adaptive bit loading: per-subcarrier constellations from measured SNR.

New capability (the reference modulates one constellation everywhere;
reference repo equivalent: none): on a frequency-selective channel a
single constellation wastes the strong bins and drowns the weak ones.
Every deployed multicarrier system (DSL, 802.11, DVB, 5G CQI/MCS) solves
this with *link adaptation*: measure per-bin SNR, assign each bin the
largest constellation its SNR supports at the target error rate, turn
hopeless bins off. :func:`bit_loading` is the host-side rule (the
gap approximation — ``b_k = log2(1 + SNR_k / gap)`` floored to the
supported sizes); :class:`AdaptiveOfdm` is the modem that carries a
mixed-constellation payload.

TPU shaping — *semi-static loading, static shapes*. Loading changes at
link-adaptation cadence (per negotiation, not per frame), so the per-bin
map is HOST-side configuration, exactly like every other scheme constant
in this package: bins partition into static per-constellation GROUPS,
each group maps/slices/soft-demaps through its own unit-power LUT (the
same gather-free one-hot matmuls as the fixed modem — `ops/slicer`,
`ops/llr`), and group results reassemble with static permutations. No
ragged tensors, no data-dependent shapes, one compiled program per
loading configuration; the per-frame math is identical in cost to the
fixed-constellation modem. Framing (STF/LTF preamble, pilots, CP, delay-
subspace channel estimation, per-symbol CPE/SFO pilot tracking) is the
unmodified :class:`modem_tpu.ofdm.OfdmModem` machinery over the active
bins, so the adaptive modem inherits the whole acquisition story.

LLR convention: per-bin weights ``|H_k|^2 / noise_var`` as everywhere
else; group LUTs are normalized to unit average symbol energy so the
weights stay comparable across constellations (uniform power loading —
the gap rule makes margins approximately equal across bins, the standard
practical choice over exact water-filling).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .models.qam import QAM
from .ofdm import OfdmModem, _default_grid
from .ops.llr import lut_llr
from .ops.slicer import lut_map, lut_slice
from .utils.bits import pack_bits, unpack_symbols

#: constellation sizes the loader may assign (bits per bin)
LEVELS = (0, 1, 2, 4, 6, 8)


def bit_loading(snr_db, gap_db: float = 6.0, levels=LEVELS,
                max_bits: int | None = None):
    """Per-bin SNR (dB) -> per-bin constellation sizes (host-side).

    The gap approximation: a bin supports ``log2(1 + SNR/gap)`` bits at
    the target symbol error rate, where ``gap`` (~6 dB at SER 1e-5 for
    uncoded QAM, less with coding) prices the distance to capacity.
    Rounded DOWN to the largest supported level — the conservative side
    of the target error rate.
    """
    snr = np.asarray(snr_db, np.float64)
    gap = 10.0 ** (gap_db / 10.0)
    b_cont = np.log2(1.0 + (10.0 ** (snr / 10.0)) / gap)
    lv = sorted(levels)
    if max_bits is not None:
        lv = [b for b in lv if b <= max_bits]
    out = np.zeros(snr.shape, np.int64)
    for b in lv:
        out = np.where(b_cont >= b, b, out)
    return tuple(int(x) for x in out)


def _unit_lut(bits: int) -> np.ndarray:
    """Unit-average-energy LUT for a ``bits``-per-symbol constellation
    (BPSK for 1; Gray square QAM otherwise — QPSK is QAM(2))."""
    if bits == 1:
        lut = np.asarray([[1.0, 0.0], [-1.0, 0.0]], np.float32)
    else:
        lut = QAM(bits, 0.0, 1.0, gray=True).lut
    es = float(np.mean(np.sum(lut.astype(np.float64) ** 2, axis=-1)))
    return (lut / np.sqrt(es)).astype(np.float32)


class AdaptiveOfdm:
    """OFDM modem with per-bin constellations from a loading map.

    ``loading``: bits per data bin, aligned with ``data_bins`` (default:
    the standard grid of :class:`~modem_tpu.ofdm.OfdmModem`); 0 turns a
    bin off. Frames are interoperable with the fixed modem's acquisition
    front end (same STF/LTF/pilot structure over the active bins).

    Bit layout per payload symbol: active bins in ``data_bins`` order,
    each contributing its ``loading[k]`` bits consecutively.
    """

    def __init__(self, loading, n_fft: int = 64, cp: int = 16,
                 seed: int = 2016, data_bins=None, pilot_bins=None,
                 **modem_kwargs):
        if data_bins is None or pilot_bins is None:
            dflt_data, dflt_pilot = _default_grid(n_fft)
            data_bins = dflt_data if data_bins is None else tuple(data_bins)
            pilot_bins = (dflt_pilot if pilot_bins is None
                          else tuple(pilot_bins))
        loading = tuple(int(b) for b in loading)
        if len(loading) != len(data_bins):
            raise ValueError(f"loading has {len(loading)} entries for "
                             f"{len(data_bins)} data bins")
        bad = sorted({b for b in loading if b not in LEVELS})
        if bad:
            raise ValueError(f"unsupported constellation sizes {bad}; "
                             f"supported: {LEVELS}")
        active = tuple(b for b, l in zip(data_bins, loading) if l)
        if not active:
            raise ValueError("loading turns every data bin off")
        self.loads = tuple(l for l in loading if l)   # per ACTIVE bin
        self.loading = loading
        # inner modem provides framing/estimation/equalization over the
        # active bins; its own scheme/LUT is never used on this path
        self.m = OfdmModem(QAM(2, 0.0, 1.0), n_fft=n_fft, cp=cp,
                           data_bins=active, pilot_bins=pilot_bins,
                           seed=seed, **modem_kwargs)
        self.bits_per_sym = int(sum(self.loads))      # per payload symbol

        # static per-constellation groups over active-bin positions
        loads = np.asarray(self.loads, np.int64)
        offs = np.concatenate([[0], np.cumsum(loads)])
        self._groups = []
        col_order, bit_order = [], []
        for b in sorted(set(self.loads)):
            cols = np.where(loads == b)[0]
            bit_idx = np.concatenate(
                [np.arange(offs[k], offs[k] + b) for k in cols])
            self._groups.append((b, _unit_lut(b), cols, bit_idx))
            col_order.append(cols)
            bit_order.append(bit_idx)
        self._col_inv = np.argsort(np.concatenate(col_order))
        self._bit_inv = np.argsort(np.concatenate(bit_order))

    # -- geometry ------------------------------------------------------

    @property
    def preamble_len(self) -> int:
        return self.m.preamble_len

    def frame_len(self, n_symbols: int) -> int:
        return self.m.frame_len(n_symbols)

    def bits_per_frame(self, n_symbols: int) -> int:
        return n_symbols * self.bits_per_sym

    # -- TX --------------------------------------------------------------

    def map_bits(self, bits: jnp.ndarray):
        """``[..., S*bits_per_sym]`` bits -> active-bin I/Q ``[..., S, D]``."""
        if bits.shape[-1] % self.bits_per_sym:
            raise ValueError(f"bit count {bits.shape[-1]} must divide by "
                             f"{self.bits_per_sym}")
        s = bits.shape[-1] // self.bits_per_sym
        bt = bits.reshape(bits.shape[:-1] + (s, self.bits_per_sym))
        gi, gq = [], []
        for b, lut, cols, bit_idx in self._groups:
            bg = jnp.take(bt, jnp.asarray(bit_idx), axis=-1)
            syms = pack_bits(bg, b)
            i, q = lut_map(syms, lut)
            gi.append(i)
            gq.append(q)
        inv = jnp.asarray(self._col_inv)
        return (jnp.take(jnp.concatenate(gi, axis=-1), inv, axis=-1),
                jnp.take(jnp.concatenate(gq, axis=-1), inv, axis=-1))

    def tx_frame(self, bits: jnp.ndarray):
        """Bits -> full frame (STF + LTF + mixed-constellation payload)."""
        m = self.m
        xi, xq = m._payload_td(*self.map_bits(bits))
        pi, pq = m._add_cp(xi, xq, m.cp)
        hi = jnp.broadcast_to(jnp.asarray(m._preamble_i),
                              pi.shape[:-1] + (m._preamble_i.size,))
        hq = jnp.broadcast_to(jnp.asarray(m._preamble_q),
                              pq.shape[:-1] + (m._preamble_q.size,))
        return (jnp.concatenate([hi, pi], axis=-1),
                jnp.concatenate([hq, pq], axis=-1))

    # -- RX --------------------------------------------------------------

    def _demap(self, di, dq, m2, noise_var, soft: bool):
        outs = []
        for b, lut, cols, bit_idx in self._groups:
            ci = jnp.take(di, jnp.asarray(cols), axis=-1)
            cq = jnp.take(dq, jnp.asarray(cols), axis=-1)
            if soft:
                llr = lut_llr(ci, cq, lut, b, 1.0)       # [..., S, |g|*b]
                w = jnp.take(m2, jnp.asarray(cols), axis=-1)  # [..., |g|]
                w = jnp.repeat(w / jnp.float32(noise_var), b, axis=-1,
                               total_repeat_length=len(cols) * b)
                outs.append(llr * w[..., None, :])
            else:
                syms = lut_slice(ci, cq, lut)
                outs.append(unpack_symbols(syms, b))     # [..., S, |g|*b]
        inv = jnp.asarray(self._bit_inv)
        out = jnp.take(jnp.concatenate(outs, axis=-1), inv, axis=-1)
        return out.reshape(out.shape[:-2] + (-1,))

    def rx_frame(self, i: jnp.ndarray, q: jnp.ndarray,
                 n_symbols: int) -> jnp.ndarray:
        """Frame-aligned stream -> hard bits ``[..., S*bits_per_sym]``."""
        m = self.m
        off = m.sym_len
        nl = m.n_ltf * m.sym_len
        h = m.estimate_channel(i[..., off:off + nl], q[..., off:off + nl])
        off += nl
        di, dq, m2 = m._equalize(i[..., off:], q[..., off:], n_symbols, h)
        return self._demap(di, dq, m2, 1.0, soft=False)

    def rx_soft_frame(self, i: jnp.ndarray, q: jnp.ndarray,
                      n_symbols: int, noise_var: float = 1.0):
        """Frame-aligned stream -> |H|^2/noise-weighted max-log LLRs."""
        m = self.m
        off = m.sym_len
        nl = m.n_ltf * m.sym_len
        h = m.estimate_channel(i[..., off:off + nl], q[..., off:off + nl])
        off += nl
        di, dq, m2 = m._equalize(i[..., off:], q[..., off:], n_symbols, h)
        return self._demap(di, dq, m2, noise_var, soft=True)

    def as_link_chain(self):
        """Chain-protocol adapter: :class:`modem_tpu.link.FramedLink`
        (CRC/scramble/FEC framing) over the loaded PHY — one "symbol" =
        one mixed-constellation OFDM symbol of ``bits_per_sym`` bits."""
        return _AdaptiveChain(self)


class _LoadedSchemeShim:
    def __init__(self, bits_per_symbol: int):
        self.bits_per_symbol = bits_per_symbol


class _AdaptiveChain:
    def __init__(self, modem: AdaptiveOfdm):
        self.modem = modem
        self.scheme = _LoadedSchemeShim(modem.bits_per_sym)

    def tx(self, bits: jnp.ndarray):
        return self.modem.tx_frame(bits)

    def rx_soft(self, iq, n_symbols: int,
                noise_var: float = 1.0) -> jnp.ndarray:
        i, q = iq
        return self.modem.rx_soft_frame(i, q, n_symbols,
                                        noise_var=noise_var)

    def rx(self, iq, n_symbols: int) -> jnp.ndarray:
        i, q = iq
        return self.modem.rx_frame(i, q, n_symbols)

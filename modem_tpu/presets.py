"""Production presets: one-call constructors for complete, standard-shaped
link configurations.

Every piece here exists elsewhere in the framework; a preset only fixes the
composition and the size coupling (payload/CRC/code-block/interleaver/
OFDM-symbol arithmetic) that a deployment would otherwise re-derive. Each
returns ready objects with the operating point documented and tested
(``tests/test_presets.py`` roundtrips each preset at its design SNR).

These are *standard-shaped*, not standard-conformant: grids, codes, and
rates follow well-known systems (802.11-style OFDM grid, DVB-style
RS+interleaver+scrambler, CCSDS-style concatenated deep-space coding, GSM's
GMSK BT=0.3) so the configurations are recognizable and well-conditioned,
but no bit-exact interop with those standards is claimed — the reference
(`/root/reference`) defines the interop surface this framework reproduces,
and it has none of these.
"""

from __future__ import annotations

from .config import Rates
from .chain import PulseShapedChain, qpsk_reference_chain
from .fec import (
    Puncturer, QcLdpc, RateMatchedPolar, TurboCode, ccsds_code,
    rate34_pattern, rs_255_223, rs_dvb)
from .gmsk import GmskChain
from .link import FramedLink
from .models import make_scheme
from .ofdm import OfdmChain, OfdmModem, OfdmStreamReceiver

#: The reference binaries' operating point (`modulate.rs` / `demodulate.rs`
#: defaults): 10 kHz sample rate, 1250 baud.
REFERENCE_RATES = Rates(baud_rate=1250, sample_rate=10000)


def reference_link(payload_bits: int = 1002) -> FramedLink:
    """The reference flagship chain (QPSK + RRC matched filter) wrapped in
    the production framing stack (CRC-16 + scrambler + conv K=7 +
    interleaver). Error-free from about -4 dB SNR per complex sample
    (rate-1/2 coding gain below the uncoded cliff)."""
    return FramedLink(qpsk_reference_chain(REFERENCE_RATES),
                      payload_bits=payload_bits)


def wifi_like_ofdm_link(n_ldpc_blocks: int = 8,
                        ldpc_iters: int = 20) -> FramedLink:
    """802.11-shaped OFDM link: 64-FFT / 52-used-bin grid, QPSK bins,
    pilot CPE tracking, QC-LDPC(648,324) inner code, CRC-16 verdicts.
    ``n_ldpc_blocks`` codewords per frame (8 -> 54 OFDM symbols, 5184
    wire bits). Decode with ``link.rx((i, q), noise_var)`` on
    frame-aligned waveforms, or acquire first (:func:`burst_ofdm_receiver`
    locates frames blindly)."""
    code = QcLdpc()
    modem = OfdmModem(make_scheme("qpsk", REFERENCE_RATES))
    return FramedLink(OfdmChain(modem),
                      payload_bits=n_ldpc_blocks * code.k - 16,
                      ldpc=code, ldpc_iters=ldpc_iters)


def dvb_like_link(rate34: bool = True) -> FramedLink:
    """DVB-shaped concatenated link over the QPSK chain: RS(204,188)
    shortened outer code, convolutional K=7 inner code (punctured to 3/4
    by default), DVB additive scrambler, block interleaver. Payload is
    the RS payload (1504 bits = 188 bytes) minus the CRC."""
    return FramedLink(
        qpsk_reference_chain(REFERENCE_RATES),
        rs=rs_dvb(),
        puncturer=Puncturer(rate34_pattern()) if rate34 else None,
        interleave_rows=12,
    )


def ccsds_deep_space_link() -> FramedLink:
    """CCSDS-shaped deep-space concatenated coding: RS(255,223) outer,
    conv K=7 rate-1/2 inner, interleaved — the classic arrangement for
    power-limited links. Error-free from about 0 dB SNR per complex
    sample over the QPSK chain."""
    return FramedLink(
        qpsk_reference_chain(REFERENCE_RATES),
        rs=rs_255_223(),
        conv=ccsds_code(),
        interleave_rows=12,  # wire = (255*8 + 6 flush) * 2 = 4092 bits
    )


def lte_like_turbo_link(turbo_iters: int = 6) -> FramedLink:
    """LTE-shaped data link over the QPSK chain: K=1024 turbo inner code
    (RSC pair + QPP interleaver, max-log BCJR), CRC-16 verdicts, block
    interleaver. Payload 1008 bits per frame; wire = 3084 coded bits =
    1542 QPSK symbols. Error-free from about -6 dB SNR per complex
    sample (rate ~1/3 + matched-filter gain)."""
    code = TurboCode(1024)
    return FramedLink(qpsk_reference_chain(REFERENCE_RATES),
                      payload_bits=code.k - 16, turbo=code,
                      turbo_iters=turbo_iters,
                      interleave_rows=12)  # 3084 = 12 * 257


def nr_like_control_link(list_size: int = 8) -> FramedLink:
    """NR-control-shaped link over the QPSK chain: rate-matched polar
    inner code (N=256 mother SHORTENED to E=180, rate 0.56 — the
    5G-style arbitrary coded length, `fec/polar.RateMatchedPolar`) with
    per-codeword metric-best SCL (the fused Pallas hybrid kernel on TPU
    at list 8), frame CRC-16 verdicts. Payload 384 bits per frame; wire
    = 720 coded bits = 360 QPSK symbols. Error-free from about 1 dB SNR
    per complex sample (see examples/control_channel.py for the
    CRC-aided blind-decode arrangement)."""
    code = RateMatchedPolar(100, 180, n=256)
    return FramedLink(qpsk_reference_chain(REFERENCE_RATES),
                      payload_bits=4 * code.k - 16, polar=code,
                      polar_list=list_size)


def mimo_ofdm_link(ldpc_iters: int = 30) -> FramedLink:
    """2x2 spatially-multiplexed OFDM link: 26 QC-LDPC(648,324)
    codewords fill 81 MIMO slots exactly (one slot carries 2 streams x
    52 bins x 2 bits = 208 coded bits) — the rate-doubled counterpart of
    :func:`wifi_like_ofdm_link`. TX returns two antenna waveforms; RX
    takes ``(i1, q1, i2, q2)`` frame-aligned captures. Error-free from
    about 12 dB per-antenna SNR through a heavily cross-coupled 2x2
    channel (stream separation genuinely spends SNR; the SISO wifi link
    runs at 8 dB)."""
    from .mimo import MimoOfdm

    code = QcLdpc()
    mm = MimoOfdm(make_scheme("qpsk", REFERENCE_RATES))
    return FramedLink(mm.as_link_chain(),
                      payload_bits=26 * code.k - 16,
                      ldpc=code, ldpc_iters=ldpc_iters,
                      interleave_rows=16)


def gsm_like_gmsk(rates: Rates | None = None) -> GmskChain:
    """GSM's modulation: GMSK at BT = 0.3 (integer-exact phase backbone,
    drift-free unbounded streams, discriminator RX with soft LLRs)."""
    return GmskChain(rates or REFERENCE_RATES, bt=0.3)


def qam16_gray_chain(rates: Rates | None = None) -> PulseShapedChain:
    """Gray-mapped 16-QAM over the RRC matched-filter chain — the
    bandwidth-efficient single-carrier point (4 bits/symbol, gray BER a
    4/3 flip-factor below the reference's natural-binary map)."""
    from .models.qam import QAM

    return PulseShapedChain(QAM(4, 0.0, 6.0, gray=True),
                            rates or REFERENCE_RATES)


def burst_ofdm_receiver(n_symbols: int = 54,
                        threshold: float = 0.6) -> OfdmStreamReceiver:
    """Continuous blind burst receiver matched to
    :func:`wifi_like_ofdm_link`'s default frame geometry (54 payload
    symbols): push unbounded chunked sample streams, get located frames.
    Feed each frame's payload to the link's decoder."""
    modem = OfdmModem(make_scheme("qpsk", REFERENCE_RATES))
    return OfdmStreamReceiver(modem, n_symbols, threshold=threshold)

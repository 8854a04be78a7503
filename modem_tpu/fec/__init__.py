"""Forward error correction: the layer downstream of the soft-output RX.

The reference stops at soft I/Q (`demodulate.rs:41-43`); this package
completes the production path bits -> encode -> interleave -> modem ->
LLRs (:mod:`modem_tpu.ops.llr`) -> deinterleave -> Viterbi -> bits, all as
jit/vmap/shard-friendly block transforms (see :mod:`modem_tpu.fec.conv` for
the TPU shaping of the trellis recursions).
"""

from .bch import Bch, bch_255_191, bch_255_239
from .conv import ConvCode, StreamingViterbi, ccsds_code
from .crc import Crc, crc16_ccitt, crc32_mpeg2
from .interleave import block_deinterleave, block_interleave
from .ldpc import QcLdpc
from .polar import PolarCode, RateMatchedPolar
from .puncture import Puncturer, rate23_pattern, rate34_pattern
from .rs import ReedSolomon, rs_255_223, rs_dvb
from .scramble import Scrambler, dvb_scrambler, ieee80211_scrambler
from .turbo import TurboCode

__all__ = [
    "Bch", "ConvCode", "Crc", "PolarCode", "Puncturer", "QcLdpc",
    "RateMatchedPolar", "ReedSolomon",
    "Scrambler",
    "StreamingViterbi", "TurboCode", "block_deinterleave",
    "bch_255_191", "bch_255_239",
    "block_interleave", "ccsds_code", "crc16_ccitt", "crc32_mpeg2",
    "dvb_scrambler", "ieee80211_scrambler", "rate23_pattern",
    "rate34_pattern", "rs_255_223", "rs_dvb",
]

"""modem_tpu: a TPU-native modem signal-chain framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust
reference ``ramtej/rust-modem`` (see SURVEY.md): 13 digital modulation schemes,
NCO carrier + I/Q mixing, FIR filtering, PLL acquisition and coherent
demodulation — extended with RRC pulse shaping, matched filtering, resampling,
hard/soft slicing, BER harnesses, fused Pallas chain kernels, and
multi-device sharding, processed as jitted block transforms over batched
HBM-resident tensors.
"""

from .config import Freq, Rates
from .models import SCHEME_NAMES, make_scheme
from .tx import Modulator, TxState
from .rx import Demodulator, RxState
from .chain import (
    DcqpskChain, DifferentialChain, FskChain, MskChain, OqpskChain,
    PulseShapedChain, qpsk_reference_chain,
)
from .dsss import DsssChain
from .fhss import FhssModem
from .gmsk import GmskChain
from .metrics import LinkStats
from .streaming import StreamingFusedChain
from .sync import AcquiringReceiver
from .link import FramedLink
from .bitloading import AdaptiveOfdm, bit_loading
from .ofdm import OfdmChain, OfdmModem, OfdmStreamReceiver
from . import presets
from .scfde import ScFdeChain, ScFdeModem
from .stbc import AlamoutiOfdm
from .mimo import MimoOfdm, MimoOfdmN
from .ops.channelizer import Channelizer
from .wideband import WidebandModem

__all__ = [
    "AcquiringReceiver", "AlamoutiOfdm", "Channelizer", "DcqpskChain",
    "Demodulator",
    "DifferentialChain", "DsssChain",
    "FhssModem", "FramedLink", "Freq", "FskChain", "GmskChain", "LinkStats",
    "MimoOfdm", "MimoOfdmN", "Modulator", "MskChain",
    "AdaptiveOfdm", "bit_loading",
    "OfdmChain", "OfdmModem", "OfdmStreamReceiver", "OqpskChain",
    "PulseShapedChain", "Rates", "RxState", "SCHEME_NAMES",
    "ScFdeChain", "ScFdeModem", "presets",
    "StreamingFusedChain", "TxState", "WidebandModem", "make_scheme",
    "qpsk_reference_chain",
]

__version__ = "0.2.0"

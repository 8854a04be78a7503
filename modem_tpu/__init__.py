"""modem_tpu: a TPU-native modem signal-chain framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust
reference ``ramtej/rust-modem`` (see SURVEY.md): 13 digital modulation schemes,
NCO carrier + I/Q mixing, FIR filtering, PLL acquisition and coherent
demodulation — extended with RRC pulse shaping, matched filtering, resampling,
hard-decision slicing, BER harnesses, and multi-device sharding, processed as
jitted block transforms over batched HBM-resident tensors.
"""

from .config import Freq, Rates
from .models import SCHEME_NAMES, make_scheme
from .tx import Modulator, TxState

__all__ = [
    "Freq", "Rates", "SCHEME_NAMES", "make_scheme", "Modulator", "TxState",
]

__version__ = "0.1.0"

"""Complete burst link: FEC + burst TX -> dirty channel -> acquisition -> FEC.

Ties together the round-2 subsystems on one over-the-air story (the
reference stops at soft I/Q text, `demodulate.rs:41-43`; everything here is
the capability BASELINE.md mandates around it):

    data bits
      -> convolutional encode (CCSDS K=7, rate 1/2)  fec/conv.py
      -> block interleave                            fec/interleave.py
      -> preamble + QPSK RRC burst                   sync.AcquiringReceiver.tx_burst
      -> channel: fractional delay + CFO + phase/gain + AWGN
                                                     ops/impairments.py, ops/channel.py
      -> blind acquisition (timing/frame/CFO/phase/gain)
                                                     sync.AcquiringReceiver.acquire
      -> per-bit max-log LLRs (noise var estimated from the preamble)
                                                     ops/llr.lut_llr
      -> deinterleave -> Viterbi (soft)              fec/conv.py
      -> data bits

Run: python examples/burst_modem.py          (TPU or CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.fec import block_deinterleave, block_interleave, ccsds_code
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import (
    apply_cfo, apply_gain_phase, apply_static_delay,
)
from modem_tpu.ops.llr import lut_llr
from modem_tpu.ops.slicer import lut_slice
from modem_tpu.sync import AcquiringReceiver

RATES = Rates(baud_rate=1250, sample_rate=10000)
PREAMBLE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                     3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def main():
    code = ccsds_code()
    chain = qpsk_reference_chain(RATES)
    rxr = AcquiringReceiver(chain, PREAMBLE, max_lag=200)
    rng = np.random.default_rng(7)

    # ---- transmit side -------------------------------------------------
    n_data = 502  # info bits; coded (n+6 tail)*2 -> 508 QPSK payload symbols
    data = jnp.asarray(rng.integers(0, 2, (n_data,)), jnp.int32)
    coded = block_interleave(code.encode(data), rows=8)
    n_payload = coded.shape[-1] // chain.scheme.bits_per_symbol
    i, q = rxr.tx_burst(coded)

    # ---- the channel is unkind ----------------------------------------
    snr_db = 3.0  # per waveform sample; +9 dB matched-filter gain follows
    i, q = apply_static_delay(i, q, mu=0.41)       # +31.41 samples
    i, q = apply_cfo(i, q, cfo_hz=11.0, sample_rate=RATES.sample_rate,
                     phase0=2.2)
    i, q = apply_gain_phase(i, q, gain=0.73, phase=0.0)
    i, q = awgn(jax.random.key(3), i, q, snr_db=snr_db)

    # ---- receive side --------------------------------------------------
    (ri, rq), report = rxr.acquire(i, q, n_payload)
    print("sync report:")
    print(f"  frame lag      : {int(report['lag'])} samples")
    print(f"  CFO estimate   : "
          f"{float(report['cfo_rad_per_symbol']) * RATES.baud_rate / (2 * np.pi):+.2f} Hz"
          f"  (true +11.00 Hz)")
    print(f"  gain estimate  : {float(report['gain']):.3f}  (true 0.730)")

    # Noise variance at the decision point, estimated from the payload
    # residuals against the sliced constellation (a decision-directed
    # estimate a deployed receiver can actually compute).
    syms = lut_slice(ri, rq, chain.lut)
    ref = jnp.asarray(chain.lut)[syms]
    resid = jnp.stack([ri, rq], -1) - ref
    nv = float(jnp.mean(jnp.sum(resid * resid, -1)) / 2.0)
    print(f"  est. N0/2      : {nv:.4f}")

    llr = lut_llr(ri, rq, chain.lut, chain.scheme.bits_per_symbol,
                  noise_var=nv)
    decoded = code.decode_soft(block_deinterleave(llr, rows=8))

    hard = (llr < 0).astype(jnp.int32)
    pre_fec = int(jnp.sum(hard != coded))
    post_fec = int(jnp.sum(decoded != data))
    print(f"channel bit errors (pre-FEC) : {pre_fec}/{coded.size} "
          f"({pre_fec / coded.size:.3%})")
    print(f"data bit errors (post-FEC)   : {post_fec}/{data.size}")
    if post_fec == 0:
        print("burst recovered exactly.")


if __name__ == "__main__":
    main()

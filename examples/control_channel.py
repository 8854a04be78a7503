"""5G-control-style link: rate-matched polar + CRC-aided SCL-8.

Control channels are the native habitat of polar codes: short payloads,
awkward coded lengths, CRC-gated blind decoding. The round-4 pieces in
one flow:

    384-bit frame payload (+frame CRC-16)
      -> rate-matched polar: N=256 mother code SHORTENED to E=180
         (rate 0.56 > 7/16, structural zero-tail)   fec/polar.py
      -> framed QPSK burst over the flagship chain  link.FramedLink
      -> AWGN
      -> soft demod -> LLR de-match (known-bit tail)
      -> SCL-8 per codeword (polar_list=8): metric-best path — the
         fused Pallas hybrid kernel on TPU, the traced XLA tree on
         CPU, bit-identical either way              ops/pallas_scl.py
      -> frame CRC-16 verdict over the reassembled payload

The second section is the CRC-AIDED arrangement (CRC inside the polar
payload steering the list winner, `decode_list(crc=...)`), shown on the
property that makes it deployable: fed pure noise (blind decode of a
grant that was never sent), the CRC verdict rejects ~all frames
(false-alarm rate ~2^-16 per list path).

Run: python examples/control_channel.py          (TPU or CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import qpsk_reference_chain
from modem_tpu.fec import RateMatchedPolar, crc16_ccitt
from modem_tpu.link import FramedLink
from modem_tpu.ops.channel import awgn

SNR_DB = 1.0
N_BURSTS = 64


def main():
    print(f"devices: {jax.devices()}")
    code = RateMatchedPolar(100, 180, n=256)
    assert code.mode == "shorten"
    print(f"polar mother N={code.n}, K={code.k}, wire E={code.e} "
          f"({code.mode}): rate {code.k / code.e:.2f}")

    # FramedLink couples the sizes: 4 codewords/frame, CRC-16 outer
    link = FramedLink(qpsk_reference_chain(Rates(1250, 10000)),
                      payload_bits=4 * code.k - 16, polar=code,
                      polar_list=8)
    print(f"frame: {link.payload_bits} payload bits -> "
          f"{link.wire_bits} wire bits ({link.n_symbols} QPSK symbols)")

    rng = np.random.default_rng(0)
    payload = jnp.asarray(
        rng.integers(0, 2, (N_BURSTS, link.payload_bits)), jnp.int32)
    i, q = link.tx(payload)
    noise_var = 10.0 ** (-SNR_DB / 10.0)
    ci, cq = awgn(jax.random.key(1), i, q, SNR_DB)
    got, ok = link.rx((ci, cq), noise_var=noise_var)
    errs = int(jnp.sum(got != payload))
    print(f"{N_BURSTS} bursts @ {SNR_DB:.0f} dB SNR: "
          f"{errs} payload bit errors, CRC verdicts true: "
          f"{int(jnp.sum(ok))}/{N_BURSTS}")
    assert errs == 0 and bool(ok.all())

    # Blind-decode false-alarm control: CA-SCL-8 on pure noise. The
    # decoder always returns SOME path; the CRC is what says "no grant".
    crc = crc16_ccitt()
    noise_llr = jnp.asarray(rng.normal(0, 2.0, (512, code.e)), jnp.float32)
    blind = code.decode_list(noise_llr, 8, crc=crc)
    false_alarms = int(jnp.sum(crc.check(blind)))
    print(f"blind decode of 512 noise-only frames: "
          f"{false_alarms} CRC false alarms")
    assert false_alarms <= 2  # ~8 * 512 * 2^-16 expected

    print("ok")


if __name__ == "__main__":
    main()

"""OFDM + LDPC over a frequency-selective channel, blind-acquired.

The round-2 multicarrier story: where the single-carrier chains fight a
dispersive channel with an LMMSE equalizer (examples/burst_modem.py),
OFDM turns it into one complex gain per subcarrier — and the bins a fade
crushes are exactly where channel-weighted LLRs + LDPC earn their keep:

    data bits
      -> QC-LDPC encode (IRA rate 1/2)              fec/ldpc.py
      -> OFDM frame (48 QPSK bins, 4 pilots, STF/LTF preamble)
                                                    ofdm.OfdmModem.tx_frame
      -> channel: unknown delay + CFO + gain/phase + deep-fade multipath
         + AWGN                                     ops/impairments.py
      -> blind acquisition (Schmidl&Cox coarse timing + closed-form CFO,
         full-preamble fine timing)                 ofdm.OfdmModem.acquire_soft
      -> LS channel estimate (LTFs), one-tap equalizer, pilot CPE
      -> |H|^2-weighted LLRs                        (same call)
      -> min-sum decode                             fec/ldpc.py
      -> data bits

Run: python examples/ofdm_link.py          (TPU or CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from modem_tpu import OfdmModem, Rates, make_scheme
from modem_tpu.fec import QcLdpc
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import apply_cfo, apply_gain_phase, \
    multipath_fir

RATES = Rates(baud_rate=1250, sample_rate=10000)
SNR_DB = 16.0
CHANNELS = 8

# ~-21 dB spectral null inside the band: hard decisions on the faded bins
# fail at this SNR; the weighted-LLR + LDPC path is exact.
CH_I = np.array([0.9, 0.0, 0.25, 0.0, -0.1], np.float32)
CH_Q = np.array([0.1, -0.3, 0.0, 0.12, 0.05], np.float32)


def main():
    modem = OfdmModem(make_scheme("qpsk", RATES))
    code = QcLdpc()  # (648, 324)
    n_sym = 27  # 27 * 96 coded bits/frame = 4 LDPC codewords
    n_cw = modem.bits_per_frame(n_sym) // code.n
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.integers(0, 2, (CHANNELS, n_cw, code.k)), jnp.int32)
    coded = code.encode(data).reshape(CHANNELS, -1)

    i, q = modem.tx_frame(coded)
    gap = jnp.zeros((CHANNELS, 41), jnp.float32)
    ci = jnp.concatenate([gap, i], -1)
    cq = jnp.concatenate([gap, q], -1)
    ci, cq = multipath_fir(ci, cq, CH_I, CH_Q)
    ci, cq = apply_cfo(ci, cq, cfo_hz=0.8 / 64.0, sample_rate=1)
    ci, cq = apply_gain_phase(ci, cq, gain=1.3, phase=2.1)
    p = float(jnp.mean(i * i + q * q))
    ci, cq = awgn(jax.random.PRNGKey(1), ci, cq, SNR_DB,
                  signal_power=p)
    nv = p / (2.0 * 10.0 ** (SNR_DB / 10.0))

    # ONE blind front-end pass; hard bits, channel estimate, and LLRs
    # all read from the located frame
    fi, fq, rep = modem.locate_frame(ci, cq, n_sym, max_lag=96)
    off = modem.sym_len
    h = modem.estimate_channel(fi[..., off:modem.preamble_len],
                               fq[..., off:modem.preamble_len])
    hard = modem.rx_payload(fi[..., modem.preamble_len:],
                            fq[..., modem.preamble_len:], n_sym, h)
    llr = modem.rx_soft_payload(fi[..., modem.preamble_len:],
                                fq[..., modem.preamble_len:], n_sym, h,
                                noise_var=nv)
    dec = code.decode(llr.reshape(CHANNELS, n_cw, code.n), iters=40)
    hard_errs = int(jnp.sum(hard != coded))
    coded_errs = int(jnp.sum(dec != data))
    hi, hq = h
    m2 = np.asarray(hi * hi + hq * hq)
    print(f"located starts: {np.asarray(rep['start'])} (gap was 41)")
    print(f"CFO est: {float(rep['cfo_rad_per_sample'][0]):.5f} rad/sample "
          f"(true {0.8 * 2 * np.pi / 64:.5f})")
    print(f"channel |H|^2 across bins: min {m2.min():.4f} "
          f"max {m2.max():.4f} (deep fade)")
    print(f"hard wire-bit errors: {hard_errs} / {coded.size} "
          f"(the fade bites)")
    print(f"LDPC-decoded data errors: {coded_errs} / {data.size}")
    assert coded_errs == 0


if __name__ == "__main__":
    main()

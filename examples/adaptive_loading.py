"""Link adaptation: probe the channel, load the bins, carry more bits.

The round-4 story: a fixed constellation prices every subcarrier at the
weakest bin's rate. Adaptive bit loading measures per-bin SNR and gives
each bin the largest constellation it supports — strong bins carry
64-QAM while faded bins drop to BPSK or switch off:

    sounding frame (known bits, any loading)     bitloading.AdaptiveOfdm
      -> channel: multipath + AWGN               ops/impairments.py
      -> LS channel estimate -> per-bin SNR      ofdm.OfdmModem machinery
      -> gap-rule loading map (host, semi-static)    bitloading.bit_loading
      -> adaptive frames at the loaded rate      AdaptiveOfdm.tx/rx_frame

The demo prints the loading map, the rate vs fixed QPSK-everywhere, and
verifies the loaded payload decodes error-free at the design SNR while a
fixed 64-QAM-everywhere frame fails on the faded bins.

Run: python examples/adaptive_loading.py       (TPU or CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from modem_tpu import AdaptiveOfdm, bit_loading
from modem_tpu.ofdm import _default_grid
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import multipath_fir

SNR_DB = 24.0
N_SYM = 16
N_FFT = 64

# Frequency-selective channel with both strong and deeply faded regions.
CH_I = np.array([0.75, 0.0, 0.0, 0.5, 0.0, 0.0, 0.3], np.float32)
CH_Q = np.array([0.0, 0.3, 0.0, 0.0, -0.35, 0.0, 0.0], np.float32)


def per_bin_snr_db(data_bins, snr_db):
    k = np.asarray(data_bins, np.float64)
    taps = CH_I + 1j * CH_Q
    h = np.sum(taps * np.exp(-2j * np.pi * np.arange(len(taps))
                             * k[:, None] / N_FFT), axis=-1)
    return snr_db + 20.0 * np.log10(np.abs(h))


def run_frame(mm, seed):
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(
        rng.integers(0, 2, (4, mm.bits_per_frame(N_SYM))), jnp.int32)
    i, q = mm.tx_frame(bits)
    ci, cq = multipath_fir(i, q, CH_I, CH_Q)
    ci, cq = awgn(jax.random.key(seed), ci, cq, SNR_DB)
    got = mm.rx_frame(ci, cq, N_SYM)
    errs = int((np.asarray(got) != np.asarray(bits)).sum())
    return errs, int(np.asarray(bits).size)


def main():
    data, _ = _default_grid(N_FFT)
    snr = per_bin_snr_db(data, SNR_DB)
    loading = bit_loading(snr, gap_db=8.0, max_bits=6)
    print("per-bin loading:",
          "".join(str(b) for b in loading),
          f"({sum(loading)} bits/symbol vs {2 * len(data)} for fixed QPSK,"
          f" {sum(1 for b in loading if not b)} bins off)")

    errs, total = run_frame(AdaptiveOfdm(loading), seed=0)
    print(f"adaptive loading : {errs}/{total} bit errors")
    # the 8 dB gap rule designs for BER ~1e-4, so a single noise
    # realization of ~13k bits may legitimately contain a stray error
    # (platform numerics shift which realization you get); the contrast
    # with fixed 64-QAM (hundreds of errors on the faded bins) is the
    # demonstration
    assert errs <= 3, f"adaptive frame far off its design BER: {errs}"

    errs6, total6 = run_frame(AdaptiveOfdm((6,) * len(data)), seed=1)
    print(f"fixed 64-QAM     : {errs6}/{total6} bit errors "
          "(faded bins fail, as expected)")
    assert errs6 > 100 * max(errs, 1), \
        "fixed 64-QAM should fail hard on the faded bins"

    rate_gain = sum(loading) / (2 * len(data))
    print(f"rate vs fixed QPSK-everywhere: {rate_gain:.2f}x at design BER")


if __name__ == "__main__":
    main()

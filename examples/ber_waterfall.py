"""BER waterfall on hardware: QPSK and 16-QAM vs Es/N0, measured vs theory.

Runs the fused on-chip Monte-Carlo harness (TPU required — the Pallas PRNG
has no CPU lowering):

    python examples/ber_waterfall.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modem_tpu import Rates
from modem_tpu.chain import PulseShapedChain, qpsk_reference_chain
from modem_tpu.harness import ber_waterfall, mqam_ber_theory, qpsk_ber_theory
from modem_tpu.models.qam import QAM


def main():
    rates = Rates(baud_rate=1250, sample_rate=10000)
    configs = [
        ("QPSK", qpsk_reference_chain(rates), qpsk_ber_theory,
         [4.0, 6.0, 8.0, 10.0]),
        ("16-QAM", PulseShapedChain(QAM(4, 0.0, 2.0), rates),
         lambda s: mqam_ber_theory(s, 16), [12.0, 14.0, 16.0, 18.0]),
    ]
    for name, chain, theory, snrs in configs:
        print(f"\n{name}  (Es/N0 dB, measured BER, theory BER)")
        for pt in ber_waterfall(chain, snrs, n_symbols=4096, channels=64):
            print(f"  {pt.snr_db:5.1f}  {pt.ber:.6f}  {theory(pt.snr_db):.6f}")

    # FSK family through the fused discriminator kernel (per-sample SNR;
    # noncoherent discriminator detection has no tidy closed form).
    import numpy as np
    import jax.numpy as jnp
    from modem_tpu import make_scheme
    from modem_tpu.ops.pallas_fsk import fused_fsk_chain

    scheme = make_scheme("mfsk", rates)
    rng = np.random.default_rng(0)
    syms = jnp.asarray(rng.integers(0, 16, (64, 4096)), jnp.int32)
    print("\n16-MFSK discriminator  (per-sample SNR dB, measured SER)")
    for snr in (14.0, 18.0, 22.0, 26.0):
        dec = fused_fsk_chain(syms, scheme, rates, snr_db=snr, seed=int(snr))
        ser = float((np.asarray(dec) != np.asarray(syms)).mean())
        print(f"  {snr:5.1f}  {ser:.6f}")


if __name__ == "__main__":
    sys.exit(main())

"""BER harness validation: Monte-Carlo points vs closed-form theory.

Runs everywhere: on TPU the fused kernel draws noise with the on-core PRNG;
off-TPU (Pallas interpret mode) the identical kernel logic draws from a
counter-hash stream (`pallas_chain._gauss_pair(interpret=True)`), so the
sigma calibration and Box-Muller path are validated in the default CPU suite
too. Run with MODEM_TPU_TEST_PLATFORM=axon for the hardware-PRNG variant."""

import numpy as np
import jax

from modem_tpu import Rates
from modem_tpu.chain import PulseShapedChain, qpsk_reference_chain
from modem_tpu.harness import (
    ber_waterfall, fused_ber_point, mqam_ber_theory, qpsk_ber_theory,
)
from modem_tpu.models.qam import QAM

RATES = Rates(baud_rate=1250, sample_rate=10000)

class TestFusedBer:
    def test_qpsk_matches_theory(self):
        chain = qpsk_reference_chain(RATES)
        pt = fused_ber_point(chain, snr_db=7.0, n_symbols=4096, channels=64)
        theory = qpsk_ber_theory(7.0)
        assert 0.85 * theory < pt.ber < 1.15 * theory

    def test_qam16_matches_theory(self):
        chain = PulseShapedChain(QAM(4, 0.0, 2.0), RATES)
        pt = fused_ber_point(chain, snr_db=14.0, n_symbols=4096, channels=64)
        theory = mqam_ber_theory(14.0, 16)
        assert 0.7 * theory < pt.ber < 1.3 * theory

    def test_waterfall_monotone(self):
        chain = qpsk_reference_chain(RATES)
        pts = ber_waterfall(chain, [4.0, 7.0, 10.0], n_symbols=2048,
                            channels=32)
        bers = [p.ber for p in pts]
        assert bers[0] > bers[1] > bers[2]

    def test_noiseless_exact(self):
        chain = qpsk_reference_chain(RATES)
        import jax.numpy as jnp
        from modem_tpu.ops.pallas_chain import fused_pulse_chain

        rng = np.random.default_rng(0)
        syms = jnp.asarray(rng.integers(0, 4, (8, 512)), jnp.int32)
        dec = fused_pulse_chain(syms, chain.lut, np.asarray(chain.rrc),
                                chain.sps, chain.span)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(syms))

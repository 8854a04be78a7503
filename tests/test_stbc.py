"""Alamouti 2x1 STBC over OFDM (modem_tpu/stbc.py): combining algebra,
diversity against spectral nulls, and LLR weighting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import OfdmModem, Rates, make_scheme
from modem_tpu.ofdm import _default_grid
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import apply_gain_phase, multipath_fir
from modem_tpu.ops.llr import llr_hard_bits
from modem_tpu.stbc import AlamoutiOfdm

RATES = Rates(baud_rate=1250, sample_rate=10000)
N_PAIRS = 8

# Two channels with deep nulls at DIFFERENT bins: each alone kills its
# faded subcarriers; together the diversity gain |Ha|^2+|Hb|^2 stays up.
CH_A = (np.array([0.9, 0.0, 0.25, 0.0, -0.1], np.float32),
        np.array([0.1, -0.3, 0.0, 0.12, 0.05], np.float32))
CH_B = (np.array([0.8, 0.3, 0.0, -0.15, 0.0], np.float32),
        np.array([0.0, 0.1, -0.25, 0.0, 0.1], np.float32))


def _stbc(name="qpsk"):
    return AlamoutiOfdm(make_scheme(name, RATES))


def _bits(st, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2, (channels, st.bits_per_frame(N_PAIRS))),
        jnp.int32)


def _through(st, bits, key=None, snr=None):
    (ia, qa), (ib, qb) = st.tx(bits)
    ra = multipath_fir(ia, qa, *CH_A)
    rb = multipath_fir(ib, qb, *CH_B)
    ci, cq = ra[0] + rb[0], ra[1] + rb[1]
    if snr is not None:
        ci, cq = awgn(key, ci, cq, snr)
    return ci, cq


class TestAlamouti:
    @pytest.mark.parametrize("name", ["qpsk", "qam16"])
    def test_flat_channels_exact(self, name):
        st = _stbc(name)
        bits = _bits(st)
        (ia, qa), (ib, qb) = st.tx(bits)
        # ideal: A arrives with one gain, B with another
        ai, aq = apply_gain_phase(ia, qa, gain=0.8, phase=0.5)
        bi, bq = apply_gain_phase(ib, qb, gain=1.2, phase=-1.0)
        out = st.rx(ai + bi, aq + bq, N_PAIRS)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_dispersive_channels_exact(self):
        st = _stbc("qam16")
        bits = _bits(st, seed=1)
        ci, cq = _through(st, bits)
        out = st.rx(ci, cq, N_PAIRS)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_diversity_beats_the_fade(self):
        """At the same noise level, single-antenna OFDM through channel A
        (a -21 dB null) has a persistent error floor; the Alamouti pair
        through (A, B) decodes exactly."""
        snr = 22.0
        st = _stbc("qpsk")
        bits = _bits(st, channels=4, seed=2)
        ci, cq = _through(st, bits, key=jax.random.PRNGKey(3), snr=snr)
        out = st.rx(ci, cq, N_PAIRS)
        stbc_errs = int(jnp.sum(out != bits))

        data, pilots = _default_grid(64)
        solo = OfdmModem(make_scheme("qpsk", RATES),
                         data_bins=data + pilots, pilot_bins=(), n_ltf=1)
        sbits = jnp.asarray(np.random.default_rng(4).integers(
            0, 2, (4, solo.bits_per_frame(2 * N_PAIRS))), jnp.int32)
        si, sq = solo.tx_frame(sbits)
        si, sq = multipath_fir(si, sq, *CH_A)
        si, sq = awgn(jax.random.PRNGKey(5), si, sq, snr)
        solo_errs = int(jnp.sum(solo.rx_frame(si, sq, 2 * N_PAIRS)
                                != sbits))
        assert solo_errs > 5
        assert stbc_errs == 0

    def test_llr_signs_match_hard_and_weighting(self):
        st = _stbc("qpsk")
        bits = _bits(st, seed=6)
        ci, cq = _through(st, bits, key=jax.random.PRNGKey(7), snr=25.0)
        hard = st.rx(ci, cq, N_PAIRS)
        llr = st.rx_soft(ci, cq, N_PAIRS, noise_var=1e-2)
        assert llr.shape == bits.shape
        np.testing.assert_array_equal(
            np.asarray(llr_hard_bits(llr)), np.asarray(hard))

    def test_validation(self):
        st = _stbc()
        # odd symbol count cannot pair
        with pytest.raises(ValueError, match="even number"):
            st.tx(jnp.zeros((1, st.m.bits_per_sym), jnp.int32))


class TestFramedLinkOverStbc:
    def test_ldpc_framed_link_with_diversity(self):
        """FramedLink (CRC + scramble + LDPC) over the Alamouti PHY
        through the double-fade channel pair: exact payloads, true
        verdicts, at an SNR where either single channel alone fails."""
        from modem_tpu.fec import QcLdpc
        from modem_tpu.link import FramedLink

        code = QcLdpc()
        st = _stbc("qpsk")
        # 26 LDPC codewords = 16848 wire bits = 81 Alamouti pairs exactly
        # (one pair carries 2 x 52 bins x 2 bits = 208 coded bits)
        link = FramedLink(st.as_link_chain(),
                          payload_bits=26 * code.k - 16, ldpc=code,
                          ldpc_iters=40, interleave_rows=16)
        assert link.n_symbols == 16848 // st.bits_per_pair == 81
        rng = np.random.default_rng(23)
        payload = jnp.asarray(
            rng.integers(0, 2, (2, link.payload_bits)), jnp.int32)
        (ia, qa), (ib, qb) = link.tx(payload)
        ra = multipath_fir(ia, qa, *CH_A)
        rb = multipath_fir(ib, qb, *CH_B)
        snr = 14.0
        p = float(jnp.mean(ia * ia + qa * qa))
        ci, cq = awgn(jax.random.PRNGKey(24), ra[0] + rb[0],
                      ra[1] + rb[1], snr, signal_power=2 * p)
        nv = 2 * p / (10.0 ** (snr / 10.0)) / 2.0
        out, ok = link.rx((ci, cq), nv)
        assert bool(np.asarray(ok).all())
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(payload))

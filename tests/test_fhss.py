"""FHSS over the channelizer (modem_tpu/fhss.py): hop algebra, bank
calibration, partial-band jammer selectivity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates, make_scheme
from modem_tpu.chain import PulseShapedChain
from modem_tpu.fhss import FhssModem
from modem_tpu.ops.channel import awgn

RATES = Rates(baud_rate=1250, sample_rate=10000)
HOP = [3, 6, 1, 4, 6, 2]


def _modem(name="qpsk", hop=HOP, dwell=32):
    chain = PulseShapedChain(make_scheme(name, RATES), RATES)
    return FhssModem(chain, m=8, hop_seq=hop, dwell_symbols=dwell)


def _bits(fm, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2, (channels, fm.bits_per_frame())), jnp.int32)


def _jam(fm, wi, wq, channel, power=10.0):
    """CW tone at a channel's center frequency in the wideband domain."""
    p = float(jnp.mean(wi * wi + wq * wq)) * fm.m  # avg power per sample
    amp = np.sqrt(power * p)
    n = jnp.arange(wi.shape[-1], dtype=jnp.float32)
    th = 2.0 * np.pi * channel / fm.m * n + 1.1
    return wi + amp * jnp.cos(th), wq + amp * jnp.sin(th)


class TestFhss:
    @pytest.mark.parametrize("name", ["qpsk", "qam16"])
    def test_noiseless_roundtrip_exact(self, name):
        fm = _modem(name)
        bits = _bits(fm)
        wi, wq = fm.tx(bits)
        assert wi.shape[-1] == fm.m * fm.n_dwells * fm._dwell_len
        out = fm.rx(wi, wq)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_awgn_exact(self):
        fm = _modem()
        bits = _bits(fm, seed=1)
        wi, wq = fm.tx(bits)
        ni, nq = awgn(jax.random.PRNGKey(2), wi, wq, 25.0)
        out = fm.rx(ni, nq)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_partial_band_jammer_selectivity(self):
        """A 10x CW jammer parked on channel 5: the schedule that avoids
        it decodes exactly; a schedule that dwells there loses exactly
        those dwells."""
        fm = _modem()  # HOP avoids channel 5
        bits = _bits(fm, seed=3)
        wi, wq = fm.tx(bits)
        ji, jq = _jam(fm, wi, wq, channel=5)
        out = fm.rx(ji, jq)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

        hop2 = [3, 5, 1, 5, 6, 2]  # dwells 1 and 3 collide
        fm2 = _modem(hop=hop2)
        bits2 = _bits(fm2, seed=4)
        w2 = fm2.tx(bits2)
        j2 = _jam(fm2, *w2, channel=5)
        out2 = np.asarray(fm2.rx(*j2))
        errs = (out2 != np.asarray(bits2)).reshape(
            2, fm2.n_dwells, fm2.bits_per_dwell).sum(-1)
        assert np.all(errs[:, [1, 3]] > 5)       # jammed dwells die
        assert np.all(errs[:, [0, 2, 4, 5]] == 0)  # others untouched

    def test_hybrid_ds_fh_spread_spectrum(self):
        """FHSS over a DSSS chain — hybrid DS/FH, composable because the
        hopper probes the wrapped chain's actual waveform length
        (eval_shape) instead of assuming the pulse-shaped formula."""
        from modem_tpu.dsss import DsssChain

        ds = DsssChain(make_scheme("qpsk", RATES), RATES, 8)
        fm = FhssModem(ds, m=8, hop_seq=[2, 7, 4], dwell_symbols=16)
        bits = _bits(fm, seed=9)
        wi, wq = fm.tx(bits)
        out = fm.rx(wi, wq)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_validation(self):
        chain = PulseShapedChain(make_scheme("qpsk", RATES), RATES)
        with pytest.raises(ValueError):
            FhssModem(chain, m=8, hop_seq=[9], dwell_symbols=8)
        with pytest.raises(ValueError):
            FhssModem(chain, m=8, hop_seq=[], dwell_symbols=8)
        fm = _modem()
        with pytest.raises(ValueError):
            fm.tx(jnp.zeros((1, 7), jnp.int32))

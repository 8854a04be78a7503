"""2x2 MIMO spatial multiplexing over OFDM (modem_tpu/mimo.py): the
per-subcarrier MMSE separation, rate doubling, stream-coupled channels,
and SINR-weighted LLRs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import MimoOfdm, OfdmModem, Rates, make_scheme
from modem_tpu.link import FramedLink
from modem_tpu.ofdm import _default_grid
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import apply_gain_phase, multipath_fir
from modem_tpu.ops.llr import llr_hard_bits

RATES = Rates(baud_rate=1250, sample_rate=10000)
N_SYM = 8

# Four CP-short impulse responses forming a well-conditioned 2x2 matrix
# channel (every receive antenna hears BOTH streams through distinct
# dispersive paths).
CH = {
    (0, 0): (np.array([0.9, 0.0, 0.2, 0.0, -0.08], np.float32),
             np.array([0.1, -0.25, 0.0, 0.1, 0.0], np.float32)),
    (0, 1): (np.array([0.35, 0.2, 0.0, -0.1, 0.0], np.float32),
             np.array([0.0, 0.1, -0.15, 0.0, 0.05], np.float32)),
    (1, 0): (np.array([0.3, -0.15, 0.1, 0.0, 0.0], np.float32),
             np.array([0.12, 0.0, 0.08, -0.06, 0.0], np.float32)),
    (1, 1): (np.array([0.85, 0.1, -0.2, 0.0, 0.06], np.float32),
             np.array([0.05, 0.2, 0.0, -0.1, 0.0], np.float32)),
}


def _mimo(name="qpsk"):
    return MimoOfdm(make_scheme(name, RATES))


def _bits(mm, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2, (channels, mm.bits_per_frame(N_SYM))),
        jnp.int32)


def _through(mm, bits, key=None, snr=None):
    """2x2 matrix channel: rx r hears stream A through CH[r,0] plus
    stream B through CH[r,1]."""
    (ia, qa), (ib, qb) = mm.tx(bits)
    outs = []
    for r in (0, 1):
        fa = multipath_fir(ia, qa, *CH[(r, 0)])
        fb = multipath_fir(ib, qb, *CH[(r, 1)])
        ci, cq = fa[0] + fb[0], fa[1] + fb[1]
        if snr is not None:
            ci, cq = awgn(jax.random.fold_in(key, r), ci, cq, snr)
        outs += [ci, cq]
    return outs


class TestMimo:
    def test_rate_is_double_siso(self):
        mm = _mimo()
        siso = OfdmModem(make_scheme("qpsk", RATES),
                         data_bins=sum(_default_grid(64), ()),
                         pilot_bins=(), n_ltf=1)
        # same airtime per payload symbol, twice the bits
        assert mm.bits_per_slot == 2 * siso.bits_per_sym

    @pytest.mark.parametrize("name", ["qpsk", "qam16"])
    def test_flat_cross_coupled_exact(self, name):
        """Noiseless flat 2x2 mixing with heavy cross-talk: ZF separates
        the streams exactly."""
        mm = _mimo(name)
        bits = _bits(mm)
        (ia, qa), (ib, qb) = mm.tx(bits)
        a1i, a1q = apply_gain_phase(ia, qa, gain=1.0, phase=0.3)
        b1i, b1q = apply_gain_phase(ib, qb, gain=0.6, phase=-1.2)
        a2i, a2q = apply_gain_phase(ia, qa, gain=0.5, phase=2.0)
        b2i, b2q = apply_gain_phase(ib, qb, gain=0.9, phase=0.8)
        out = mm.rx_frame(a1i + b1i, a1q + b1q, a2i + b2i, a2q + b2q,
                          N_SYM)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_dispersive_2x2_exact_mmse_34db(self):
        """16-QAM through the dispersive 2x2 channel at 34 dB: exact.
        (Separating co-channel streams genuinely spends SNR on the
        worst-conditioned bins — at 30 dB this channel leaves a handful
        of errors; that is noise enhancement, not an algebra bug: the
        noiseless case is exact, see test_jit.)"""
        mm = _mimo("qam16")
        bits = _bits(mm, seed=1)
        y = _through(mm, bits, key=jax.random.key(2), snr=34.0)
        nv = float(jnp.mean(y[0] ** 2 + y[1] ** 2)) / 10.0 ** 3.4
        out = mm.rx_frame(*y, N_SYM, noise_var=nv)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_mmse_beats_zf_in_noise(self):
        """At low SNR through the dispersive 2x2 channel, regularized
        MMSE makes strictly fewer bit errors than ZF (the classic
        noise-enhancement gap)."""
        mm = _mimo("qpsk")
        bits = _bits(mm, channels=24, seed=3)
        y = _through(mm, bits, key=jax.random.key(4), snr=9.0)
        nv = float(jnp.mean(y[0] ** 2 + y[1] ** 2)) / 10.0 ** 0.9
        zf = int(jnp.sum(mm.rx_frame(*y, N_SYM) != bits))
        ms = int(jnp.sum(mm.rx_frame(*y, N_SYM, noise_var=nv) != bits))
        assert zf > 0, "operating point too easy"
        assert ms < zf, (ms, zf)

    def test_soft_hard_agreement(self):
        mm = _mimo("qam16")
        bits = _bits(mm, seed=5)
        y = _through(mm, bits, key=jax.random.key(6), snr=30.0)
        nv = float(jnp.mean(y[0] ** 2 + y[1] ** 2)) / 10.0 ** 3.0
        hard = mm.rx_frame(*y, N_SYM, noise_var=nv)
        llr = mm.rx_soft_frame(*y, N_SYM, noise_var=nv)
        assert llr.shape == bits.shape
        np.testing.assert_array_equal(
            np.asarray(llr_hard_bits(llr)), np.asarray(hard))

    def test_framed_link_over_mimo(self):
        """FramedLink (CRC + conv + interleave) runs over the MIMO PHY
        via the chain adapter and recovers payloads through the
        dispersive 2x2 channel at moderate SNR."""
        mm = _mimo("qpsk")
        # conv rate 1/2 + CRC16 + 6 tail: wire = 2*(p+22) must fill whole
        # slots of bits_per_slot bits -> p = 394 gives 4 slots exactly
        link = FramedLink(mm.as_link_chain(), payload_bits=394)
        assert link.n_symbols * mm.bits_per_slot == 2 * (394 + 22)
        rng = np.random.default_rng(7)
        payload = jnp.asarray(
            rng.integers(0, 2, (2, 394)), jnp.int32)
        (ia, qa), (ib, qb) = link.tx(payload)
        outs = []
        key = jax.random.key(8)
        for r in (0, 1):
            fa = multipath_fir(ia, qa, *CH[(r, 0)])
            fb = multipath_fir(ib, qb, *CH[(r, 1)])
            ci, cq = fa[0] + fb[0], fa[1] + fb[1]
            ci, cq = awgn(jax.random.fold_in(key, r), ci, cq, 14.0)
            outs += [ci, cq]
        p = float(jnp.mean(outs[0] ** 2 + outs[1] ** 2))
        nv = p / 10.0 ** 1.4
        got, ok = link.rx(tuple(outs), noise_var=nv)
        assert bool(jnp.all(ok))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(payload))

    def test_jit(self):
        mm = _mimo()
        bits = _bits(mm, seed=9)
        y = _through(mm, bits)
        out = jax.jit(lambda *a: mm.rx_frame(*a, N_SYM))(*y)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

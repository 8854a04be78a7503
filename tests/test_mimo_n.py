"""N x N MIMO spatial multiplexing (modem_tpu/mimo.MimoOfdmN): the
recursive-Schur split-plane MMSE, 4x4 stream separation, nr > nt
over-determined detection, and agreement with the dedicated 2x2 class."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import MimoOfdm, MimoOfdmN, Rates, make_scheme
from modem_tpu.mimo import _cinv_h
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import multipath_fir

RATES = Rates(baud_rate=1250, sample_rate=10000)
N_SYM = 8


def _rand_channel(nr, nt, seed=0, taps=5):
    """Well-conditioned random matrix channel: strong distinct diagonal
    paths plus weaker cross paths, all CP-short and dispersive."""
    rng = np.random.default_rng(seed)
    ch = {}
    for r in range(nr):
        for a in range(nt):
            lead = 0.9 if r == a else 0.3
            hi = rng.normal(0, 0.08, taps).astype(np.float32)
            hq = rng.normal(0, 0.08, taps).astype(np.float32)
            hi[0] += lead
            ch[(r, a)] = (hi, hq)
    return ch


def _through(mm, bits, nr, ch, key=None, snr=None):
    ti, tq = mm.tx(bits)                       # [..., nt, L]
    outs_i, outs_q = [], []
    for r in range(nr):
        ci = cq = 0.0
        for a in range(mm.nt):
            fa = multipath_fir(ti[..., a, :], tq[..., a, :], *ch[(r, a)])
            ci = ci + fa[0]
            cq = cq + fa[1]
        if snr is not None:
            ci, cq = awgn(jax.random.fold_in(key, r), ci, cq, snr)
        outs_i.append(ci)
        outs_q.append(cq)
    return jnp.stack(outs_i, axis=-2), jnp.stack(outs_q, axis=-2)


def _bits(mm, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2, (channels, mm.bits_per_frame(N_SYM))),
        jnp.int32)


class TestSchurInverse:
    @pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 8])
    def test_matches_numpy_inverse(self, n):
        rng = np.random.default_rng(n)
        b = rng.normal(0, 1, (64, n, n)) + 1j * rng.normal(0, 1, (64, n, n))
        a = np.einsum("bij,bkj->bik", b, b.conj()) + np.eye(n)
        got_r, got_i = _cinv_h((jnp.asarray(a.real, jnp.float32),
                                jnp.asarray(a.imag, jnp.float32)), n)
        want = np.linalg.inv(a)
        np.testing.assert_allclose(np.asarray(got_r), want.real,
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_i), want.imag,
                                   rtol=2e-3, atol=2e-4)


class TestNxN:
    def test_4x4_zf_noiseless_exact(self):
        mm = MimoOfdmN(make_scheme("qpsk", RATES), nt=4)
        bits = _bits(mm)
        yi, yq = _through(mm, bits, 4, _rand_channel(4, 4))
        got = mm.rx_frame(yi, yq, N_SYM)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))

    def test_4x4_mmse_high_snr_exact(self):
        # 45 dB: post-MMSE SINR on the worst-conditioned bins of a
        # random 4x4 cross-coupled channel is tens of dB below the
        # per-antenna SNR; 16-QAM needs the margin for exactness
        mm = MimoOfdmN(make_scheme("qam16", RATES), nt=4)
        bits = _bits(mm, seed=1)
        yi, yq = _through(mm, bits, 4, _rand_channel(4, 4, seed=1),
                          key=jax.random.key(0), snr=45.0)
        got = mm.rx_frame(yi, yq, N_SYM, noise_var=10 ** (-45 / 10))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))

    def test_rate_is_nt_times_siso(self):
        mm = MimoOfdmN(make_scheme("qpsk", RATES), nt=4)
        assert mm.bits_per_frame(N_SYM) == 4 * N_SYM * mm.m.bits_per_sym

    def test_overdetermined_nr_gt_nt(self):
        mm = MimoOfdmN(make_scheme("qpsk", RATES), nt=2)
        bits = _bits(mm, seed=2)
        yi, yq = _through(mm, bits, 3, _rand_channel(3, 2, seed=2),
                          key=jax.random.key(1), snr=25.0)
        got = mm.rx_frame(yi, yq, N_SYM, noise_var=10 ** (-25 / 10))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))

    def test_nr_lt_nt_rejected(self):
        mm = MimoOfdmN(make_scheme("qpsk", RATES), nt=4)
        bits = _bits(mm)
        yi, yq = _through(mm, bits, 4, _rand_channel(4, 4))
        with pytest.raises(ValueError, match="nr >= nt"):
            mm.rx_frame(yi[..., :3, :], yq[..., :3, :], N_SYM)

    def test_soft_llr_signs_and_weights(self):
        mm = MimoOfdmN(make_scheme("qpsk", RATES), nt=4)
        bits = _bits(mm, seed=3)
        yi, yq = _through(mm, bits, 4, _rand_channel(4, 4, seed=3),
                          key=jax.random.key(2), snr=40.0)
        llr = mm.rx_soft_frame(yi, yq, N_SYM, noise_var=10 ** (-40 / 10))
        hard = (np.asarray(llr) < 0).astype(np.int64)
        np.testing.assert_array_equal(hard, np.asarray(bits))
        assert np.all(np.isfinite(np.asarray(llr)))


class TestAgainst2x2:
    def test_nt2_matches_dedicated_2x2(self):
        """MimoOfdmN(nt=2) and MimoOfdm produce the same decision points
        and weights through the same channel (different arithmetic path,
        so allclose rather than exact)."""
        ch = _rand_channel(2, 2, seed=4)
        m2 = MimoOfdm(make_scheme("qpsk", RATES))
        mn = MimoOfdmN(make_scheme("qpsk", RATES), nt=2)
        bits = _bits(mn, seed=4)
        yi, yq = _through(mn, bits, 2, ch)
        # the dedicated class takes unstacked captures
        (wa, wb) = m2.tx(bits)
        ti, tq = mn.tx(bits)
        np.testing.assert_allclose(np.asarray(ti[..., 0, :]),
                                   np.asarray(wa[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ti[..., 1, :]),
                                   np.asarray(wb[0]), atol=1e-6)
        di_n, dq_n, w_n = mn.detect(yi, yq, N_SYM, noise_var=1e-3)
        di_2, dq_2, w_2 = m2.detect(yi[..., 0, :], yq[..., 0, :],
                                    yi[..., 1, :], yq[..., 1, :],
                                    N_SYM, noise_var=1e-3)
        np.testing.assert_allclose(np.asarray(di_n), np.asarray(di_2),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dq_n), np.asarray(dq_2),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(w_n), np.asarray(w_2),
                                   rtol=1e-3, atol=1e-3)

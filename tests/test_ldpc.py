"""QC-LDPC (modem_tpu/fec/ldpc.py): IRA encode + gather-free min-sum.

Validated against an independent dense-GF(2) numpy oracle (H built from
the edge list), then as a channel code: noiseless, bit-flip, and AWGN
operation, plus the end-to-end soft path from the QPSK chain's LLRs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.fec.ldpc import QcLdpc
from modem_tpu.ops.channel import awgn


def _dense_h(code: QcLdpc) -> np.ndarray:
    """Independent oracle: H as a dense GF(2) matrix from the edge list."""
    h = np.zeros((code.mb * code.z, code.n), np.int64)
    for r, c, s in code._edges:
        for t in range(code.z):
            # (M x)_t = x_{(t+s) mod z}: row t of block r has a 1 at
            # column position (t + s) mod z of block c
            h[r * code.z + t, c * code.z + (t + s) % code.z] = 1
    return h


CODE = QcLdpc()  # (648, 324)


class TestConstruction:
    def test_geometry(self):
        assert (CODE.n, CODE.k) == (648, 324)
        # balanced check degrees: every row gets data entries
        degs = [d for _, d in CODE._row_slices]
        assert min(degs) >= 4 and max(degs) - min(degs) <= 2

    @pytest.mark.parametrize("seed", [4, 6, 10, 11, 14])
    def test_no_4cycles(self, seed):
        """Girth >= 6 for the FULL matrix (accumulator columns included —
        seeds 4/6/10/14 used to slip adjacent-row equal-shift data
        entries past a data-part-only check and close 4-cycles through
        the parity identities)."""
        h = _dense_h(QcLdpc(seed=seed))
        gram = h @ h.T
        np.fill_diagonal(gram, 0)
        assert gram.max() <= 1  # two rows share at most one column

    def test_encode_satisfies_dense_h(self):
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.integers(0, 2, (5, CODE.k)), jnp.int32)
        cw = np.asarray(CODE.encode(data))
        h = _dense_h(CODE)
        assert cw.shape == (5, CODE.n)
        np.testing.assert_array_equal((cw @ h.T) % 2, 0)
        # systematic
        np.testing.assert_array_equal(cw[:, :CODE.k], np.asarray(data))

    def test_syndrome_ok(self):
        rng = np.random.default_rng(1)
        data = jnp.asarray(rng.integers(0, 2, (3, CODE.k)), jnp.int32)
        cw = CODE.encode(data)
        assert bool(jnp.all(CODE.syndrome_ok(cw)))
        bad = cw.at[..., 100].set(1 - cw[..., 100])
        assert not bool(jnp.any(CODE.syndrome_ok(bad)))


class TestVariants:
    @pytest.mark.parametrize("z,mb,nb", [
        (27, 6, 24),    # rate 3/4, (648, 486)
        (54, 12, 24),   # rate 1/2, (1296, 648)
        (16, 8, 16),    # rate 1/2, short (256, 128)
    ])
    def test_geometry_sweep(self, z, mb, nb):
        """The construction generalizes across rate and lifting size:
        encode satisfies the dense-H oracle, and a noisy decode returns
        the data (SNR chosen comfortably inside the waterfall)."""
        code = QcLdpc(z=z, mb=mb, nb=nb, seed=3)
        rng = np.random.default_rng(z)
        data = jnp.asarray(rng.integers(0, 2, (3, code.k)), jnp.int32)
        cw = code.encode(data)
        h = _dense_h(code)
        np.testing.assert_array_equal((np.asarray(cw) @ h.T) % 2, 0)
        x = 1.0 - 2.0 * cw.astype(jnp.float32)
        y = x + jnp.asarray(rng.normal(0.0, 0.28, x.shape), jnp.float32)
        out = code.decode(2.0 * y / 0.0784, iters=30)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(data))


class TestDecode:
    def test_noiseless(self):
        rng = np.random.default_rng(2)
        data = jnp.asarray(rng.integers(0, 2, (4, CODE.k)), jnp.int32)
        cw = CODE.encode(data)
        llr = 20.0 * (1.0 - 2.0 * cw.astype(jnp.float32))
        out = CODE.decode(llr, iters=5)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(data))

    def test_corrects_bit_flips(self):
        rng = np.random.default_rng(3)
        data = jnp.asarray(rng.integers(0, 2, (4, CODE.k)), jnp.int32)
        cw = CODE.encode(data)
        flips = np.zeros((4, CODE.n), np.float32)
        for b in range(4):
            flips[b, rng.choice(CODE.n, 25, replace=False)] = 1.0
        x = cw.astype(jnp.float32) + jnp.asarray(flips) * (
            1.0 - 2.0 * cw.astype(jnp.float32))
        llr = 4.0 * (1.0 - 2.0 * x)
        out = CODE.decode(llr, iters=30)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(data))

    def test_awgn_waterfall(self):
        """BPSK over AWGN at Eb/N0 = 4.5 dB: the raw channel makes
        hundreds of hard errors; 40 min-sum iterations clean all of them
        (deterministic seeds)."""
        rng = np.random.default_rng(4)
        data = jnp.asarray(rng.integers(0, 2, (16, CODE.k)), jnp.int32)
        cw = CODE.encode(data)
        x = 1.0 - 2.0 * cw.astype(jnp.float32)  # bit 0 -> +1
        ebn0 = 10.0 ** (4.5 / 10.0)
        sigma2 = 1.0 / (2.0 * 0.5 * ebn0)  # rate 1/2
        noise = jnp.asarray(np.random.default_rng(44).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        y = x + noise
        llr = 2.0 * y / sigma2
        raw = int(jnp.sum((y < 0).astype(jnp.int32) != cw))
        out = CODE.decode(llr, iters=40)
        errs = int(jnp.sum(out != data))
        assert raw > 200
        assert errs == 0

    def test_decode_full_resatisfies_h(self):
        rng = np.random.default_rng(5)
        data = jnp.asarray(rng.integers(0, 2, (2, CODE.k)), jnp.int32)
        cw = CODE.encode(data)
        llr = 6.0 * (1.0 - 2.0 * cw.astype(jnp.float32))
        full = CODE.decode_full(llr, iters=10)
        assert bool(jnp.all(CODE.syndrome_ok(full)))


class TestLayered:
    """Row-layered schedule, bf16 messages, and early termination
    (the throughput forms) against the flooding reference."""

    def _llrs(self, seed, batch, ebn0_db):
        rng = np.random.default_rng(seed)
        data = jnp.asarray(rng.integers(0, 2, (batch, CODE.k)), jnp.int32)
        cw = CODE.encode(data)
        x = 1.0 - 2.0 * cw.astype(jnp.float32)
        sigma2 = 1.0 / (2.0 * 0.5 * 10.0 ** (ebn0_db / 10.0))
        noise = jnp.asarray(np.random.default_rng(seed + 1).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        return data, 2.0 * (x + noise) / sigma2

    def test_layered_waterfall(self):
        """Same 4.5 dB point as the flooding waterfall test — layered
        cleans it in HALF the iterations."""
        data, llr = self._llrs(40, 16, 4.5)
        out = CODE.decode(llr, iters=20, schedule="layered")
        assert int(jnp.sum(out != data)) == 0

    @pytest.mark.slow
    def test_layered_converges_2x_faster(self):
        """At a harsh point near the waterfall edge, layered with half
        the iteration budget is at least as good as flooding (bit errors
        over a deterministic batch)."""
        data, llr = self._llrs(41, 48, 3.4)
        flood = CODE.decode(llr, iters=16, schedule="flooding")
        lay = CODE.decode(llr, iters=8, schedule="layered")
        e_f = int(jnp.sum(flood != data))
        e_l = int(jnp.sum(lay != data))
        assert e_l <= e_f

    @pytest.mark.slow
    def test_bf16_messages_waterfall_unaffected(self):
        """bf16 message storage: identical decoded bits to f32 at the
        4.5 dB operating point (both error-free), and no worse at the
        harsh 3.4 dB point."""
        data, llr = self._llrs(42, 16, 4.5)
        out = CODE.decode(llr, iters=20, schedule="layered",
                          msg_dtype=jnp.bfloat16)
        assert int(jnp.sum(out != data)) == 0
        data2, llr2 = self._llrs(43, 48, 3.4)
        e32 = int(jnp.sum(CODE.decode(llr2, iters=10) != data2))
        e16 = int(jnp.sum(CODE.decode(
            llr2, iters=10, msg_dtype=jnp.bfloat16) != data2))
        assert e16 <= e32 + 2  # within measurement noise of each other

    def test_early_exit_matches_full_run(self):
        """early_exit stops at a valid codeword: decoded data equals the
        fixed-iteration result wherever the fixed run also converged."""
        data, llr = self._llrs(44, 16, 4.5)
        full = CODE.decode(llr, iters=30, schedule="layered")
        fast = CODE.decode(llr, iters=30, schedule="layered",
                           early_exit=True)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(data))

    def test_early_exit_noiseless_is_instant_and_exact(self):
        rng = np.random.default_rng(45)
        data = jnp.asarray(rng.integers(0, 2, (4, CODE.k)), jnp.int32)
        llr = 20.0 * (1.0 - 2.0 * CODE.encode(data).astype(jnp.float32))
        out = CODE.decode(llr, iters=50, early_exit=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(data))

    def test_layered_full_resatisfies_h(self):
        rng = np.random.default_rng(46)
        data = jnp.asarray(rng.integers(0, 2, (2, CODE.k)), jnp.int32)
        llr = 6.0 * (1.0 - 2.0 * CODE.encode(data).astype(jnp.float32))
        full = CODE.decode_full(llr, iters=10, schedule="layered")
        assert bool(jnp.all(CODE.syndrome_ok(full)))

    def test_schedule_validation(self):
        llr = jnp.zeros((CODE.n,), jnp.float32)
        with pytest.raises(ValueError):
            CODE.decode(llr, schedule="zigzag")
        with pytest.raises(ValueError):
            CODE.decode(llr, schedule="flooding", early_exit=True)


class TestChainIntegration:
    def test_qpsk_chain_llrs_feed_ldpc(self):
        """bits -> LDPC encode -> QPSK chain + AWGN -> chain LLRs ->
        min-sum: exact where the uncoded chain has a clear error floor
        (the same SNR point as the Viterbi integration test)."""
        rates = Rates(baud_rate=1250, sample_rate=10000)
        chain = qpsk_reference_chain(rates)
        rng = np.random.default_rng(6)
        data = jnp.asarray(rng.integers(0, 2, (8, CODE.k)), jnp.int32)
        cbits = CODE.encode(data)                       # [..., 648]
        i, q = chain.tx(cbits)
        ni, nq = awgn(jax.random.key(7), i, q, snr_db=-3.0)
        p = float(jnp.mean(i * i + q * q))
        nv = p / (2.0 * 10.0 ** (-3.0 / 10.0))
        k = cbits.shape[-1] // 2
        llr = chain.rx_soft((ni, nq), k, noise_var=nv)
        hard = chain.rx((ni, nq), k)
        out = CODE.decode(llr, iters=40)
        assert int(jnp.sum(hard != cbits)) > 30   # uncoded floor
        assert int(jnp.sum(out != data)) == 0     # LDPC cleans it


class TestInfiniteLlrs:
    def test_pinned_bits_with_infinite_llrs_decode_clean(self):
        """±inf LLRs (pinned/shortened bits, standard convention) must not
        poison the decode: the varying-type tie of the initial messages is
        inf-safe (review-3 regression test)."""
        rng = np.random.default_rng(90)
        data = jnp.asarray(rng.integers(0, 2, (8, CODE.k)), jnp.int32)
        cw = CODE.encode(data)
        llr = 4.0 * (1.0 - 2.0 * cw.astype(jnp.float32))
        # pin the first bit of every codeword with a correctly-signed inf
        pin = jnp.where(cw[..., 0] == 0, jnp.inf, -jnp.inf)
        llr = llr.at[..., 0].set(pin)
        for kw in (dict(schedule="layered"), dict(schedule="flooding")):
            out = CODE.decode(llr, iters=10, **kw)
            assert int(jnp.sum(out != data)) == 0, kw

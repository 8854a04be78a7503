"""Binary BCH codes (modem_tpu/fec/bch.py): generator construction vs
standard table sizes, numpy long-division oracle, bounded-distance
correction, and chain integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu.fec.bch import Bch, bch_255_191, bch_255_239


class TestConstruction:
    def test_standard_dimensions(self):
        """(255, k) for t = 1..8 must match the standard BCH table."""
        want = {1: 247, 2: 239, 3: 231, 4: 223, 5: 215, 6: 207,
                7: 199, 8: 191}
        for t, k in want.items():
            assert Bch(t=t).k == k, (t, Bch(t=t).k)

    def test_generator_is_binary_and_divides_x255_minus_1(self):
        code = bch_255_239()
        g = code._gen
        assert set(np.unique(g)) <= {0, 1}
        # g | x^255 - 1 over GF(2): long-divide and check zero remainder
        r = np.zeros(256, np.int64)
        r[255] = 1
        r[0] ^= 1
        for d in range(255, code.p - 1, -1):
            if r[d]:
                r[d - code.p: d + 1] ^= g
        assert not r.any()


class TestEncode:
    def test_codewords_have_zero_syndromes(self):
        code = bch_255_191()
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, (5, code.k)), jnp.int32)
        cw = code.encode(bits)
        assert cw.shape == (5, 255)
        np.testing.assert_array_equal(np.asarray(cw[..., :code.k]),
                                      np.asarray(bits))
        s = np.asarray(code.syndromes(cw))
        assert not s.any()

    def test_matches_long_division_oracle(self):
        code = bch_255_239()
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, code.k)
        # oracle: parity = x^p * m(x) mod g(x), msg bit i <-> x^{n-1-i}
        r = np.zeros(code.n, np.int64)
        for i, b in enumerate(bits):
            r[code.n - 1 - i] = b
        for d in range(code.n - 1, code.p - 1, -1):
            if r[d]:
                r[d - code.p: d + 1] ^= code._gen
        want_par = r[code.p - 1:: -1][: code.p]
        got = np.asarray(code.encode(jnp.asarray(bits, jnp.int32)))
        np.testing.assert_array_equal(got[code.k:], want_par)


class TestDecode:
    @pytest.mark.parametrize("nerr", [0, 1, 4, 8])
    def test_corrects_up_to_t(self, nerr):
        code = bch_255_191()
        rng = np.random.default_rng(10 + nerr)
        bits = jnp.asarray(rng.integers(0, 2, (6, code.k)), jnp.int32)
        cw = np.asarray(code.encode(bits)).copy()
        for r in range(cw.shape[0]):
            pos = rng.choice(code.n, size=nerr, replace=False)
            cw[r, pos] ^= 1
        msg, ok = code.decode(jnp.asarray(cw))
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(msg), np.asarray(bits))

    def test_detects_beyond_t(self):
        """t+1 errors on the t=8 code (d_min = 17, so the received word
        stays far from every other codeword): flagged uncorrectable.
        (A HIGH-RATE code like (255,239,t=2) at t+4 errors MIS-corrects
        to a neighboring codeword instead — inherent to bounded-distance
        decoding, observed and expected, so it is not asserted here.)"""
        code = bch_255_191()   # t = 8
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (8, code.k)), jnp.int32)
        cw = np.asarray(code.encode(bits)).copy()
        for r in range(cw.shape[0]):
            pos = rng.choice(code.n, size=code.t + 1, replace=False)
            cw[r, pos] ^= 1
        _, ok = code.decode(jnp.asarray(cw))
        assert not np.asarray(ok).any()

    def test_jit(self):
        code = bch_255_239()
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (3, code.k)), jnp.int32)
        cw = np.asarray(code.encode(bits)).copy()
        cw[:, 7] ^= 1
        msg, ok = jax.jit(code.decode)(jnp.asarray(cw))
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(msg), np.asarray(bits))


class TestChainIntegration:
    def test_bch_cleans_sparse_chain_errors(self):
        """BCH(255,191) over the QPSK chain at an SNR leaving sparse hard
        errors: the raw stream has tens of errors (max 6 in one codeword at
        these seeds), every codeword decodes exactly."""
        from modem_tpu import Rates
        from modem_tpu.chain import qpsk_reference_chain
        from modem_tpu.ops.channel import awgn

        code = bch_255_191()
        chain = qpsk_reference_chain(Rates(1250, 10000))
        rng = np.random.default_rng(5)
        data = jnp.asarray(rng.integers(0, 2, (16, code.k)), jnp.int32)
        cw = code.encode(data)
        pad = jnp.zeros(cw.shape[:-1] + (1,), jnp.int32)  # even bits
        i, q = chain.tx(jnp.concatenate([cw, pad], axis=-1))
        p = float(jnp.mean(i * i + q * q))
        snr = -2.0
        ni, nq = awgn(jax.random.key(6), i, q, snr, signal_power=p)
        hard = chain.rx((ni, nq), 128)[..., : code.n]
        raw = int(jnp.sum(hard != cw))
        msg, ok = code.decode(hard)
        assert raw > 3, raw
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(msg), np.asarray(data))

"""Reed–Solomon (modem_tpu/fec/rs.py): encode vs an independent polynomial-
division golden model, correction up to t, detection beyond, shortened DVB
code, and the full concatenated RS ⊗ conv stack through the modem chain.
"""

import numpy as np

import jax
import jax.numpy as jnp

from modem_tpu.fec.rs import ReedSolomon, rs_255_223, rs_dvb


def _golden_encode(rs, msg):
    """Classic LFSR polynomial division, straight from the definition."""
    exp, log = rs._exp, rs._log

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return int(exp[log[a] + log[b]])

    gen = rs._gen  # low-first, gen[p] == 1
    rem = [0] * rs.p
    for m in msg:
        fb = int(m) ^ rem[-1]
        rem = [0] + rem[:-1]
        if fb:
            for j in range(rs.p):
                rem[j] ^= gmul(fb, int(gen[j]))
    # remainder low-first; parity transmitted high-degree first
    return list(msg) + rem[::-1]


class TestEncode:
    def test_matches_golden_polynomial_division(self):
        for rs in (ReedSolomon(15 + 8, 15, fcr=1), rs_dvb(), rs_255_223()):
            rng = np.random.default_rng(0)
            msg = rng.integers(0, 256, rs.k)
            got = np.asarray(rs.encode(jnp.asarray(msg)))
            want = _golden_encode(rs, msg)
            np.testing.assert_array_equal(got, want)

    def test_codeword_roots(self):
        # every codeword evaluates to zero at the generator roots
        rs = rs_255_223()
        rng = np.random.default_rng(1)
        cw = rs.encode(jnp.asarray(rng.integers(0, 256, (3, rs.k))))
        s = np.asarray(rs.syndromes(cw))
        assert (s == 0).all()

    def test_bits_interface_roundtrip(self):
        rs = rs_dvb()
        rng = np.random.default_rng(2)
        bits = jnp.asarray(rng.integers(0, 2, (2, rs.k * 8)), jnp.int32)
        cw = rs.encode_bits(bits)
        assert cw.shape == (2, rs.n * 8)
        out, ok = rs.decode_bits(cw)
        assert bool(jnp.all(ok))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


class TestDecode:
    def _corrupt(self, cw, n_err, rng):
        cw = np.array(cw)
        pos = rng.choice(cw.shape[-1], n_err, replace=False)
        for p in pos:
            cw[..., p] ^= int(rng.integers(1, 256))
        return jnp.asarray(cw)

    def test_corrects_up_to_t(self):
        rs = rs_255_223()
        rng = np.random.default_rng(3)
        msg = jnp.asarray(rng.integers(0, 256, rs.k))
        cw = rs.encode(msg)
        for n_err in (0, 1, 7, 16):
            out, ok = rs.decode(self._corrupt(cw, n_err, rng))
            assert bool(ok), f"{n_err} errors"
            np.testing.assert_array_equal(np.asarray(out), np.asarray(msg))

    def test_detects_beyond_t(self):
        # t+2 random errors: overwhelmingly either flagged or (rarely)
        # miscorrected to another codeword; across 10 seeds at least 8 must
        # be flagged — and flagged decodes must never be reported ok.
        rs = ReedSolomon(255, 239)  # t = 8
        rng = np.random.default_rng(4)
        msg = jnp.asarray(rng.integers(0, 256, rs.k))
        cw = rs.encode(msg)
        flagged = 0
        for _ in range(10):
            out, ok = rs.decode(self._corrupt(cw, rs.t + 2, rng))
            if not bool(ok):
                flagged += 1
        assert flagged >= 8

    def test_shortened_dvb(self):
        rs = rs_dvb()
        rng = np.random.default_rng(5)
        msg = jnp.asarray(rng.integers(0, 256, (4, rs.k)))
        cw = rs.encode(msg)
        bad = self._corrupt(cw, rs.t, rng)
        out, ok = rs.decode(bad)
        assert bool(jnp.all(ok))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(msg))

    def test_batched_jit_mixed_errors(self):
        rs = ReedSolomon(63 + 32, 63)  # small n for speed, t=16
        rng = np.random.default_rng(6)
        msg = jnp.asarray(rng.integers(0, 256, (8, rs.k)))
        cw = np.array(rs.encode(msg))
        for ch in range(8):  # 0..7 errors in successive channels
            pos = rng.choice(rs.n, ch, replace=False)
            for p in pos:
                cw[ch, p] ^= int(rng.integers(1, 256))
        out, ok = jax.jit(rs.decode)(jnp.asarray(cw))
        assert bool(jnp.all(ok))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(msg))


class TestConcatenated:
    def test_rs_over_conv_through_chain(self):
        # The deep-space arrangement: RS outer, K=7 conv inner, noise at an
        # SNR where the inner decoder still leaks burst errors; the outer
        # code must deliver exactly zero.
        from modem_tpu import Rates, qpsk_reference_chain
        from modem_tpu.fec import ccsds_code
        from modem_tpu.ops.channel import awgn

        rs = rs_dvb()
        conv = ccsds_code()
        chain = qpsk_reference_chain(Rates(1250, 10000))
        rng = np.random.default_rng(7)
        msg_bits = jnp.asarray(rng.integers(0, 2, (2, rs.k * 8)), jnp.int32)
        cw_bits = rs.encode_bits(msg_bits)          # [2, 1632]
        tx_bits = conv.encode(cw_bits)              # [2, 3276]
        pad = (-tx_bits.shape[-1]) % 2
        tx_bits = jnp.concatenate(
            [tx_bits, jnp.zeros((2, pad), jnp.int32)], -1)
        i, q = chain.tx(tx_bits)
        snr = -6.5  # waveform-sample SNR: inner Viterbi alone leaves errors
        ni, nq = awgn(jax.random.key(7), i, q, snr_db=snr)
        p = float(jnp.mean(i * i + q * q))
        nv = p / (2.0 * 10.0 ** (snr / 10.0))
        llr = chain.rx_soft((ni, nq), tx_bits.shape[-1] // 2, noise_var=nv)
        inner = conv.decode_soft(llr[..., : llr.shape[-1] - pad])
        inner_errs = int(jnp.sum(inner != cw_bits))
        out, ok = rs.decode_bits(inner)
        outer_errs = int(jnp.sum(out != msg_bits))
        assert inner_errs > 0          # the outer code had work to do
        assert outer_errs == 0 and bool(jnp.all(ok))

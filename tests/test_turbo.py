"""Turbo codes (modem_tpu/fec/turbo.py): RSC encode vs a bit-level
python oracle, QPP bijectivity, termination, waterfall, and iteration
gain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu.fec.turbo import TurboCode


def _rsc_oracle(bits):
    """Literal LTE RSC (g0 = 1+D^2+D^3 feedback, g1 = 1+D+D^3 output)."""
    s1 = s2 = s3 = 0
    par, out_ts, out_tp = [], [], []
    for u in bits:
        a = u ^ s2 ^ s3
        par.append(a ^ s1 ^ s3)
        s1, s2, s3 = a, s1, s2
    for _ in range(3):
        u = s2 ^ s3           # zeroes the feedback
        out_ts.append(u)
        out_tp.append(0 ^ s1 ^ s3)
        s1, s2, s3 = 0, s1, s2
    assert (s1, s2, s3) == (0, 0, 0)
    return par, out_ts, out_tp


class TestEncode:
    def test_matches_oracle(self):
        code = TurboCode(40)
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, (3, 40))
        cw = np.asarray(code.encode(jnp.asarray(bits, jnp.int32)))
        k = 40
        pi = code._pi
        for r in range(3):
            b = list(bits[r])
            p1, t1s, t1p = _rsc_oracle(b)
            b2 = [b[pi[i]] for i in range(k)]
            p2, t2s, t2p = _rsc_oracle(b2)
            want = np.concatenate(
                [b, p1, p2, t1s, t1p, t2s, t2p]).astype(np.int64)
            np.testing.assert_array_equal(cw[r], want)

    def test_systematic_and_rate(self):
        code = TurboCode(64)
        rng = np.random.default_rng(1)
        bits = jnp.asarray(rng.integers(0, 2, (5, 64)), jnp.int32)
        cw = code.encode(bits)
        assert cw.shape[-1] == 3 * 64 + 12 == code.n
        np.testing.assert_array_equal(np.asarray(cw[..., :64]),
                                      np.asarray(bits))

    def test_qpp_validation(self):
        with pytest.raises(ValueError):
            TurboCode(100)             # no built-in, no f1/f2
        with pytest.raises(ValueError):
            TurboCode(64, f1=2, f2=4)  # even f1: not a bijection
        TurboCode(100, f1=3, f2=10)    # explicit valid QPP


class TestDecode:
    def test_noiseless_exact(self):
        code = TurboCode(128, iters=3)
        rng = np.random.default_rng(2)
        bits = jnp.asarray(rng.integers(0, 2, (6, code.k)), jnp.int32)
        llr = 5.0 * (1.0 - 2.0 * code.encode(bits).astype(jnp.float32))
        out = code.decode(llr)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_awgn_waterfall(self):
        """Rate-1/3 turbo, K=512, BPSK/AWGN at Eb/N0 = 2 dB: the raw
        channel makes thousands of hard errors; 6 max-log iterations
        clean all of them (deterministic seeds)."""
        code = TurboCode(512)
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (16, code.k)), jnp.int32)
        cw = code.encode(bits)
        x = 1.0 - 2.0 * cw.astype(jnp.float32)
        rate = code.k / code.n
        ebn0 = 10.0 ** (2.0 / 10.0)
        sigma2 = 1.0 / (2.0 * rate * ebn0)
        noise = jnp.asarray(np.random.default_rng(33).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        y = x + noise
        raw = int(jnp.sum((y < 0).astype(jnp.int32) != cw))
        out = code.decode(2.0 * y / sigma2)
        errs = int(jnp.sum(out != bits))
        assert raw > 1000, raw
        assert errs == 0, errs

    def test_iterations_help(self):
        """At a stressed point, 6 iterations make strictly fewer bit
        errors than 1 (the defining turbo property)."""
        code = TurboCode(256)
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (32, code.k)), jnp.int32)
        cw = code.encode(bits)
        x = 1.0 - 2.0 * cw.astype(jnp.float32)
        rate = code.k / code.n
        ebn0 = 10.0 ** (0.5 / 10.0)
        sigma2 = 1.0 / (2.0 * rate * ebn0)
        noise = jnp.asarray(np.random.default_rng(44).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        llr = 2.0 * (x + noise) / sigma2
        e1 = int(jnp.sum(code.decode(llr, iters=1) != bits))
        e6 = int(jnp.sum(code.decode(llr, iters=6) != bits))
        assert e1 > 0, "operating point too easy"
        assert e6 < e1, (e6, e1)

    @pytest.mark.slow
    def test_windowed_matches_full_waterfall(self):
        """Sliding-window BCJR (window=128, guard=32) decodes the same
        2 dB batch clean, and its decisions agree with the full-block
        form on every bit at this operating point."""
        code = TurboCode(512)
        rng = np.random.default_rng(7)
        bits = jnp.asarray(rng.integers(0, 2, (16, code.k)), jnp.int32)
        cw = code.encode(bits)
        x = 1.0 - 2.0 * cw.astype(jnp.float32)
        rate = code.k / code.n
        sigma2 = 1.0 / (2.0 * rate * 10.0 ** 0.2)
        noise = jnp.asarray(np.random.default_rng(77).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        llr = 2.0 * (x + noise) / sigma2
        full = code.decode(llr)
        win = code.decode(llr, window=128, guard=32)
        np.testing.assert_array_equal(np.asarray(win), np.asarray(full))
        np.testing.assert_array_equal(np.asarray(win), np.asarray(bits))

    def test_windowed_boundary_conditions_exact(self):
        """The pin-gamma padding carries the exact initial/terminal
        trellis conditions through the window edges: noiseless decode is
        exact even with a window that does not divide K+3."""
        code = TurboCode(256, iters=2)
        rng = np.random.default_rng(8)
        bits = jnp.asarray(rng.integers(0, 2, (4, code.k)), jnp.int32)
        llr = 5.0 * (1.0 - 2.0 * code.encode(bits).astype(jnp.float32))
        out = code.decode(llr, window=96, guard=24)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_jit_batched(self):
        code = TurboCode(64, iters=2)
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, (2, 3, code.k)), jnp.int32)
        llr = 4.0 * (1.0 - 2.0 * code.encode(bits).astype(jnp.float32))
        out = jax.jit(code.decode)(llr)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


class TestChainIntegration:
    def test_turbo_over_qpsk_chain_llrs(self):
        """Chain soft output feeds the turbo decoder directly: coded
        QPSK at an SNR where the uncoded chain makes many errors decodes
        clean."""
        from modem_tpu import Rates
        from modem_tpu.chain import qpsk_reference_chain
        from modem_tpu.ops.channel import awgn

        code = TurboCode(256, iters=6)
        chain = qpsk_reference_chain(Rates(1250, 10000))
        rng = np.random.default_rng(6)
        data = jnp.asarray(rng.integers(0, 2, (4, code.k)), jnp.int32)
        cw = code.encode(data)
        i, q = chain.tx(cw)
        p = float(jnp.mean(i * i + q * q))
        snr = -7.0  # per waveform sample; rate 1/3 + matched filter gain
        ni, nq = awgn(jax.random.key(7), i, q, snr, signal_power=p)
        nv = p / (2.0 * 10.0 ** (snr / 10.0))
        llr = chain.rx_soft((ni, nq), code.n // 2, noise_var=nv)
        hard_errs = int(jnp.sum((llr < 0).astype(jnp.int32) != cw))
        out = code.decode(llr)
        errs = int(jnp.sum(out != data))
        assert hard_errs > 100, hard_errs
        assert errs == 0, errs


class TestEarlyExit:
    def test_early_exit_matches_fixed_iterations(self):
        """Decision-stability stopping returns the fixed-iteration
        decisions at the operating point (and corrects real errors)."""
        tc = TurboCode(256, iters=6)
        rng = np.random.default_rng(11)
        bits = rng.integers(0, 2, (8, 256))
        cw = np.asarray(tc.encode(jnp.asarray(bits, jnp.int32)))
        llr = jnp.asarray((1.0 - 2.0 * cw) * 2.0
                          + rng.normal(0, 0.85, cw.shape), jnp.float32)
        hard_ch = (np.asarray(llr[..., :256]) < 0).astype(np.int64)
        assert (hard_ch != bits).sum() > 0, "channel too clean"
        fixed = tc.decode(llr, backend="xla")
        early = tc.decode(llr, backend="xla", early_exit=True)
        np.testing.assert_array_equal(np.asarray(early), np.asarray(fixed))
        np.testing.assert_array_equal(np.asarray(early), bits)

    def test_early_exit_windowed(self):
        tc = TurboCode(256, iters=6)
        rng = np.random.default_rng(12)
        bits = rng.integers(0, 2, (4, 256))
        cw = np.asarray(tc.encode(jnp.asarray(bits, jnp.int32)))
        llr = jnp.asarray((1.0 - 2.0 * cw) * 2.0
                          + rng.normal(0, 0.8, cw.shape), jnp.float32)
        got = tc.decode(llr, window=64, backend="xla", early_exit=True)
        np.testing.assert_array_equal(np.asarray(got), bits)

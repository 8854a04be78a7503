"""Polar rate matching: shortening / puncturing / repetition.

Structural gates (shortened coded bits are PROVABLY zero; punctured
construction freezes exactly the undecodable channels) plus AWGN
operating points for each mode, SC and CRC-aided SCL. The mother-code
decoders are untouched — rate matching is slices/pads/adds around them
— so these tests compose with every decode backend.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu.fec import PolarCode, RateMatchedPolar
from modem_tpu.fec.crc import Crc
from modem_tpu.fec.polar import _bhattacharyya_order, _z_udomain


def _awgn_llr(rm, rng, b, sigma):
    bits = rng.integers(0, 2, (b, rm.k))
    tx = np.asarray(rm.encode(jnp.asarray(bits, jnp.int32)))
    y = (1.0 - 2.0 * tx) + rng.normal(0, sigma, tx.shape)
    return bits, jnp.asarray(2.0 * y / sigma**2, jnp.float32)


class TestConstruction:
    def test_uniform_z_matches_log_domain_order(self):
        """_z_udomain with uniform z reproduces the production
        construction's ranking (same frozen set)."""
        for nb in (3, 5, 8):
            n = 1 << nb
            zu = _z_udomain(np.full(n, 0.5))
            a = np.argsort(zu, kind="stable")[: n // 2]
            b = _bhattacharyya_order(nb)[: n // 2]
            assert set(a.tolist()) == set(b.tolist())

    def test_shorten_forces_tail_frozen(self):
        rm = RateMatchedPolar(20, 48, n=64, mode="shorten")
        assert rm.code.frozen[48:].all()

    def test_puncture_freezes_exactly_m_dead_channels(self):
        """Head-punctured z=1 coded channels make exactly m u-channels
        erased-with-certainty, and the construction froze all of them."""
        n, e = 64, 48
        z = np.full(n, 0.5)
        z[: n - e] = 1.0
        zu = _z_udomain(z)
        dead = np.flatnonzero(zu >= 1.0)
        assert dead.size == n - e
        rm = RateMatchedPolar(16, e, n=n, mode="puncture")
        assert rm.code.frozen[dead].all()

    def test_auto_mode_rule(self):
        assert RateMatchedPolar(30, 48, n=64).mode == "shorten"  # r=0.625
        assert RateMatchedPolar(16, 48, n=64).mode == "puncture"  # r=1/3
        assert RateMatchedPolar(20, 96, n=64).mode == "repeat"
        assert RateMatchedPolar(20, 64, n=64).mode == "none"
        # n inferred: e=48 -> mother 64
        assert RateMatchedPolar(16, 48).n == 64

    def test_guards(self):
        with pytest.raises(ValueError, match="k <= min"):
            RateMatchedPolar(50, 48, n=64)
        with pytest.raises(ValueError, match="e <= n"):
            RateMatchedPolar(8, 96, n=64, mode="puncture")
        with pytest.raises(ValueError, match="repetition"):
            RateMatchedPolar(8, 48, n=64, mode="repeat")
        # rate ~1 through a heavy puncture: every selected channel is
        # weak (z up to ~1-6e-9) but none is exactly 1, so construction
        # succeeds (ADVICE r4: only exact z == 1 is structurally
        # undecodable; the float64 recursion propagates exact 1s exactly)
        assert RateMatchedPolar(40, 40, n=64, mode="puncture").k == 40
        # the z = 1 guard still fires when a custom pattern leaves fewer
        # than k structurally usable channels (standard puncturing never
        # does: m punctured coded bits -> exactly m exact-1 u-channels,
        # and k <= e = n - m)
        from modem_tpu.fec import PolarCode
        z = np.full(8, 0.5)
        z[:4] = 1.0
        with pytest.raises(ValueError, match="usable"):
            PolarCode(8, 5, channel_z=z)


class TestShorten:
    def test_dropped_bits_are_structurally_zero(self):
        rm = RateMatchedPolar(20, 48, n=64, mode="shorten")
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, (64, rm.k))
        x = np.asarray(rm.code.encode(jnp.asarray(bits, jnp.int32)))
        assert (x[:, 48:] == 0).all()

    @pytest.mark.slow
    @pytest.mark.slow
    def test_awgn_roundtrip_sc_and_scl(self):
        rm = RateMatchedPolar(20, 48, n=64, mode="shorten")
        rng = np.random.default_rng(1)
        bits, llr = _awgn_llr(rm, rng, 200, sigma=0.45)
        assert (np.asarray(rm.decode(llr)) == bits).all()
        assert (np.asarray(rm.decode_list(llr, 8)) == bits).all()


class TestPuncture:
    def test_awgn_roundtrip_sc_and_scl(self):
        rm = RateMatchedPolar(16, 48, n=64, mode="puncture")
        rng = np.random.default_rng(2)
        bits, llr = _awgn_llr(rm, rng, 200, sigma=0.45)
        assert (np.asarray(rm.decode(llr)) == bits).all()
        assert (np.asarray(rm.decode_list(llr, 8)) == bits).all()

    def test_naive_construction_fails_where_matched_succeeds(self):
        """Same puncturing pattern WITHOUT the z=1 construction: data
        lands on dead channels and even noiseless decode breaks —
        the construction-awareness is what makes puncturing work."""
        naive = RateMatchedPolar(16, 48, n=64, mode="shorten")
        # abuse: shorten's construction, puncture's transmission
        naive.mode = "puncture"
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, (64, 16))
        tx = np.asarray(naive.encode(jnp.asarray(bits, jnp.int32)))
        llr = jnp.asarray((1.0 - 2.0 * tx) * 8.0, jnp.float32)
        assert (np.asarray(naive.decode(llr)) != bits).any()


class TestRepeat:
    def test_dematch_sums_repeats(self):
        rm = RateMatchedPolar(20, 80, n=64, mode="repeat")
        rng = np.random.default_rng(4)
        llr = jnp.asarray(rng.normal(0, 1, (5, 80)), jnp.float32)
        out = np.asarray(rm.dematch(llr))
        ref = np.array(llr[:, :64])
        ref[:, :16] = ref[:, :16] + np.asarray(llr[:, 64:])
        np.testing.assert_array_equal(out, ref)

    def test_awgn_roundtrip(self):
        rm = RateMatchedPolar(24, 96, n=64, mode="repeat")
        rng = np.random.default_rng(5)
        bits, llr = _awgn_llr(rm, rng, 200, sigma=0.6)
        assert (np.asarray(rm.decode(llr)) == bits).all()
        assert (np.asarray(rm.decode_list(llr, 8)) == bits).all()


class TestCrcAided:
    def test_ca_scl_through_shortening(self):
        crc = Crc(8, 0x07)
        rm = RateMatchedPolar(24, 40, n=64, mode="shorten")
        rng = np.random.default_rng(6)
        data = rng.integers(0, 2, (100, rm.k - crc.w))
        framed = crc.append(jnp.asarray(data, jnp.int32))
        tx = np.asarray(rm.encode(framed))
        y = (1.0 - 2.0 * tx) + rng.normal(0, 0.55, tx.shape)
        llr = jnp.asarray(2.0 * y / 0.55**2, jnp.float32)
        out = np.asarray(rm.decode_list(llr, 8, crc=crc))
        assert (out == np.asarray(framed)).all()


class TestModeNone:
    def test_identity(self):
        rm = RateMatchedPolar(32, 64, n=64)
        base = PolarCode(64, 32)
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2, (20, 32))
        np.testing.assert_array_equal(
            np.asarray(rm.encode(jnp.asarray(bits, jnp.int32))),
            np.asarray(base.encode(jnp.asarray(bits, jnp.int32))))
        llr = jnp.asarray(rng.normal(0, 1, (20, 64)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(rm.decode(llr)),
                                      np.asarray(base.decode(llr)))

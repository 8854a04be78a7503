"""Framing layer: scrambler, CRC, puncturing (modem_tpu/fec/).

The scrambler's block keystream (GF(2) matrix powers) is checked against a
sequential per-bit LFSR, its period against the theory for a maximal
polynomial, and streaming against one-shot. The CRC matrices are checked
against published check values ("123456789" known-answer tests) and the
host bit loop. Puncturing is checked for exact index restoration and
through the full punctured coded-modem loop at rates 2/3 and 3/4.
"""

import numpy as np

import jax
import jax.numpy as jnp

from modem_tpu.fec import (
    Crc, Puncturer, ccsds_code, crc16_ccitt, crc32_mpeg2, dvb_scrambler,
    ieee80211_scrambler, rate23_pattern, rate34_pattern,
)


def _lfsr_keystream(poly: int, seed: int, n: int) -> np.ndarray:
    """Sequential golden model of the Scrambler convention."""
    m = poly.bit_length() - 1
    taps = [i for i in range(m) if (poly >> i) & 1]
    s = [(seed >> i) & 1 for i in range(m)]
    out = np.zeros(n, np.int64)
    for k in range(n):
        f = 0
        for i in taps:
            f ^= s[i]
        out[k] = f
        s = [f] + s[:-1]
    return out


class TestScrambler:
    def test_block_keystream_matches_sequential_lfsr(self):
        for scr in (dvb_scrambler(), ieee80211_scrambler()):
            ks, _ = scr.keystream(scr.init_state(), 500)
            gold = _lfsr_keystream(scr.poly, scr.seed, 500)
            np.testing.assert_array_equal(np.asarray(ks), gold)

    def test_state_advance_matches_chunked_streaming(self):
        scr = dvb_scrambler()
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, (3, 600)), jnp.int32)
        one, _ = scr.scramble(bits, scr.init_state((3,)))
        st = scr.init_state((3,))
        parts = []
        for a in range(0, 600, 150):
            p, st = scr.scramble(bits[..., a:a + 150], st)
            parts.append(p)
        np.testing.assert_array_equal(
            np.asarray(jnp.concatenate(parts, -1)), np.asarray(one))

    def test_involution(self):
        scr = ieee80211_scrambler()
        rng = np.random.default_rng(1)
        bits = jnp.asarray(rng.integers(0, 2, (4, 256)), jnp.int32)
        st = scr.init_state((4,))
        x, _ = scr.scramble(bits, st)
        y, _ = scr.descramble(x, st)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(bits))
        assert int(jnp.sum(x != bits)) > 50  # it did scramble

    def test_dvb_polynomial_is_maximal_length(self):
        # x^15 + x^14 + 1 is primitive: period 2^15 - 1, and the period
        # does not divide any maximal proper divisor 32767/{7,31,151}.
        scr = dvb_scrambler()
        n = (1 << 15) - 1
        ks, _ = scr.keystream(scr.init_state(), n + 200)
        ks = np.asarray(ks)
        np.testing.assert_array_equal(ks[n:], ks[:200])
        for d in (n // 7, n // 31, n // 151):
            assert not np.array_equal(ks[:n - d], ks[d:n])

    def test_whitens_constant_input(self):
        scr = dvb_scrambler()
        zeros = jnp.zeros((2048,), jnp.int32)
        out, _ = scr.scramble(zeros, scr.init_state())
        ones = int(jnp.sum(out))
        assert 0.45 < ones / 2048 < 0.55


class TestCrc:
    def test_known_answer_123456789(self):
        # The standard CRC check string, bits MSB-first per byte.
        msg = np.unpackbits(np.frombuffer(b"123456789", np.uint8))
        bits = jnp.asarray(msg.astype(np.int32))
        c16 = np.asarray(crc16_ccitt().compute(bits))
        val16 = int("".join(map(str, c16)), 2)
        assert val16 == 0x29B1  # CRC-16/CCITT-FALSE check value
        c32 = np.asarray(crc32_mpeg2().compute(bits))
        val32 = int("".join(map(str, c32)), 2)
        assert val32 == 0x0376E6E7  # CRC-32/MPEG-2 check value

    def test_matrix_matches_bit_loop(self):
        crc = Crc(8, 0x07, init=0x55, xorout=0x1F)
        rng = np.random.default_rng(2)
        for l in (1, 7, 64, 129):
            m = rng.integers(0, 2, l).astype(np.uint8)
            got = np.asarray(crc.compute(jnp.asarray(m, jnp.int32)))
            want = crc._crc_int(m, crc.init) ^ crc.xorout
            assert int("".join(map(str, got)), 2) == want

    def test_append_check_and_corruption(self):
        crc = crc16_ccitt()
        rng = np.random.default_rng(3)
        msg = jnp.asarray(rng.integers(0, 2, (5, 200)), jnp.int32)
        frame = crc.append(msg)
        assert frame.shape == (5, 216)
        assert bool(jnp.all(crc.check(frame)))
        bad = frame.at[2, 17].set(1 - frame[2, 17])
        ok = np.asarray(crc.check(bad))
        assert list(ok) == [True, True, False, True, True]

    def test_jittable(self):
        crc = crc32_mpeg2()
        msg = jnp.asarray(np.arange(128) % 2, jnp.int32)
        out = jax.jit(crc.check)(jax.jit(crc.append)(msg))
        assert bool(out)


class TestPuncture:
    def test_restore_positions_exactly(self):
        for pat in (rate23_pattern(), rate34_pattern()):
            p = Puncturer(pat)
            steps = 12
            rng = np.random.default_rng(4)
            llr_full = rng.normal(size=(2, 2 * steps)).astype(np.float32)
            wire = p.puncture(jnp.asarray(llr_full))
            assert wire.shape[-1] == p.out_bits(steps)
            back = np.asarray(p.depuncture(wire, steps))
            idx = p._flat_indices(steps)
            np.testing.assert_array_equal(back[..., idx], llr_full[..., idx])
            mask = np.ones(2 * steps, bool)
            mask[idx] = False
            assert (back[..., mask] == 0).all()

    def test_rates(self):
        assert Puncturer(rate23_pattern()).rate(0.5) == 2 / 3
        assert abs(Puncturer(rate34_pattern()).rate(0.5) - 0.75) < 1e-12

    def _punctured_loop(self, pattern, n_data, sigma, seed):
        code = ccsds_code()
        p = Puncturer(pattern)
        rng = np.random.default_rng(seed)
        bits = jnp.asarray(rng.integers(0, 2, (8, n_data)), jnp.int32)
        c = code.encode(bits)
        steps = c.shape[-1] // code.n
        wire = np.asarray(p.puncture(c)).astype(np.float32)
        y = 1.0 - 2.0 * wire
        if sigma:
            y = y + sigma * rng.normal(size=y.shape).astype(np.float32)
            llr = jnp.asarray(2.0 * y / sigma**2)
        else:
            llr = jnp.asarray(2.0 * y)
        dec = code.decode_soft(p.depuncture(llr, steps))
        return int(jnp.sum(dec != bits)), bits.size

    def test_noiseless_punctured_roundtrip_exact(self):
        # trellis steps = n_data + 6 must divide by the pattern period.
        err, _ = self._punctured_loop(rate23_pattern(), 200, 0.0, 5)
        assert err == 0
        err, _ = self._punctured_loop(rate34_pattern(), 198, 0.0, 5)
        assert err == 0

    def test_punctured_soft_decoding_under_noise(self):
        # Rate 2/3 at a moderately noisy operating point decodes clean;
        # the weaker rate-3/4 code is allowed a small residual.
        err23, n = self._punctured_loop(rate23_pattern(), 200, 0.45, 6)
        assert err23 == 0
        err34, n = self._punctured_loop(rate34_pattern(), 198, 0.45, 6)
        assert err34 <= n // 200

"""Polar codes (modem_tpu/fec/polar.py): encoder vs dense G_N oracle,
construction sanity, SC waterfall, and chain-LLR integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu.fec.polar import PolarCode, _bhattacharyya_order


def _gn(n_bits: int) -> np.ndarray:
    """Dense F^{(x)n} over GF(2) (natural order)."""
    f = np.array([[1, 0], [1, 1]], np.int64)
    g = np.array([[1]], np.int64)
    for _ in range(n_bits):
        g = np.kron(g, f) % 2
    return g


class TestConstruction:
    def test_order_matches_direct_recursion(self):
        """Log-domain construction == direct float recursion (small N
        where floats don't underflow). Ties (z saturated at 1.0 — all
        frozen anyway) may permute, so compare the induced reliability
        sequence, not the raw permutation."""
        for nb in (3, 6, 8):
            z = np.array([0.5])
            for _ in range(nb):
                new = np.empty(2 * z.size)
                new[0::2] = 2 * z - z * z
                new[1::2] = z * z
                z = new
            order = _bhattacharyya_order(nb)
            np.testing.assert_allclose(z[order], np.sort(z), atol=1e-12)

    def test_last_channel_most_reliable(self):
        code = PolarCode(64, 32)
        assert 63 in code.data_idx       # z^2 chain: best channel
        assert 0 not in code.data_idx    # 2z - z^2 chain: worst channel
        assert not code.frozen[code.data_idx].any()

    def test_validation(self):
        with pytest.raises(ValueError):
            PolarCode(100, 50)
        with pytest.raises(ValueError):
            PolarCode(64, 65)


class TestEncode:
    @pytest.mark.parametrize("n,k", [(8, 4), (64, 32), (128, 96)])
    def test_matches_dense_gn(self, n, k):
        code = PolarCode(n, k)
        rng = np.random.default_rng(n)
        bits = rng.integers(0, 2, (5, k))
        u = np.zeros((5, n), np.int64)
        u[:, code.data_idx] = bits
        want = (u @ _gn(int(np.log2(n)))) % 2
        got = code.encode(jnp.asarray(bits, jnp.int32))
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_linear(self):
        code = PolarCode(32, 16)
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.integers(0, 2, 16), jnp.int32)
        b = jnp.asarray(rng.integers(0, 2, 16), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(code.encode(a ^ b)),
            np.asarray(code.encode(a) ^ code.encode(b)))


class TestDecode:
    def test_noiseless_exact(self):
        code = PolarCode(256, 128)
        rng = np.random.default_rng(2)
        bits = jnp.asarray(rng.integers(0, 2, (8, code.k)), jnp.int32)
        cw = code.encode(bits)
        llr = 5.0 * (1.0 - 2.0 * cw.astype(jnp.float32))
        out = code.decode(llr)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        # decode_full re-encodes to the codeword
        np.testing.assert_array_equal(np.asarray(code.decode_full(llr)),
                                      np.asarray(cw))

    def test_awgn_waterfall(self):
        """BPSK over AWGN at Eb/N0 = 4 dB, rate 1/2, N=256: the raw
        channel makes hundreds of hard errors; SC cleans all of them
        (deterministic seeds)."""
        code = PolarCode(256, 128)
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (32, code.k)), jnp.int32)
        cw = code.encode(bits)
        x = 1.0 - 2.0 * cw.astype(jnp.float32)
        ebn0 = 10.0 ** (4.0 / 10.0)
        sigma2 = 1.0 / (2.0 * 0.5 * ebn0)
        noise = jnp.asarray(np.random.default_rng(33).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        y = x + noise
        raw = int(jnp.sum((y < 0).astype(jnp.int32) != cw))
        out = code.decode(2.0 * y / sigma2)
        errs = int(jnp.sum(out != bits))
        assert raw > 200, raw
        assert errs == 0, errs

    def test_jit_batched(self):
        code = PolarCode(128, 64)
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (16, code.k)), jnp.int32)
        llr = 4.0 * (1.0 - 2.0 * code.encode(bits).astype(jnp.float32))
        out = jax.jit(code.decode)(llr)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


class TestListDecode:
    def test_list1_equals_sc(self):
        """SCL with L=1 is exactly SC (same survivor at every leaf)."""
        code = PolarCode(128, 64)
        rng = np.random.default_rng(7)
        bits = jnp.asarray(rng.integers(0, 2, (24, code.k)), jnp.int32)
        x = 1.0 - 2.0 * code.encode(bits).astype(jnp.float32)
        noise = jnp.asarray(np.random.default_rng(77).normal(
            0.0, 0.8, x.shape), jnp.float32)  # noisy enough for errors
        llr = 2.0 * (x + noise) / 0.64
        np.testing.assert_array_equal(
            np.asarray(code.decode_list(llr, list_size=1)),
            np.asarray(code.decode(llr)))

    def test_noiseless_exact_and_shapes(self):
        code = PolarCode(64, 32)
        rng = np.random.default_rng(8)
        bits = jnp.asarray(rng.integers(0, 2, (3, 5, code.k)), jnp.int32)
        llr = 5.0 * (1.0 - 2.0 * code.encode(bits).astype(jnp.float32))
        out = code.decode_list(llr, list_size=4)
        assert out.shape == bits.shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    @pytest.mark.slow
    def test_list_beats_sc(self):
        """At a stressed operating point SCL-8 corrects blocks SC loses
        (never the reverse on aggregate bit errors; deterministic
        seeds)."""
        code = PolarCode(128, 64)
        rng = np.random.default_rng(9)
        bits = jnp.asarray(rng.integers(0, 2, (256, code.k)), jnp.int32)
        x = 1.0 - 2.0 * code.encode(bits).astype(jnp.float32)
        ebn0 = 10.0 ** (2.5 / 10.0)
        sigma2 = 1.0 / (2.0 * 0.5 * ebn0)
        noise = jnp.asarray(np.random.default_rng(99).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        llr = 2.0 * (x + noise) / sigma2
        sc_errs = int(jnp.sum(code.decode(llr) != bits))
        scl_errs = int(jnp.sum(code.decode_list(llr, 8) != bits))
        assert sc_errs > 0, "operating point too easy"
        assert scl_errs < sc_errs, (scl_errs, sc_errs)

    def test_crc_aided_scl(self):
        """CRC-aided selection (payload + CRC-16 inside the polar K):
        block errors strictly below plain SCL-metric selection at an
        operating point where the metric-best path is sometimes wrong."""
        from modem_tpu.fec import crc16_ccitt

        crc = crc16_ccitt()
        code = PolarCode(128, 64)
        k_data = code.k - crc.w
        rng = np.random.default_rng(10)
        data = jnp.asarray(rng.integers(0, 2, (256, k_data)), jnp.int32)
        framed = crc.append(data)
        assert framed.shape[-1] == code.k
        x = 1.0 - 2.0 * code.encode(framed).astype(jnp.float32)
        ebn0 = 10.0 ** (2.5 / 10.0)
        sigma2 = 1.0 / (2.0 * 0.5 * ebn0)
        noise = jnp.asarray(np.random.default_rng(111).normal(
            0.0, np.sqrt(sigma2), x.shape), jnp.float32)
        llr = 2.0 * (x + noise) / sigma2

        def blkerrs(out):
            return int(jnp.sum(jnp.any(out != framed, axis=-1)))

        plain = blkerrs(code.decode_list(llr, 8))
        aided = blkerrs(code.decode_list(llr, 8, crc=crc))
        assert plain > 0, "operating point too easy"
        assert aided < plain, (aided, plain)

    def test_jit(self):
        code = PolarCode(64, 32)
        rng = np.random.default_rng(11)
        bits = jnp.asarray(rng.integers(0, 2, (8, code.k)), jnp.int32)
        llr = 4.0 * (1.0 - 2.0 * code.encode(bits).astype(jnp.float32))
        out = jax.jit(lambda y: code.decode_list(y, 4))(llr)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


class TestChainIntegration:
    def test_polar_over_qpsk_chain_llrs(self):
        """Chain soft output feeds SC directly (LLR conventions agree):
        polar-coded QPSK at an SNR where the uncoded chain makes many
        errors decodes clean."""
        from modem_tpu import Rates
        from modem_tpu.chain import qpsk_reference_chain
        from modem_tpu.ops.channel import awgn

        code = PolarCode(256, 128)
        chain = qpsk_reference_chain(Rates(1250, 10000))
        rng = np.random.default_rng(5)
        data = jnp.asarray(rng.integers(0, 2, (8, code.k)), jnp.int32)
        cw = code.encode(data)
        i, q = chain.tx(cw)
        p = float(jnp.mean(i * i + q * q))
        snr = -4.0  # per waveform sample; matched filter adds ~9 dB
        ni, nq = awgn(jax.random.key(6), i, q, snr, signal_power=p)
        nv = p / (2.0 * 10.0 ** (snr / 10.0))
        llr = chain.rx_soft((ni, nq), code.n // 2, noise_var=nv)
        hard_errs = int(jnp.sum((llr < 0).astype(jnp.int32) != cw))
        out = code.decode(llr)
        errs = int(jnp.sum(out != data))
        assert hard_errs > 50, hard_errs
        assert errs == 0, errs

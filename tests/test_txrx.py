"""Fused one-way TX / RX kernels (`modem_tpu.ops.pallas_txrx`) vs the staged
chain: waveform parity, exact decisions, soft decision points, passband NCO,
QAM algebraic path, int16 wire output."""

import numpy as np
import jax.numpy as jnp
import pytest

from modem_tpu import Rates
from modem_tpu.chain import PulseShapedChain, qpsk_reference_chain
from modem_tpu.models.psk import QPSK
from modem_tpu.models.apsk import APSK, Ring
from modem_tpu.models.qam import QAM
from modem_tpu.ops.pallas_txrx import fused_tx, fused_rx, qam_mparams

RATES = Rates(1250, 10000)  # sps = 8


def _bits(rng, channels, n_symbols, bps):
    return jnp.asarray(
        rng.integers(0, 2, (channels, n_symbols * bps)).astype(np.int32))


@pytest.fixture(scope="module")
def qpsk_chain():
    return qpsk_reference_chain(RATES)


def test_tx_fused_matches_staged(qpsk_chain):
    ch = qpsk_chain
    bits = _bits(np.random.default_rng(0), 3, 500, 2)
    si, sq = ch.tx(bits)
    fi, fq = ch.tx_fused(bits)
    assert fi.shape == si.shape
    np.testing.assert_allclose(fi, si, atol=1e-6)
    np.testing.assert_allclose(fq, sq, atol=1e-6)


def test_rx_fused_matches_staged(qpsk_chain):
    ch = qpsk_chain
    bits = _bits(np.random.default_rng(1), 3, 500, 2)
    wave = ch.tx(bits)
    assert jnp.array_equal(ch.rx_fused(wave, 500), ch.rx(wave, 500))


def test_fused_tx_to_fused_rx_roundtrip(qpsk_chain):
    ch = qpsk_chain
    bits = _bits(np.random.default_rng(2), 2, 700, 2)
    assert jnp.array_equal(ch.rx_fused(ch.tx_fused(bits), 700), bits)


def test_bf16_wave_io_decisions_exact(qpsk_chain):
    """bf16 waveform storage (half the HBM crossing cost): values round
    once at the TX write, decisions through the matched filter are
    unchanged, and the RX accepts bf16 directly (in-kernel upcast)."""
    ch = qpsk_chain
    bits = _bits(np.random.default_rng(7), 3, 600, 2)
    bi, bq = ch.tx_fused(bits, wave_dtype=jnp.bfloat16)
    assert bi.dtype == jnp.bfloat16 and bq.dtype == jnp.bfloat16
    fi, fq = ch.tx_fused(bits)
    # one bf16 rounding of the f32 kernel output, nothing else
    np.testing.assert_array_equal(
        np.asarray(bi), np.asarray(fi.astype(jnp.bfloat16)))
    # decisions identical to the f32 path (clean waveform)
    assert jnp.array_equal(ch.rx_fused((bi, bq), 600), bits)
    assert jnp.array_equal(ch.rx_fused((bi, bq), 600),
                           ch.rx_fused((fi, fq), 600))


def test_soft_decision_points(qpsk_chain):
    ch = qpsk_chain
    bits = _bits(np.random.default_rng(3), 2, 300, 2)
    wave = ch.tx(bits)
    llr_staged = ch.rx_soft(wave, 300, noise_var=0.5)
    llr_fused = ch.rx_soft_fused(wave, 300, noise_var=0.5)
    np.testing.assert_allclose(llr_fused, llr_staged, atol=1e-4)
    # sign of LLR == hard decision on every bit
    assert jnp.array_equal((llr_fused < 0).astype(jnp.int32),
                           ch.rx(wave, 300))


def test_passband_tx_rx():
    ch = PulseShapedChain(QPSK(0.0, 1.0), RATES, carrier_hz=2000)
    bits = _bits(np.random.default_rng(4), 2, 400, 2)
    x_staged = ch.tx(bits)
    x_fused = ch.tx_fused(bits)
    np.testing.assert_allclose(x_fused, x_staged, atol=1e-5)
    assert jnp.array_equal(ch.rx_fused(x_fused, 400), bits)
    assert jnp.array_equal(ch.rx_fused(x_staged, 400), ch.rx(x_staged, 400))


def test_qam256_algebraic_path():
    ch = PulseShapedChain(QAM(8, 0.0, 1.0), RATES)
    bits = _bits(np.random.default_rng(5), 2, 300, 8)
    si, sq = ch.tx(bits)
    fi, fq = ch.tx_fused(bits)
    np.testing.assert_allclose(fi, si, atol=1e-6)
    assert jnp.array_equal(ch.rx_fused((fi, fq), 300), bits)


def test_apsk_lut_path():
    ch = PulseShapedChain(
        APSK(1.0, 4, [Ring(0, 4, 0.5, np.pi / 4),
                      Ring(4, 16, 1.0, np.pi / 12)]), RATES)
    bits = _bits(np.random.default_rng(6), 2, 300, 4)
    assert jnp.array_equal(ch.rx_fused(ch.tx_fused(bits), 300), bits)


def test_int16_wire_output(qpsk_chain):
    ch = qpsk_chain
    bits = _bits(np.random.default_rng(7), 2, 200, 2)
    fi, fq = ch.tx_fused(bits)
    xi, xq = ch.tx_fused(bits, out_scale=16384.0)
    assert xi.dtype == jnp.int16
    np.testing.assert_array_equal(
        np.asarray(xi), np.round(np.asarray(fi) * 16384.0).astype(np.int16))
    # quantized waveform still decodes exactly after rescale
    dec = ch.rx_fused((xi.astype(jnp.float32) / 16384.0,
                       xq.astype(jnp.float32) / 16384.0), 200)
    assert jnp.array_equal(dec, bits)


def test_batch_shape_and_short_blocks(qpsk_chain):
    ch = qpsk_chain
    bits = _bits(np.random.default_rng(8), 1, 40, 2).reshape(40 * 2)
    wave = ch.tx_fused(bits)
    assert wave[0].shape == ((40 + ch.span) * ch.sps,)
    assert jnp.array_equal(ch.rx_fused(wave, 40), bits)


def test_rx_rejects_short_waveform(qpsk_chain):
    ch = qpsk_chain
    with pytest.raises(ValueError, match="shorter"):
        fused_rx((jnp.zeros((100,)), jnp.zeros((100,))), 50, ch.lut,
                 np.asarray(ch.rrc), ch.sps, ch.span)


def test_tx_arg_validation(qpsk_chain):
    ch = qpsk_chain
    syms = jnp.zeros((1, 32), jnp.int32)
    with pytest.raises(ValueError, match="exactly one"):
        fused_tx(syms, ch.lut, np.asarray(ch.rrc), ch.sps, ch.span,
                 qam_params=qam_mparams(4, 0.0, 1.0))
    with pytest.raises(ValueError, match="taps length"):
        fused_tx(syms, ch.lut, np.ones(7, np.float32), ch.sps, ch.span)


# ---- one-way fused paths for the FSK / MSK / DMPSK families ----

class TestFskOneWay:
    def _chain(self):
        from modem_tpu import make_scheme
        from modem_tpu.chain import FskChain
        from modem_tpu.config import TWO_PI

        scheme = make_scheme("mfsk", RATES)
        coefs = 2 * np.arange(16)  # IncreaseMap, `modulate.rs:84`
        return FskChain(scheme, RATES, coefs, TWO_PI * 50 / 10000)

    def test_tx_fused_matches_staged(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(30), 2, 300, 4)
        si, sq = ch.tx(bits)
        fi, fq = ch.tx_fused(bits)
        np.testing.assert_allclose(fi, si, atol=1e-5)
        np.testing.assert_allclose(fq, sq, atol=1e-5)

    def test_rx_fused_matches_staged(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(31), 2, 300, 4)
        i, q = ch.tx(bits)
        assert jnp.array_equal(ch.rx_fused(i, q), ch.rx(i, q))

    def test_fused_pipeline_exact(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(32), 2, 400, 4)
        assert jnp.array_equal(ch.rx_fused(*ch.tx_fused(bits)), bits)

    def test_soft_signs_match_hard(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(33), 2, 200, 4)
        i, q = ch.tx_fused(bits)
        llr = ch.rx_soft_fused(i, q, noise_var=1e-3)
        staged = ch.rx_soft(i, q, noise_var=1e-3)
        np.testing.assert_allclose(llr, staged, atol=1e-2)
        assert jnp.array_equal((llr < 0).astype(jnp.int32), ch.rx_fused(i, q))


class TestMskOneWay:
    def test_tx_fused_matches_staged(self):
        from modem_tpu.chain import MskChain

        ch = MskChain(RATES)
        bits = _bits(np.random.default_rng(34), 2, 300, 2)
        si, sq = ch.tx(bits)
        fi, fq = ch.tx_fused(bits)
        np.testing.assert_allclose(fi, si, atol=1e-5)
        np.testing.assert_allclose(fq, sq, atol=1e-5)

    def test_pipeline_and_staged_rx(self):
        from modem_tpu.chain import MskChain

        ch = MskChain(RATES)
        bits = _bits(np.random.default_rng(35), 2, 400, 2)
        i, q = ch.tx_fused(bits)
        assert jnp.array_equal(ch.rx_fused(i, q), bits)
        assert jnp.array_equal(ch.rx_fused(i, q), ch.rx(i, q))


class TestDmpskOneWay:
    def _chain(self):
        from modem_tpu import make_scheme
        from modem_tpu.chain import DifferentialChain

        return DifferentialChain(make_scheme("dqpsk", RATES), RATES)

    def test_tx_fused_matches_staged(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(36), 2, 300, 2)
        si, sq = ch.tx(bits)
        fi, fq = ch.tx_fused(bits)
        np.testing.assert_allclose(fi, si, atol=1e-5)
        np.testing.assert_allclose(fq, sq, atol=1e-5)

    def test_rx_fused_matches_staged(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(37), 2, 300, 2)
        wave = ch.tx(bits)
        assert jnp.array_equal(ch.rx_fused(wave, 300), ch.rx(wave, 300))

    def test_fused_pipeline_exact(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(38), 2, 400, 2)
        assert jnp.array_equal(ch.rx_fused(ch.tx_fused(bits), 400), bits)

    def test_soft_matches_staged(self):
        ch = self._chain()
        bits = _bits(np.random.default_rng(39), 2, 200, 2)
        wave = ch.tx(bits)
        llr_f = ch.rx_soft_fused(wave, 200, noise_var=0.3)
        llr_s = ch.rx_soft(wave, 200, noise_var=0.3)
        np.testing.assert_allclose(llr_f, llr_s, atol=1e-4)
        assert jnp.array_equal((llr_f < 0).astype(jnp.int32),
                               ch.rx_fused(wave, 200))

"""Pallas kernels vs their XLA reference formulations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import PulseShapedChain, qpsk_reference_chain
from modem_tpu.models.apsk import APSK, Ring
from modem_tpu.models.qam import QAM
from modem_tpu.ops.pallas_chain import fused_pulse_chain
from modem_tpu.ops.pallas_fir import pallas_fir
from modem_tpu.utils.bits import pack_bits

RATES = Rates(baud_rate=1250, sample_rate=10000)


class TestPallasFir:
    @pytest.mark.parametrize("shape,ntaps", [
        ((4, 500), 65), ((300,), 33), ((2, 3, 200), 17), ((4, 100), 1),
    ])
    def test_matches_convolve(self, shape, ntaps):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        taps = rng.normal(size=ntaps).astype(np.float32)
        y, _ = pallas_fir(x, taps)
        ref = np.apply_along_axis(
            lambda v: np.convolve(v, taps)[: v.shape[0]], -1, np.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)

    def test_streaming_state(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 96)), jnp.float32)
        taps = rng.normal(size=17).astype(np.float32)
        full, _ = pallas_fir(x, taps)
        y1, st = pallas_fir(x[:, :48], taps)
        y2, _ = pallas_fir(x[:, 48:], taps, st)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2], -1)), np.asarray(full),
            atol=1e-5,
        )

    def test_taps_exceed_chunk(self):
        with pytest.raises(ValueError):
            pallas_fir(jnp.zeros((8,)), np.ones(20, np.float32), chunk=16)


class TestFusedChain:
    @pytest.mark.parametrize("make", [
        lambda: qpsk_reference_chain(RATES),
        lambda: PulseShapedChain(QAM(4, 0.0, 6.0), RATES),
        lambda: PulseShapedChain(
            APSK(1.0, 4, [Ring(0, 4, 0.5, np.pi / 4),
                          Ring(4, 16, 1.0, np.pi / 12)]), RATES),
    ])
    def test_matches_staged_chain(self, make):
        chain = make()
        bps = chain.scheme.bits_per_symbol
        rng = np.random.default_rng(2)
        bits = jnp.asarray(rng.integers(0, 2, (5, 600 * bps)), jnp.int32)
        fused = chain.roundtrip_fused(bits)
        staged = chain.roundtrip(bits)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(staged))
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(bits))

    def test_multi_tile_grid(self):
        """Symbol counts spanning several time tiles, channel padding."""
        chain = qpsk_reference_chain(RATES)
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (3, 2 * 1100)), jnp.int32)
        out = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_rejects_big_lut(self):
        syms = jnp.zeros((4, 64), jnp.int32)
        with pytest.raises(ValueError):
            fused_pulse_chain(syms, np.zeros((256, 2)), np.zeros(65), 8, 8)

    @pytest.mark.parametrize("bps,phase", [(8, 0.0), (4, 0.3), (8, 0.7)])
    def test_qam_algebraic_path(self, bps, phase):
        """256-QAM (and rotated QAM) through the O(1)-in-M fused path."""
        chain = PulseShapedChain(QAM(bps, phase, 6.0), RATES)
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (3, 300 * bps)), jnp.int32)
        fused = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(fused),
                                      np.asarray(chain.roundtrip(bits)))
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(bits))


class TestFusedPassband:
    """In-kernel NCO passband loop vs the staged passband chain."""

    @pytest.mark.parametrize("make", [
        lambda: qpsk_reference_chain(RATES.__class__(1250, 10000)),
        lambda: PulseShapedChain(QAM(4, 0.0, 6.0), RATES, carrier_hz=2000),
        lambda: PulseShapedChain(QAM(8, 0.3, 6.0), RATES, carrier_hz=1000),
    ])
    def test_matches_staged_passband(self, make):
        chain = make()
        if chain.carrier_hz is None:
            chain.carrier_hz = 2000  # qpsk factory has no carrier arg
        bps = chain.scheme.bits_per_symbol
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, (3, 400 * bps)), jnp.int32)
        fused = chain.roundtrip_fused(bits)
        staged = chain.roundtrip(bits)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(staged))
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(bits))

    def test_multi_tile_passband(self):
        chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES, carrier_hz=2000)
        rng = np.random.default_rng(6)
        bits = jnp.asarray(rng.integers(0, 2, (2, 4 * 1100)), jnp.int32)
        out = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_sym_offset_shifts_nco(self):
        """A nonzero sym_offset must reproduce the same decisions as slicing
        a longer stream at that offset (NCO phase stays stream-global)."""
        chain = qpsk_reference_chain(RATES)
        chain.carrier_hz = 2000
        sps, span = chain.sps, chain.span
        rng = np.random.default_rng(7)
        syms = jnp.asarray(rng.integers(0, 4, (2, 96)), jnp.int32)
        off = 32
        dec = fused_pulse_chain(
            syms, chain.lut, np.asarray(chain.rrc), sps, span,
            carrier_hz=2000, sample_rate=RATES.sample_rate, sym_offset=off,
        )
        # reference: same symbols embedded at `off` in a longer stream whose
        # NCO starts at 0; decisions for the embedded region must agree
        # (leading region is zero-IQ sentinel in both cases)
        longer = jnp.concatenate(
            [jnp.full((2, off), -1, jnp.int32), syms], axis=-1
        )
        dec_long = fused_pulse_chain(
            longer, chain.lut, np.asarray(chain.rrc), sps, span,
            carrier_hz=2000, sample_rate=RATES.sample_rate,
        )
        np.testing.assert_array_equal(
            np.asarray(dec), np.asarray(dec_long[..., off:])
        )

    @pytest.mark.slow
    def test_streaming_passband_matches_oneshot(self):
        from modem_tpu.streaming import StreamingFusedChain

        chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES, carrier_hz=2000)
        bps = 4
        rng = np.random.default_rng(8)
        n_sym = 160
        bits = rng.integers(0, 2, (2, n_sym * bps)).astype(np.int32)
        one = np.asarray(chain.roundtrip_fused(jnp.asarray(bits)))
        stream = StreamingFusedChain(chain, batch_shape=(2,))
        outs, start = [], 0
        for blk in (50, 17, 61, 32):
            outs.append(np.asarray(
                stream.push(jnp.asarray(bits[:, start * bps:
                                             (start + blk) * bps]))))
            start += blk
        outs.append(np.asarray(stream.flush()))
        np.testing.assert_array_equal(np.concatenate(outs, -1), one)

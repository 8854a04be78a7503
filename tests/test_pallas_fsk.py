"""Fused FSK chain kernel vs the staged FskChain (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu import Rates, make_scheme
from modem_tpu.chain import FskChain
from modem_tpu.models.fsk import CPFSK
from modem_tpu.ops.pallas_fsk import fused_fsk_chain
from modem_tpu.utils.bits import unpack_symbols

RATES = Rates(baud_rate=1250, sample_rate=10000)


def _syms(scheme, k, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    m = 1 << scheme.bits_per_symbol
    return jnp.asarray(rng.integers(0, m, (channels, k)), jnp.int32)


class TestFusedFsk:
    @pytest.mark.parametrize("make", [
        lambda: make_scheme("mfsk", RATES),
        lambda: make_scheme("bfsk", RATES),
        lambda: CPFSK(2, RATES, 1.0, 1),
    ])
    def test_noiseless_exact(self, make):
        scheme = make()
        syms = _syms(scheme, 600)
        dec = fused_fsk_chain(syms, scheme, RATES)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(syms))

    def test_matches_staged_chain(self):
        scheme = make_scheme("mfsk", RATES)
        chain = FskChain(scheme, RATES, 2 * np.arange(16),
                         dev_rad_per_sample=2 * np.pi * 50 / 10000)
        syms = _syms(scheme, 300, seed=2)
        bits = unpack_symbols(syms, scheme.bits_per_symbol)
        staged = chain.roundtrip(bits)
        fused_bits = unpack_symbols(
            fused_fsk_chain(syms, scheme, RATES), scheme.bits_per_symbol
        )
        np.testing.assert_array_equal(np.asarray(fused_bits),
                                      np.asarray(staged))

    def test_multi_tile(self):
        scheme = make_scheme("bfsk", RATES)
        syms = _syms(scheme, 1100, channels=2, seed=3)
        dec = fused_fsk_chain(syms, scheme, RATES)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(syms))

    def test_nyquist_guard(self):
        with pytest.raises(ValueError):
            fused_fsk_chain(_syms(make_scheme("16cpfsk", RATES), 64),
                            make_scheme("16cpfsk", RATES), RATES)

    def test_guard_required(self):
        scheme = make_scheme("bfsk", RATES)
        with pytest.raises(ValueError):
            fused_fsk_chain(_syms(scheme, 64), scheme, RATES, guard=0)


class TestTimeShardedFusedFsk:
    @pytest.mark.parametrize("name", ["mfsk", "bfsk"])
    def test_matches_single_device(self, name):
        from modem_tpu.parallel import (
            make_modem_mesh, time_sharded_fsk_roundtrip_fn,
        )
        from modem_tpu.utils.bits import unpack_symbols

        scheme = make_scheme(name, RATES)
        mesh = make_modem_mesh(ch=2, time=4)
        fn = time_sharded_fsk_roundtrip_fn(scheme, RATES, mesh)
        syms = _syms(scheme, 128, channels=4, seed=9)
        bits = unpack_symbols(syms, scheme.bits_per_symbol)
        out = fn(bits, 0)
        single = unpack_symbols(
            fused_fsk_chain(syms, scheme, RATES), scheme.bits_per_symbol
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(single))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_1d_stream_small_chunk(self):
        from modem_tpu.parallel import (
            make_modem_mesh, time_sharded_fsk_roundtrip_fn,
        )
        from modem_tpu.utils.bits import unpack_symbols

        scheme = make_scheme("bfsk", RATES)
        mesh = make_modem_mesh(ch=1, time=8)
        fn = time_sharded_fsk_roundtrip_fn(scheme, RATES, mesh, chunk_sym=32)
        syms = _syms(scheme, 256, channels=3, seed=12)[0]
        bits = unpack_symbols(syms, 1)
        np.testing.assert_array_equal(np.asarray(fn(bits, 0)),
                                      np.asarray(bits))

    def test_guard_bounds(self):
        from modem_tpu.ops.pallas_fsk import fsk_decide_from_program
        import jax.numpy as jnp

        with pytest.raises(ValueError):
            fsk_decide_from_program(jnp.zeros((8,), jnp.int32),
                                    jnp.zeros((8,), jnp.int32),
                                    (0, 1), 10000, 8, 1.0, 0.0, guard=8)

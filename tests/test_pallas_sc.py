"""Fused Pallas SC vs the XLA traced-tree decoder: exact-equality.

Same standard as every fused kernel here (SURVEY.md section 4) and the
sibling SCL suite: bit-identical decisions. SC has no list machinery,
so the interpret-mode tracing cost is far lower than SCL's — full
trees up to N=64 are cheap on the CPU mesh; the production (256,128)
is parity-gated and benched on the chip (bench_fec.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu.fec import PolarCode, RateMatchedPolar


def _noisy(code, rng, b, sigma=1.0):
    bits = rng.integers(0, 2, (b, code.k))
    cw = np.asarray(code.encode(jnp.asarray(bits, jnp.int32)))
    llr = (1.0 - 2.0 * cw) * 2.0 + rng.normal(0, sigma, cw.shape)
    return bits, jnp.asarray(llr, jnp.float32)


class TestFullTreeParity:
    @pytest.mark.parametrize("n,k", [(16, 8), (32, 20), (64, 32)])
    def test_exact_vs_xla(self, n, k):
        code = PolarCode(n, k)
        rng = np.random.default_rng(n)
        _, llr = _noisy(code, rng, 201)
        ref = code.decode(llr, backend="xla")
        got = code.decode(llr, backend="pallas", interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_noiseless_roundtrip_batch_shape(self):
        code = PolarCode(32, 16)
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, (3, 7, code.k))
        cw = code.encode(jnp.asarray(bits, jnp.int32))
        llr = (1.0 - 2.0 * cw).astype(jnp.float32) * 3.0
        got = code.decode(llr, backend="pallas", interpret=True)
        assert got.shape == (3, 7, code.k)
        np.testing.assert_array_equal(np.asarray(got), bits)


class TestHybridDispatch:
    def test_subtree_kernels_under_xla_top_levels(self):
        code = PolarCode(64, 32)
        rng = np.random.default_rng(2)
        _, llr = _noisy(code, rng, 77)
        ref = code.decode(llr, backend="xla")
        for kw in (8, 16):
            got = code.decode(llr, backend="pallas", kernel_w=kw,
                              interpret=True)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(ref))

    def test_all_frozen_subtree_stays_xla(self):
        code = PolarCode(16, 4)
        assert bool(code.frozen[:8].all())
        rng = np.random.default_rng(3)
        _, llr = _noisy(code, rng, 33)
        ref = code.decode(llr, backend="xla")
        got = code.decode(llr, backend="pallas", kernel_w=8,
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestRateMatched:
    def test_backend_passthrough(self):
        rm = RateMatchedPolar(20, 48, n=64, mode="shorten")
        rng = np.random.default_rng(4)
        bits = rng.integers(0, 2, (40, rm.k))
        tx = np.asarray(rm.encode(jnp.asarray(bits, jnp.int32)))
        llr = jnp.asarray((1.0 - 2.0 * tx) * 2.0
                          + rng.normal(0, 0.4, tx.shape), jnp.float32)
        ref = np.asarray(rm.decode(llr, backend="xla"))
        got = np.asarray(rm.decode(llr, backend="pallas", interpret=True))
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got, bits)


class TestGuards:
    def test_bad_kernel_w(self):
        code = PolarCode(16, 8)
        llr = jnp.ones((2, 16), jnp.float32)
        with pytest.raises(ValueError, match="kernel_w"):
            code.decode(llr, backend="pallas", kernel_w=0, interpret=True)

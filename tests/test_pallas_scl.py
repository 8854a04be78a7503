"""Fused Pallas CA-SCL vs the XLA traced-tree decoder: exact-equality.

The kernel reproduces `PolarCode._scl`'s arithmetic decision for
decision (same frozen-leaf penalties, same f/g updates, same candidate
metric construction, and a bitonic selection network ordered exactly
like ``lax.top_k`` including its lower-index-wins tie rule), so the
gate is bit-identical decoded bits — the same standard every fused
kernel in this package is held to (SURVEY.md section 4). Runs in
interpreter mode on the CPU test mesh; the identical code path compiles
for the chip (tests/test_harness_tpu.py pattern / bench_fec.py).

Codes here are kept small (N <= 32) and share PolarCode instances so
the jit cache is hit across tests: interpret-mode TRACING of the
unrolled tree is the cost (N=16 ~20 s, N=32 ~70 s, N=64 ~135 s; the
evaluated kernel itself runs in ms), and the parity property is
width-independent — the production (256,128) is parity-gated and
benched on the chip (bench_fec.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu.fec.crc import Crc
from modem_tpu.fec.polar import PolarCode

pytestmark = pytest.mark.slow  # tracing the unrolled SCL tree costs 20-70s per code


def _noisy(code, rng, b, snr=1.0):
    bits = rng.integers(0, 2, (b, code.k))
    cw = np.asarray(code.encode(jnp.asarray(bits, jnp.int32)))
    llr = (1.0 - 2.0 * cw) * 2.0 + rng.normal(0, snr, cw.shape)
    return bits, jnp.asarray(llr, jnp.float32)


class TestFullTreeParity:
    @pytest.mark.parametrize("n,k", [(16, 8), (32, 20)])
    def test_exact_vs_xla(self, n, k):
        code = PolarCode(n, k)
        rng = np.random.default_rng(n)
        _, llr = _noisy(code, rng, 37)
        ref = code.decode_list(llr, 8, backend="xla")
        got = code.decode_list(llr, 8, backend="pallas", interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_noiseless_roundtrip(self):
        code = PolarCode(16, 8)
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, (11, code.k))
        cw = code.encode(jnp.asarray(bits, jnp.int32))
        llr = (1.0 - 2.0 * cw).astype(jnp.float32) * 3.0
        got = code.decode_list(llr, 8, backend="pallas", interpret=True)
        np.testing.assert_array_equal(np.asarray(got), bits)

    def test_batch_shape_roundtrip(self):
        code = PolarCode(16, 8)
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, (3, 5, code.k))
        cw = code.encode(jnp.asarray(bits, jnp.int32))
        llr = (1.0 - 2.0 * cw).astype(jnp.float32) * 3.0
        got = code.decode_list(llr, 8, backend="pallas", interpret=True)
        assert got.shape == (3, 5, code.k)
        np.testing.assert_array_equal(np.asarray(got), bits)


class TestHybridDispatch:
    def test_subtree_kernel_under_xla_top_levels(self):
        """kernel_w < N leaves the top tree levels in XLA and fuses each
        width-kernel_w subtree — still bit-identical (the fallback mode
        if a bigger code's unrolled tree outgrows Mosaic)."""
        code = PolarCode(32, 20)
        rng = np.random.default_rng(3)
        _, llr = _noisy(code, rng, 19)
        ref = code.decode_list(llr, 8, backend="xla")
        # kw=8 is the deep case: two XLA recursion levels above four
        # w=8 subtree kernels. (kw=16 adds ~80 s of interpret tracing
        # for a shallower composition; skipped.)
        got = code.decode_list(llr, 8, backend="pallas",
                               kernel_w=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_all_frozen_subtree_stays_xla(self):
        """(16,4) with kw=8: the first w=8 subtree is ALL frozen, so the
        dispatch rule keeps it in the cheap XLA form (no reorder can
        happen there) and only the second subtree runs in the kernel —
        the mixed XLA/kernel path, still bit-identical."""
        code = PolarCode(16, 4)
        assert bool(code.frozen[:8].all())
        rng = np.random.default_rng(7)
        _, llr = _noisy(code, rng, 13)
        ref = code.decode_list(llr, 8, backend="xla")
        got = code.decode_list(llr, 8, backend="pallas",
                               kernel_w=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestCrcAided:
    def test_crc_aided_exact_vs_xla(self):
        code = PolarCode(32, 20)  # full-tree kernel shared w/ parity test
        crc = Crc(8, 0x07)
        rng = np.random.default_rng(4)
        data = rng.integers(0, 2, (23, code.k - crc.w))
        framed = crc.append(jnp.asarray(data, jnp.int32))
        cw = np.asarray(code.encode(framed))
        llr = jnp.asarray((1.0 - 2.0 * cw) * 2.0
                          + rng.normal(0, 1.2, cw.shape), jnp.float32)
        ref = code.decode_list(llr, 8, crc=crc, backend="xla")
        got = code.decode_list(llr, 8, crc=crc, backend="pallas",
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestTieBreaking:
    def test_equal_metric_candidates_pick_topk_order(self):
        """Engineered metric ties: |LLR| values collide by construction
        (integer magnitudes), so 2L candidate lists contain exact f32
        ties — the bitonic network must reproduce lax.top_k's
        lower-candidate-index-first rule to stay bit-identical."""
        code = PolarCode(16, 8)
        rng = np.random.default_rng(5)
        sign = 1.0 - 2.0 * rng.integers(0, 2, (64, code.n))
        mag = rng.integers(0, 3, (64, code.n)).astype(np.float64)
        llr = jnp.asarray(sign * mag, jnp.float32)
        ref = code.decode_list(llr, 8, backend="xla")
        got = code.decode_list(llr, 8, backend="pallas", interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestGuards:
    def test_non8_list_rejected(self):
        code = PolarCode(16, 8)
        llr = jnp.ones((2, 16), jnp.float32)
        with pytest.raises(ValueError, match="list_size 8"):
            code.decode_list(llr, 4, backend="pallas", interpret=True)

    def test_xla_backend_unchanged_for_other_lists(self):
        code = PolarCode(16, 8)
        rng = np.random.default_rng(6)
        _, llr = _noisy(code, rng, 5)
        out = code.decode_list(llr, 4, backend="xla")
        assert out.shape == (5, code.k)

"""Fused Pallas BCJR vs the XLA windowed turbo decoder: equality gates.

The kernel reproduces `fec/turbo.TurboCode._bcjr_windowed`'s live-path
arithmetic value for value at the same (window, guard) — the only
divergence is the cost assigned to branches that leave dead (pinned-off)
states, which can never decide a max — so the gate is exact extrinsic
equality, and full turbo decodes are gated bit-identical. Runs in
interpreter mode on the CPU test mesh; the identical code path compiles
for the chip.
"""

import numpy as np

import jax.numpy as jnp

from modem_tpu.fec.turbo import TurboCode
from modem_tpu.ops.pallas_bcjr import bcjr_windowed, pick_guard


def _case(k=256, cws=3, sigma=0.8, seed=0):
    tc = TurboCode(k, iters=4)
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (cws, k))
    cw = np.asarray(tc.encode(jnp.asarray(bits, jnp.int32)))
    llr = (1.0 - 2.0 * cw) * 2.0 + rng.normal(0, sigma, cw.shape)
    return tc, bits, jnp.asarray(llr, jnp.float32)


class TestHalfIteration:
    def test_extrinsic_exact_vs_xla(self):
        tc, _, llr = _case()
        k = tc.k
        ls = llr[..., :k]
        lp1 = llr[..., k:2 * k]
        t1s = llr[..., 3 * k:3 * k + 3]
        t1p = llr[..., 3 * k + 3:3 * k + 6]
        la = jnp.zeros_like(ls)
        g = pick_guard(64, 32)
        ref = tc._bcjr_windowed(ls, lp1, la, t1s, t1p, window=64, guard=g)
        got = bcjr_windowed(ls, lp1, la, t1s, t1p, window=64, guard=g)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_extrinsic_exact_with_apriori(self):
        tc, _, llr = _case(seed=1)
        k = tc.k
        ls = llr[..., :k]
        lp1 = llr[..., k:2 * k]
        t1s = llr[..., 3 * k:3 * k + 3]
        t1p = llr[..., 3 * k + 3:3 * k + 6]
        rng = np.random.default_rng(2)
        la = jnp.asarray(rng.normal(0, 1.5, ls.shape), jnp.float32)
        g = pick_guard(128, 32)
        ref = tc._bcjr_windowed(ls, lp1, la, t1s, t1p, window=128, guard=g)
        got = bcjr_windowed(ls, lp1, la, t1s, t1p, window=128, guard=g)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestFullDecode:
    def test_decode_bits_exact_vs_xla_windowed(self):
        tc, bits, llr = _case(sigma=0.7, seed=3)
        g = pick_guard(64, 32)
        ref = tc.decode(llr, window=64, guard=g, backend="xla")
        got = tc.decode(llr, window=64, guard=g, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_decode_corrects_errors(self):
        tc, bits, llr = _case(sigma=0.9, seed=4)
        hard = (np.asarray(llr[..., :tc.k]) < 0).astype(np.int64)
        assert (hard != bits).sum() > 0, "test channel too clean"
        got = tc.decode(llr, window=64, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), bits)

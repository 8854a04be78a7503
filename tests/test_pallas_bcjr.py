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


class TestGeometry:
    """Round-5 geometry solver: single-window exact-BCJR by default."""

    def test_single_window_covers_trellis(self):
        from modem_tpu.ops.pallas_bcjr import pick_geometry
        for t in (515, 1027, 2051):
            w, g, chunk = pick_geometry(t, 32)
            assert w >= t                       # one window, no interior cuts
            assert g >= 32
            assert chunk % 3 == 0
            assert (w + 2 * g) % chunk == 0

    def test_large_stream_falls_back_to_multiwindow(self):
        from modem_tpu.ops.pallas_bcjr import _TW_CAP, pick_geometry
        w, g, chunk = pick_geometry(6147, 32)
        assert w < 6147 and w + 2 * g <= _TW_CAP
        assert chunk % 3 == 0 and (w + 2 * g) % chunk == 0

    def test_pick_chunk_divides_and_aligns(self):
        from modem_tpu.ops.pallas_bcjr import _pick_chunk
        for tw in (324, 1092, 1050, 2112):
            c = _pick_chunk(tw)
            assert tw % c == 0 and c % 3 == 0 and 12 <= c <= 150

    def test_auto_geometry_matches_explicit_window(self):
        """window=None (single window) is bit-identical to the same
        (window, guard) passed explicitly — geometry is value-neutral."""
        import numpy as np
        import jax.numpy as jnp
        from modem_tpu.fec import TurboCode
        from modem_tpu.ops.pallas_bcjr import bcjr_windowed, pick_geometry

        turbo = TurboCode(40)
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, (64, 40)), jnp.int32)
        c = turbo.encode(bits)
        lam = jnp.asarray(
            (1.0 - 2.0 * np.asarray(c)) * 4.0
            + rng.normal(0, 1.0, c.shape), jnp.float32)
        k = turbo.k
        ls, lp = lam[..., :k], lam[..., k:2 * k]
        ts = lam[..., 3 * k:3 * k + 3]
        tp = lam[..., 3 * k + 3:3 * k + 6]
        la = jnp.zeros_like(ls)
        w, g, _ = pick_geometry(k + 3, 32)
        auto = bcjr_windowed(ls, lp, la, ts, tp, None, 32, interpret=True)
        expl = bcjr_windowed(ls, lp, la, ts, tp, w, g, interpret=True)
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(expl))

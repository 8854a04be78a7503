"""Unit tests for the shared blind-sync kernels (ops/sync_metric.py).

The higher-level behavior (coarse metric shape, CFO extraction, full
blind acquisition) is covered by tests/test_ofdm.py and tests/test_scfde.py;
here the gather-free aligned-frame extractor is pinned against plain
NumPy slicing — it must be EXACTLY the gather it replaces.
"""

import numpy as np
import jax.numpy as jnp

from modem_tpu.ops.sync_metric import (aligned_frame_matmul,
                                       template_correlate_fir)


class TestAlignedFrameMatmul:
    def _check(self, rng, batch, t, out_len, max_lag, starts=None):
        ci = rng.standard_normal(batch + (t,)).astype(np.float32)
        cq = rng.standard_normal(batch + (t,)).astype(np.float32)
        if starts is None:
            starts = rng.integers(0, max_lag, batch)
        starts = np.asarray(starts, np.int32).reshape(batch)
        fi, fq = aligned_frame_matmul(jnp.asarray(ci), jnp.asarray(cq),
                                      jnp.asarray(starts), out_len, max_lag)
        assert fi.shape == batch + (out_len,)
        # reference: zero-pad then slice per batch element
        pad = max_lag + out_len
        cip = np.concatenate([ci, np.zeros(batch + (pad,), np.float32)],
                             axis=-1)
        cqp = np.concatenate([cq, np.zeros(batch + (pad,), np.float32)],
                             axis=-1)
        for idx in np.ndindex(*batch):
            s = int(starts[idx])
            np.testing.assert_array_equal(
                np.asarray(fi)[idx], cip[idx][s:s + out_len])
            np.testing.assert_array_equal(
                np.asarray(fq)[idx], cqp[idx][s:s + out_len])

    def test_random_starts_exact(self):
        rng = np.random.default_rng(0)
        self._check(rng, (5,), 700, 480, 96)

    def test_edge_starts(self):
        rng = np.random.default_rng(1)
        self._check(rng, (2,), 640, 500, 96, starts=[0, 95])

    def test_out_len_not_multiple_of_lag(self):
        rng = np.random.default_rng(2)
        self._check(rng, (3,), 777, 531, 64)

    def test_short_input_zero_padded(self):
        # input shorter than start + out_len: tail must read as silence
        rng = np.random.default_rng(3)
        self._check(rng, (4,), 300, 290, 32)

    def test_2d_batch(self):
        rng = np.random.default_rng(4)
        self._check(rng, (2, 3), 512, 400, 48)


class TestTemplateCorrelateHeadSlice:
    def test_payload_tail_cannot_affect_lags(self):
        """The head-only optimization is bit-identical: rewriting the
        capture past max_lag + P - 1 must not change any output lag."""
        rng = np.random.default_rng(5)
        t, p, max_lag = 900, 240, 96
        ci = rng.standard_normal((2, t)).astype(np.float32)
        cq = rng.standard_normal((2, t)).astype(np.float32)
        tpl_i = rng.standard_normal(p).astype(np.float32)
        tpl_q = rng.standard_normal(p).astype(np.float32)
        a = template_correlate_fir(jnp.asarray(ci), jnp.asarray(cq),
                                   tpl_i, tpl_q, max_lag)
        ci2 = ci.copy()
        cq2 = cq.copy()
        ci2[:, max_lag + p - 1:] = 7.0
        cq2[:, max_lag + p - 1:] = -3.0
        b = template_correlate_fir(jnp.asarray(ci2), jnp.asarray(cq2),
                                   tpl_i, tpl_q, max_lag)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

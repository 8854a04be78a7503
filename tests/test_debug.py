"""debug utilities: finite checks and halo consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu.debug import assert_finite, finite_fraction, halo_mismatch
from modem_tpu.parallel import make_modem_mesh


def test_finite_fraction():
    ok = {"a": jnp.ones((4,)), "b": jnp.zeros((2, 2))}
    assert float(finite_fraction(ok)) == 1.0
    bad = {"a": jnp.asarray([1.0, np.nan, np.inf, 0.0])}
    assert abs(float(finite_fraction(bad)) - 0.5) < 1e-6


def test_assert_finite_raises():
    with pytest.raises(FloatingPointError):
        assert_finite(jnp.asarray([1.0, np.nan]), "x")
    assert_finite(jnp.asarray([1.0, 2.0]))  # no raise
    assert_finite({"ints": jnp.arange(3)})  # int-only trees pass


def test_halo_mismatch_zero_and_nonzero():
    mesh = make_modem_mesh(ch=1, time=8)
    halo = 4
    n_local = 16
    # Overlapped layout: shard t's first `halo` samples equal shard t-1's
    # last `halo` samples.
    base = np.arange(8 * (n_local - halo) + halo, dtype=np.float32)
    shards = [base[t * (n_local - halo): t * (n_local - halo) + n_local]
              for t in range(8)]
    x = jnp.asarray(np.concatenate(shards))
    assert float(halo_mismatch(x, mesh, halo, batch_axis=None)) == 0.0

    corrupted = np.concatenate(shards).copy()
    corrupted[3 * n_local] += 1.0  # shard 3's first halo sample
    assert float(halo_mismatch(jnp.asarray(corrupted), mesh, halo,
                               batch_axis=None)) == 1.0

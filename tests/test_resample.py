"""Rational resampler vs the direct zero-stuff -> conv -> downsample model."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu.ops.resample import (
    design_lowpass, rational_resample, resample_state_len, resample_taps,
)


def upfirdn_ref(x: np.ndarray, h: np.ndarray, up: int, down: int) -> np.ndarray:
    """Independent NumPy model: y[m] = conv(h, zero_stuff_up(x))[m*down]."""
    u = np.zeros(x.shape[0] * up, np.float32)
    u[::up] = x
    w = np.convolve(u, h)[: u.shape[0]]
    return w[::down]


@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (3, 2), (2, 3), (5, 4),
                                     (4, 5), (7, 3), (1, 1)])
def test_matches_upfirdn(up, down):
    rng = np.random.default_rng(0)
    lcm = up * down // math.gcd(up, down)
    n = 24 * lcm // math.gcd(lcm, 24) * 24 // 24 * down  # divisible by down
    n = 24 * down
    x = rng.normal(size=n).astype(np.float32)
    taps = resample_taps(up, down, taps_per_phase=8)
    y, _ = rational_resample(jnp.asarray(x), up, down, taps)
    ref = upfirdn_ref(x, taps, up, down)[: n * up // down]
    assert y.shape[-1] == n * up // down
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_batched():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 48)).astype(np.float32)
    taps = resample_taps(3, 2, taps_per_phase=8)
    y, _ = rational_resample(jnp.asarray(x), 3, 2, taps)
    for c in range(3):
        ref = upfirdn_ref(x[c], taps, 3, 2)[:72]
        np.testing.assert_allclose(np.asarray(y[c]), ref, atol=1e-4)


def test_tone_preserved():
    """A tone well inside both Nyquists survives 2/1 then 1/2 with ~unit gain."""
    n = 512
    t = np.arange(n)
    x = np.sin(2 * np.pi * 0.03 * t).astype(np.float32)
    y2, _ = rational_resample(jnp.asarray(x), 2, 1)
    back, _ = rational_resample(y2, 1, 2)
    mid = slice(128, n - 128)
    # group delay: both stages are causal; correlate to find best lag
    b = np.asarray(back)
    lags = [np.corrcoef(b[128 - k: n - 128 - k], x[mid])[0, 1]
            for k in range(0, 64)]
    assert max(lags) > 0.999


def test_gcd_reduction():
    x = jnp.asarray(np.random.default_rng(2).normal(size=48), jnp.float32)
    y, _ = rational_resample(x, 4, 2)  # reduces to 2/1
    assert y.shape[-1] == 96


@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (3, 2), (2, 3), (1, 1)])
def test_streaming_state_parity(up, down):
    """Chunked resampling with carried state == one-shot, bit-exact."""
    rng = np.random.default_rng(7)
    blocks = [12 * down, 24 * down, 6 * down]
    x = rng.normal(size=sum(blocks)).astype(np.float32)
    taps = resample_taps(up, down, taps_per_phase=8)
    one_shot, _ = rational_resample(jnp.asarray(x), up, down, taps)
    state = None
    outs = []
    start = 0
    for b in blocks:
        y, state = rational_resample(
            jnp.asarray(x[start: start + b]), up, down, taps, state=state
        )
        assert state.shape[-1] == resample_state_len(taps, up, down)
        outs.append(np.asarray(y))
        start += b
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one_shot))


def test_invalid_length():
    with pytest.raises(ValueError):
        rational_resample(jnp.zeros(10), 1, 3)


def test_lowpass_design():
    h = design_lowpass(101, 0.25)
    assert abs(h.sum() - 1.0) < 1e-6
    # frequency response: passband ~1, stopband small
    w = np.fft.rfft(h, 4096)
    f = np.linspace(0, 1, w.shape[0])
    assert np.all(np.abs(np.abs(w[f < 0.1]) - 1.0) < 0.01)
    assert np.all(np.abs(w[f > 0.45]) < 0.01)

"""Blind feedforward carrier tracking (sync.phase_track): CFO slope
recovery, constant residual after derotation, piecewise wander, and the
documented M-fold ambiguity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu.sync import phase_track


def _qpsk_stream(n, w, ph0, seed=0, noise=0.0, wander=None):
    """QPSK decision points spun by phase ph0 + w*k (+ wander[k])."""
    rng = np.random.default_rng(seed)
    syms = rng.integers(0, 4, n)
    ang = np.pi / 4 + syms * np.pi / 2
    k = np.arange(n)
    ph = ph0 + w * k + (wander(k) if wander is not None else 0.0)
    di = np.cos(ang + ph) + rng.normal(0, noise, n)
    dq = np.sin(ang + ph) + rng.normal(0, noise, n)
    base = np.cos(ang) + 1j * np.sin(ang)
    return (jnp.asarray(di, jnp.float32), jnp.asarray(dq, jnp.float32),
            base)


def _residual_angle_spread(ci, cq, base, m=4):
    """Std of the residual rotation (vs the clean symbols), measured mod
    2*pi/M to ignore the inherent ambiguity. Perfect tracking leaves the
    per-sample noise floor; untracked CFO leaves the full phase ramp."""
    z = (np.asarray(ci) + 1j * np.asarray(cq)) * np.conj(base)
    r = np.angle(z ** m)  # residual*m mod 2pi
    ref = np.angle(np.mean(np.exp(1j * r)))
    dev = np.angle(np.exp(1j * (r - ref)))
    return np.std(dev) / m


class TestPhaseTrack:
    def test_linear_cfo_removed_and_reported(self):
        w = 8e-4                       # rad/symbol residual CFO
        di, dq, base = _qpsk_stream(8192, w, ph0=0.9, noise=0.02)
        ci, cq, rep = phase_track(di, dq, 4, 256)
        assert abs(float(rep["cfo_rad_per_sym"]) - w) < 5e-6
        # derotated stream differs from clean symbols by a CONSTANT
        # (mod pi/2) rotation only
        assert _residual_angle_spread(ci, cq, base) < 0.05
        # untracked stream spins through many constellation sectors
        assert _residual_angle_spread(di, dq, base) > 0.2

    def test_piecewise_tracks_wander(self):
        wander = lambda k: 0.35 * np.sin(2 * np.pi * k / 6000)  # noqa: E731
        di, dq, base = _qpsk_stream(8192, 3e-4, ph0=-0.4, noise=0.02,
                                    wander=wander)
        ci, cq, _ = phase_track(di, dq, 4, 256, fit="piecewise")
        assert _residual_angle_spread(ci, cq, base) < 0.08

    def test_partial_tail_block_extrapolated(self):
        w = 5e-4
        di, dq, base = _qpsk_stream(8192 + 100, w, ph0=0.1, noise=0.02)
        ci, cq, _ = phase_track(di, dq, 4, 256)
        assert _residual_angle_spread(ci, cq, base) < 0.05

    def test_bpsk(self):
        rng = np.random.default_rng(3)
        n, w = 4096, 1e-3
        bits = rng.integers(0, 2, n)
        ang = bits * np.pi
        ph = 0.2 + w * np.arange(n)
        di = jnp.asarray(np.cos(ang + ph), jnp.float32)
        dq = jnp.asarray(np.sin(ang + ph), jnp.float32)
        ci, cq, rep = phase_track(di, dq, 2, 128)
        assert abs(float(rep["cfo_rad_per_sym"]) - w) < 2e-5
        base = np.cos(ang) + 1j * np.sin(ang)
        assert _residual_angle_spread(ci, cq, base, m=2) < 0.02

    def test_too_few_blocks_rejected(self):
        di, dq, _ = _qpsk_stream(256, 0.0, 0.0)
        with pytest.raises(ValueError, match=">= 2 blocks"):
            phase_track(di, dq, 4, 256)

    def test_batched(self):
        d1 = _qpsk_stream(4096, 6e-4, 0.3, seed=5, noise=0.02)
        d2 = _qpsk_stream(4096, -4e-4, 1.1, seed=6, noise=0.02)
        di = jnp.stack([d1[0], d2[0]])
        dq = jnp.stack([d1[1], d2[1]])
        ci, cq, rep = phase_track(di, dq, 4, 256)
        assert rep["cfo_rad_per_sym"].shape == (2,)
        np.testing.assert_allclose(np.asarray(rep["cfo_rad_per_sym"]),
                                   [6e-4, -4e-4], atol=1e-5)
        assert _residual_angle_spread(ci[0], cq[0], d1[2]) < 0.05
        assert _residual_angle_spread(ci[1], cq[1], d2[2]) < 0.05

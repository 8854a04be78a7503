"""FIR engine: every backend must equal np.convolve, with streaming tails."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu.ops.fir import BACKENDS, fir_filter, fir_init_state
from modem_tpu.ops import filters


def _ref_causal(x, taps):
    return np.convolve(x, taps)[: len(x)]


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("k", [1, 23, 64])
def test_backend_matches_convolve(backend, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float32)
    taps = rng.standard_normal(k).astype(np.float32)
    y, _ = jax.jit(lambda a: fir_filter(a, taps, backend=backend))(x)
    np.testing.assert_allclose(np.asarray(y), _ref_causal(x, taps), atol=1e-4)


@pytest.mark.parametrize("backend", BACKENDS)
def test_streaming_tail(backend):
    """Chunked filtering with carried state == one-shot (overlap-save seam)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(512).astype(np.float32)
    taps = filters.lowpass_taps()
    one, _ = fir_filter(jnp.asarray(x), taps, backend=backend)
    state = fir_init_state(taps)
    outs = []
    for c in range(4):
        y, state = fir_filter(jnp.asarray(x[c * 128:(c + 1) * 128]), taps, state,
                              backend=backend)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(one), atol=1e-5)


def test_batched():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 300)).astype(np.float32)
    taps = rng.standard_normal(23).astype(np.float32)
    y, _ = fir_filter(jnp.asarray(x), taps, backend="matmul")
    for c in range(3):
        np.testing.assert_allclose(np.asarray(y[c]), _ref_causal(x[c], taps),
                                   atol=1e-4)


def test_rrc_matched_pair_is_nyquist():
    """RRC * RRC = raised cosine: zero ISI at symbol-spaced taps."""
    sps = 8
    rrc = filters.rrc_taps(sps, span_symbols=10, beta=0.35)
    rc = np.convolve(rrc, rrc)
    center = len(rc) // 2
    peak = rc[center]
    np.testing.assert_allclose(peak, 1.0, atol=1e-5)  # unit_energy norm
    isi = rc[center % sps:: sps]
    isi = isi[np.arange(len(isi)) != center // sps]
    # truncation sidelobes of an unwindowed span-10 RRC sit around -44 dB
    assert np.max(np.abs(isi)) < 1e-2


def test_hilbert_response():
    """Designed Hilbert transformer: ~unit gain, -90 deg shift mid-band."""
    taps = filters.hilbert_taps(23)
    n = 4096
    w = np.fft.rfftfreq(n)
    h = np.fft.rfft(taps, n)
    band = (w > 0.1) & (w < 0.4)
    np.testing.assert_allclose(np.abs(h)[band], 1.0, atol=0.05)
    # group-delay-compensated phase ~ -pi/2
    phase = np.angle(h * np.exp(2j * np.pi * w * 11))
    np.testing.assert_allclose(phase[band], -np.pi / 2, atol=0.05)


class TestChunkedOverlapSave:
    """The fft backend must stitch bounded-size FFT windows, not take one
    stream-length FFT."""

    def test_long_block_matches_convolve(self):
        """Block far longer than the FFT window: many stitched chunks."""
        rng = np.random.default_rng(10)
        taps = rng.normal(size=65).astype(np.float32)
        x = rng.normal(size=(2, 5000)).astype(np.float32)
        y, _ = fir_filter(jnp.asarray(x), taps, backend="fft")
        ref = np.stack([np.convolve(r, taps)[:5000] for r in x])
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)

    def test_fft_size_is_bounded(self):
        """The window size depends on the taps, not the block length."""
        from modem_tpu.ops.fir import _fir_fft

        taps = np.ones(17, np.float32)
        import jax as _jax

        long = jnp.zeros((1 << 16) + 16)
        jaxpr = _jax.make_jaxpr(lambda a: _fir_fft(a, taps))(long)

        def fft_sizes(jx):
            for eqn in jx.eqns:
                if eqn.primitive.name == "fft":
                    yield eqn.params["fft_lengths"][0]
                for sub in _jax.core.jaxprs_in_params(eqn.params):
                    yield from fft_sizes(sub)

        sizes = list(fft_sizes(jaxpr.jaxpr))
        assert sizes and max(sizes) <= 512  # 8*K rounded up, not 2^17

    def test_window_too_small_rejected(self):
        from modem_tpu.ops.fir import _fir_fft

        with pytest.raises(ValueError):
            _fir_fft(jnp.zeros(100), np.ones(33, np.float32), fft_n=48)

    def test_single_window_path(self):
        rng = np.random.default_rng(11)
        taps = rng.normal(size=9).astype(np.float32)
        x = rng.normal(size=40).astype(np.float32)
        y, _ = fir_filter(jnp.asarray(x), taps, backend="fft")
        np.testing.assert_allclose(
            np.asarray(y), np.convolve(x, taps)[:40], atol=1e-4
        )

"""FIR filtering engine — the perf-critical core of the RX chain.

The reference runs a direct-form FIR one sample at a time with a circular
history buffer (`/root/reference/src/modem/fir.rs:10-34`): ``y[n] = sum_j
coefs[j] * x[n-j]`` with zero initial history. Here the same causal
convolution runs as a block transform over ``[..., n]`` tensors with an
explicit ``taps-1``-sample tail carried between blocks (the streaming /
overlap-save state), and several interchangeable backends:

* ``direct``  — K shifted multiply-accumulates; XLA fuses into one VPU pass.
  Best for short filters.
* ``conv``    — ``lax.conv_general_dilated``; XLA lowers to the MXU.
* ``matmul``  — frames the signal into [blocks, L] windows and multiplies by a
  banded Toeplitz tap matrix on the MXU: the classic TPU trick of spending
  cheap MXU FLOPs to avoid VPU/memory-bound loops.
* ``fft``     — overlap-save fast convolution for long filters.

All backends are bit-compatible (up to f32 reassociation) and tested against
``np.convolve``.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

BACKENDS = ("direct", "conv", "matmul", "fft")


def _as_f32(taps) -> np.ndarray:
    """Taps are static filter data: keep them as host NumPy so backends can do
    trace-time preprocessing (Toeplitz banks, reversal) on concrete values."""
    if isinstance(taps, jax.core.Tracer):
        raise TypeError("FIR taps must be concrete (static) arrays, not tracers")
    t = np.asarray(taps, np.float32)
    if t.ndim != 1:
        raise ValueError("taps must be 1-D")
    return t


def fir_init_state(taps, batch_shape: tuple[int, ...] = ()) -> jnp.ndarray:
    """Zero history of ``taps-1`` samples (matches `fir.rs:12-15`)."""
    k = len(taps)
    return jnp.zeros(batch_shape + (k - 1,), jnp.float32)


def fir_filter(
    x: jnp.ndarray,
    taps,
    state: jnp.ndarray | None = None,
    backend: str = "direct",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Causal FIR: returns ``(y, new_state)`` with ``y.shape == x.shape``.

    ``state`` is the previous block's last ``K-1`` samples (zeros if None,
    matching the reference's fresh-filter behavior).
    """
    taps = _as_f32(taps)
    k = taps.shape[0]
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (k - 1,), x.dtype)
    xp = jnp.concatenate([state, x], axis=-1) if k > 1 else x
    new_state = xp[..., xp.shape[-1] - (k - 1):] if k > 1 else state

    if backend == "direct":
        y = _fir_direct(xp, taps)
    elif backend == "conv":
        y = _fir_conv(xp, taps)
    elif backend == "matmul":
        y = _fir_matmul(xp, taps)
    elif backend == "fft":
        y = _fir_fft(xp, taps)
    else:
        raise ValueError(f"unknown FIR backend {backend!r}; choose from {BACKENDS}")
    return y, new_state


def _fir_direct(xp: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """y[n] = sum_j taps[j] * xp[n + K-1 - j] — K static slices, fully fused."""
    k = taps.shape[0]
    n = xp.shape[-1] - (k - 1)
    y = jnp.zeros(xp.shape[:-1] + (n,), xp.dtype)
    for j in range(k):
        y = y + taps[j] * jax.lax.dynamic_slice_in_dim(xp, k - 1 - j, n, axis=-1)
    return y


def _fir_conv(xp: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    k = taps.shape[0]
    batch_shape = xp.shape[:-1]
    lhs = xp.reshape((-1, 1, xp.shape[-1]))  # [B, C=1, W]
    rhs = jnp.asarray(taps[::-1].reshape((1, 1, k)))  # [O,I,W] cross-corr kernel
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    return y.reshape(batch_shape + (y.shape[-1],))


def _toeplitz_bank(taps: np.ndarray | jnp.ndarray, block: int) -> jnp.ndarray:
    """[block + K - 1, block] banded matrix T with T[j + i, i] = taps[K-1-j]...

    Built so that ``window @ T`` computes ``block`` consecutive causal FIR
    outputs from a window of ``block + K - 1`` inputs.
    """
    t = np.asarray(taps, np.float32)
    k = t.shape[0]
    m = np.zeros((block + k - 1, block), np.float32)
    for i in range(block):
        m[i: i + k, i] = t[::-1]
    return jnp.asarray(m)


def _fir_matmul(xp: jnp.ndarray, taps: np.ndarray, block: int = 256) -> jnp.ndarray:
    """Frame into overlapping [n/block, block + K - 1] windows, one MXU matmul."""
    k = taps.shape[0]
    n = xp.shape[-1] - (k - 1)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros(xp.shape[:-1] + (pad,), xp.dtype)], axis=-1
        )
    # window b covers xp[b*block : b*block + block + K - 1]
    idx = (jnp.arange(nb)[:, None] * block
           + jnp.arange(block + k - 1)[None, :])  # [nb, block+K-1]
    windows = xp[..., idx]  # [..., nb, block+K-1]
    t = _toeplitz_bank(taps, block)
    # HIGHEST keeps the MXU in f32 (the TPU default would round inputs to
    # bf16, ~7e-3 relative error — too coarse for filter parity).
    y = jnp.einsum(
        "...bw,wo->...bo", windows, t,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(xp.shape[:-1] + (nb * block,))[..., :n]


def _fir_fft(xp: jnp.ndarray, taps: np.ndarray,
             fft_n: int | None = None) -> jnp.ndarray:
    """True chunked overlap-save: the signal is framed into overlapping
    ``fft_n``-sample windows stepping by ``fft_n - (K-1)``, each window is
    fast-convolved, and the valid regions are concatenated. The FFT size is
    bounded (default: smallest power of two >= 8*K, floor 256) regardless of
    block length, so memory and per-FFT latency stay O(K log K) per output
    instead of growing with the stream."""
    k = taps.shape[0]
    n = xp.shape[-1] - (k - 1)
    if fft_n is None:
        fft_n = 1 << max(int(math.ceil(math.log2(max(8 * k, 256)))), 4)
    if fft_n < 2 * k:
        raise ValueError(f"fft_n={fft_n} too small for {k} taps (need >= 2K)")
    tf = jnp.asarray(np.fft.rfft(taps, n=fft_n).astype(np.complex64))
    step = fft_n - (k - 1)  # valid outputs per window
    if n <= step:
        xf = jnp.fft.rfft(xp, n=fft_n)
        y = jnp.fft.irfft(xf * tf, n=fft_n)[..., k - 1: k - 1 + n]
        return y.astype(xp.dtype)
    nb = -(-n // step)
    pad = nb * step + (k - 1) - xp.shape[-1]
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros(xp.shape[:-1] + (pad,), xp.dtype)], axis=-1
        )
    # window b covers xp[b*step : b*step + fft_n] (k-1 overlap = "save")
    idx = (jnp.arange(nb)[:, None] * step
           + jnp.arange(fft_n)[None, :])  # [nb, fft_n]
    frames = xp[..., idx]  # [..., nb, fft_n]
    yf = jnp.fft.irfft(jnp.fft.rfft(frames, n=fft_n) * tf, n=fft_n)
    y = yf[..., k - 1:].reshape(xp.shape[:-1] + (nb * step,))[..., :n]
    return y.astype(xp.dtype)

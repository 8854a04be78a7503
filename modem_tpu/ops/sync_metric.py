"""Shared blind-synchronization primitives for CP-based frame PHYs.

Both frame modems (:mod:`modem_tpu.ofdm`, :mod:`modem_tpu.scfde`) acquire
the same way: a periodic-similarity coarse metric (Schmidl & Cox shape)
finds the preamble's self-similar section and yields the fractional CFO
from the correlation angle; after derotation, a full-template correlation
fine-times the frame start. These are the shared, TPU-shaped kernels:

* all windowed sums are cumsum differences — O(T), loop-free;
* the similarity metric uses the symmetric (Minn-style) denominator
  ``R = (E1 + E2)/2`` so Cauchy-Schwarz bounds it to [0, 1] — a threshold
  detector cannot false-fire on sparse-energy stretches (silence, burst
  tails, zero padding);
* the template correlation is four causal FIR passes with the reversed
  template as taps (correlation == convolution with the flipped kernel) —
  no ``[max_lag, P]`` window tensor is ever materialized (the gather rule,
  BENCH.md round 2).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from .fir import fir_filter


def periodic_similarity(i: jnp.ndarray, q: jnp.ndarray, lag: int,
                        width: int, max_lag: int):
    """Period-``lag`` self-similarity over ``width``-sample windows at
    lags ``[0, max_lag)``: returns ``(M, P_i, P_q)`` with
    ``P(d) = sum_m conj(r[d+m]) r[d+m+lag]`` and
    ``M = |P|^2 / ((E1+E2)/2)^2 in [0, 1]``."""
    need = max_lag + width + lag
    if i.shape[-1] < need:
        raise ValueError(f"need >= {need} samples for max_lag={max_lag}")
    pi = i[..., :-lag] * i[..., lag:] + q[..., :-lag] * q[..., lag:]
    pq = i[..., :-lag] * q[..., lag:] - q[..., :-lag] * i[..., lag:]
    en1 = i[..., :-lag] ** 2 + q[..., :-lag] ** 2
    en2 = i[..., lag:] ** 2 + q[..., lag:] ** 2

    def wsum(x):
        c = jnp.cumsum(x, axis=-1)
        zero = jnp.zeros_like(c[..., :1])
        c = jnp.concatenate([zero, c], axis=-1)
        return c[..., width:width + max_lag] - c[..., :max_lag]

    ps_i, ps_q = wsum(pi), wsum(pq)
    es = 0.5 * (wsum(en1) + wsum(en2))
    es = jnp.maximum(es, 1e-12)
    m = (ps_i * ps_i + ps_q * ps_q) / (es * es)
    return m, ps_i, ps_q


def template_correlate_fir(ci: jnp.ndarray, cq: jnp.ndarray,
                           tpl_i: np.ndarray, tpl_q: np.ndarray,
                           max_lag: int):
    """Complex correlation against a known template at lags
    ``[0, max_lag)``: ``C(d) = sum_k conj(tpl[k]) r[d+k]`` as four causal
    FIR passes with the reversed template as taps, read at offset
    ``P - 1``. Returns ``(cr, cj) [..., max_lag]``."""
    tpl_i = np.asarray(tpl_i, np.float32)
    tpl_q = np.asarray(tpl_q, np.float32)
    p = tpl_i.shape[0]
    # only the first max_lag + p - 1 samples can influence lags
    # [0, max_lag) — slicing the head first is bit-identical and avoids
    # filtering the (much longer) payload tail of a capture
    head = max_lag + p - 1
    if ci.shape[-1] > head:
        ci, cq = ci[..., :head], cq[..., :head]
    ri, rq = tpl_i[::-1].copy(), tpl_q[::-1].copy()
    aii, _ = fir_filter(ci, ri)
    aqq, _ = fir_filter(cq, rq)
    aqi, _ = fir_filter(cq, ri)
    aiq, _ = fir_filter(ci, rq)
    cr = (aii + aqq)[..., p - 1: p - 1 + max_lag]
    cj = (aqi - aiq)[..., p - 1: p - 1 + max_lag]
    return cr, cj


def aligned_frame_matmul(ci: jnp.ndarray, cq: jnp.ndarray,
                         start: jnp.ndarray, out_len: int, max_lag: int):
    """Extract ``(ci[..., s : s + out_len], cq[...])`` for a per-batch
    integer ``start`` s in ``[0, max_lag)`` — WITHOUT a gather.

    ``jnp.take_along_axis`` with per-row offsets lowers to a serialized
    scalar gather on TPU; at frame sizes it dominates blind acquisition
    (measured ~82% of ``OfdmModem.acquire``'s pass time, BENCH.md round
    3). This is the same cure as ``ops/slicer.lut_map``: turn the data-
    dependent selection into a one-hot matmul the MXU eats.

    Shape algebra: view the capture as chunks of ``L = max_lag`` samples,
    ``CI[..., j, r] = ci[..., j*L + r]``, and pair each chunk with its
    successor, ``CI2[..., j, :2L]``. Then with ``t = j*L + r``::

        out[..., j*L + r] = ci[..., j*L + (r + s)] = CI2[..., j, r + s]
                          = sum_p onehot(p - r == s) * CI2[..., j, p]

    i.e. a banded one-hot ``[L, 2L]`` selection matrix per batch element,
    applied to every chunk — a batched matmul with MXU-native tile sizes.
    ``Precision.HIGHEST`` keeps it bit-exact (the bf16x3 operand split is
    exact and exactly one f32 value is selected per output; ``0 + v == v``).

    Inputs shorter than the selection needs are zero-padded (silence
    after the frame), matching the padded-gather semantics.
    """
    l = int(max_lag)
    nj = -(-out_len // l) + 1          # chunks incl. the successor spill
    need = nj * l
    if ci.shape[-1] < need:
        pad = jnp.zeros(ci.shape[:-1] + (need - ci.shape[-1],), ci.dtype)
        ci = jnp.concatenate([ci, pad], axis=-1)
        cq = jnp.concatenate([cq, pad], axis=-1)
    else:
        ci, cq = ci[..., :need], cq[..., :need]
    bshape = ci.shape[:-1]
    chi = ci.reshape(bshape + (nj, l))
    chq = cq.reshape(bshape + (nj, l))
    c2i = jnp.concatenate([chi[..., :-1, :], chi[..., 1:, :]], axis=-1)
    c2q = jnp.concatenate([chq[..., :-1, :], chq[..., 1:, :]], axis=-1)
    r = jnp.arange(l, dtype=jnp.int32)[:, None]
    p = jnp.arange(2 * l, dtype=jnp.int32)[None, :]
    g = (p - r == start[..., None, None]).astype(jnp.float32)
    oi = jnp.einsum("...rp,...jp->...jr", g, c2i,
                    precision=lax.Precision.HIGHEST)
    oq = jnp.einsum("...rp,...jp->...jr", g, c2q,
                    precision=lax.Precision.HIGHEST)
    oi = oi.reshape(bshape + ((nj - 1) * l,))[..., :out_len]
    oq = oq.reshape(bshape + ((nj - 1) * l,))[..., :out_len]
    return oi, oq

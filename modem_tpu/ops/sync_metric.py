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
    ri, rq = tpl_i[::-1].copy(), tpl_q[::-1].copy()
    aii, _ = fir_filter(ci, ri)
    aqq, _ = fir_filter(cq, rq)
    aqi, _ = fir_filter(cq, ri)
    aiq, _ = fir_filter(ci, rq)
    cr = (aii + aqq)[..., p - 1: p - 1 + max_lag]
    cj = (aqi - aiq)[..., p - 1: p - 1 + max_lag]
    return cr, cj

"""Polyphase filter-bank channelizer: one wideband stream ↔ M channels.

New capability (the reference is strictly single-channel; BASELINE.json's
config #5 is a 256-channel bank, and a deployed bank shares one wideband
front end). The **synthesis** bank combines M channel-rate baseband streams
into one wideband stream at M× the rate (each channel translated to center
``m/M`` of the wideband rate); the **analysis** bank splits it back —
together they turn the sharded per-channel chains into a single-antenna
system.

TPU shaping of the classic maximally-decimated PFB:

* the commutator is a reshape: wideband ↔ ``[..., K, M]`` phase matrix
  (static shapes, no strided access);
* per-phase filtering is a ``taps_per_phase``-step unrolled MAC over the
  leading (time) axis of that matrix — contiguous slices only;
* the M-point DFT across phases is a pair of real ``[M, M]`` matmuls
  (cos/sin), NOT ``jnp.fft`` — the device has no complex dtype, and for
  fixed M the MXU eats the dense form: at M=256 the DFT is exactly the
  hardware's native tile;
* I/Q stay split real planes end to end.

Streaming: like every op in this framework, both banks carry explicit
state (``analyze_stream``/``synthesize_stream`` — the commutator's last
``M-1`` wideband samples plus the per-phase filter's last ``J-1``
phase-matrix rows), so chunked streams are bit-identical to one-shot.

Design: prototype lowpass = Kaiser-windowed sinc at cutoff ``1/(2M)`` of
the wideband rate (reusing :func:`modem_tpu.ops.resample.design_lowpass`).
Near-perfect reconstruction: per-channel signals that occupy the channel
interior (any of this framework's RRC chains at ``sps ≥ 4``) round-trip
synthesis → analysis → chain RX with exact decisions (tested, including
through the blind :class:`modem_tpu.sync.AcquiringReceiver`, which also
absorbs the bank's group delay without bookkeeping).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp

from .resample import design_lowpass


@lru_cache(maxsize=8)
def _bank(m: int, taps_per_phase: int, beta: float):
    """(h_poly [m, J] analysis phases, g_poly [m, J] synthesis phases,
    cos/sin DFT matrices [m, m])."""
    l = m * taps_per_phase
    proto = design_lowpass(l, cutoff=1.0 / m, beta=beta).astype(np.float32)
    # scale: unity passband gain through synthesis-then-analysis is set by
    # the tests/users; keep each bank's prototype at unit DC gain per phase
    proto = proto * m / np.sum(proto)
    hp = proto.reshape(taps_per_phase, m).T.copy()     # h[j*m + p] -> [p, j]
    ang = 2.0 * np.pi * np.outer(np.arange(m), np.arange(m)) / m
    return (hp, np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


def _phase_filter(u: jnp.ndarray, hp: np.ndarray,
                  hist: jnp.ndarray | None = None) -> jnp.ndarray:
    """``u [..., K, M]`` phase matrix -> causally filtered with per-phase
    taps ``hp [M, J]`` along K. ``hist`` is the previous block's last
    ``J - 1`` phase-matrix rows (zeros if None)."""
    j = hp.shape[1]
    if hist is None:
        hist = jnp.zeros(u.shape[:-2] + (j - 1,) + u.shape[-1:], u.dtype)
    up = jnp.concatenate([hist, u], axis=-2)
    k = u.shape[-2]
    acc = up[..., j - 1:j - 1 + k, :] * jnp.asarray(hp[:, 0])
    for t in range(1, j):
        acc = acc + up[..., j - 1 - t:j - 1 - t + k, :] * jnp.asarray(hp[:, t])
    return acc


def _carry_rows(hist: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Next filter history: last ``hist.shape[-2]`` rows of hist+rows
    (robust to chunks shorter than the history and to zero history)."""
    h = hist.shape[-2]
    cat = jnp.concatenate([hist, rows], axis=-2)
    return cat[..., cat.shape[-2] - h:, :]


class Channelizer:
    """Maximally-decimated M-channel PFB (analysis + synthesis).

    Channel ``m`` is centered at normalized wideband frequency ``m/M``
    (``m > M/2`` ≡ negative frequencies). Streams are split-plane I/Q.
    """

    def __init__(self, m: int, taps_per_phase: int = 12, beta: float = 9.0,
                 dft_dtype=jnp.float32):
        """``dft_dtype=jnp.bfloat16`` runs the DFT matmuls in bf16 with
        f32 accumulation — ~6x the MXU rate on this hardware — at ~40 dB
        image/quantization floor (bf16's 8-bit mantissa), which is ample
        margin for the hard-decision chains but below what the exact
        tone-suppression tests ask of the f32 default."""
        if m < 2:
            raise ValueError("need at least 2 channels")
        self.m = int(m)
        self.taps_per_phase = int(taps_per_phase)
        self.beta = float(beta)
        self.dft_dtype = dft_dtype

    def _mats(self):
        return _bank(self.m, self.taps_per_phase, self.beta)

    def _dft(self, a: jnp.ndarray, b: jnp.ndarray):
        """(a @ dft_c, a @ dft_s, b @ dft_c, b @ dft_s) in ``dft_dtype``
        with f32 accumulation. DFT matrices transposed are themselves
        (cos symmetric, sin used sign-explicitly by callers)."""
        _, cmat, smat = self._mats()
        d = self.dft_dtype
        c = jnp.asarray(cmat, d)
        s = jnp.asarray(smat, d)
        a = a.astype(d)
        b = b.astype(d)
        dot = lambda x, w: jnp.dot(  # noqa: E731
            x, w, preferred_element_type=jnp.float32)
        return dot(a, c), dot(a, s), dot(b, c), dot(b, s)

    # ---- analysis: wideband [..., N] -> channels [..., M, N/M] ----

    def analyze(self, i: jnp.ndarray, q: jnp.ndarray):
        """One-shot analysis with zero history."""
        yi, yq, _ = self.analyze_stream(
            i, q, self.init_analyze_state(i.shape[:-1], i.dtype))
        return yi, yq

    def init_analyze_state(self, batch_shape: tuple = (),
                           dtype=jnp.float32) -> dict:
        """Zero streaming state: last ``M-1`` wideband samples (the
        commutator lookback) + last ``J-1`` phase-matrix rows (the
        per-phase filter history), per I/Q plane."""
        m, j = self.m, self.taps_per_phase
        w = jnp.zeros(batch_shape + (m - 1,), dtype)
        u = jnp.zeros(batch_shape + (j - 1, m), dtype)
        return {"wi": w, "wq": w, "ui": u, "uq": u}

    def analyze_stream(self, i: jnp.ndarray, q: jnp.ndarray, state: dict):
        """Streaming analysis: chunked == one-shot, bit-exact. Returns
        ``(yi, yq, new_state)``; chunk length must divide by M."""
        m = self.m
        n = i.shape[-1]
        if n % m:
            raise ValueError(f"wideband length {n} must divide by M={m}")
        hp = self._mats()[0]

        def phases(x, tail):
            # u[k, r] = x[kM + (M-1-r) - (M-1)]: prepend the carried M-1
            # samples, drop the same count at the end, reshape, flip
            xp = jnp.concatenate([tail, x[..., : n - (m - 1)]], axis=-1)
            return xp.reshape(x.shape[:-1] + (n // m, m))[..., ::-1]

        ui = phases(i, state["wi"])
        uq = phases(q, state["wq"])
        vi = _phase_filter(ui, hp, state["ui"])   # [..., K, M]
        vq = _phase_filter(uq, hp, state["uq"])
        # y_m = sum_p e^{+j 2pi m p / M} v_p  (the DFT matrices are
        # symmetric, so no transposes)
        ic, is_, qc, qs = self._dft(vi, vq)
        yi = ic - qs
        yq = is_ + qc
        new_state = {
            "wi": i[..., n - (m - 1):], "wq": q[..., n - (m - 1):],
            "ui": _carry_rows(state["ui"], ui),
            "uq": _carry_rows(state["uq"], uq),
        }
        return (jnp.moveaxis(yi, -1, -2), jnp.moveaxis(yq, -1, -2),
                new_state)

    # ---- synthesis: channels [..., M, K] -> wideband [..., M*K] ----

    def synthesize(self, ci: jnp.ndarray, cq: jnp.ndarray):
        """One-shot synthesis with zero history."""
        wi, wq, _ = self.synthesize_stream(
            ci, cq, self.init_synthesize_state(ci.shape[:-2], ci.dtype))
        return wi, wq

    def init_synthesize_state(self, batch_shape: tuple = (),
                              dtype=jnp.float32) -> dict:
        """Zero streaming state: last ``J-1`` modulated phase rows."""
        z = jnp.zeros(batch_shape + (self.taps_per_phase - 1, self.m), dtype)
        return {"zi": z, "zq": z}

    def synthesize_stream(self, ci: jnp.ndarray, cq: jnp.ndarray,
                          state: dict):
        """Streaming synthesis: chunked == one-shot, bit-exact. Returns
        ``(wi, wq, new_state)``."""
        m = self.m
        if ci.shape[-2] != m:
            raise ValueError(f"expected {m} channels, got {ci.shape[-2]}")
        hp = self._mats()[0]
        yi = jnp.moveaxis(ci, -2, -1)  # [..., K, M]
        yq = jnp.moveaxis(cq, -2, -1)
        # z_p = sum_m e^{+j 2pi m p / M} y_m  (modulate each channel up)
        ic, is_, qc, qs = self._dft(yi, yq)
        zi = ic - qs
        zq = is_ + qc
        wi = _phase_filter(zi, hp, state["zi"]) / m  # x[kM+p] = (g_p*z_p)[k]
        wq = _phase_filter(zq, hp, state["zq"]) / m
        new_state = {"zi": _carry_rows(state["zi"], zi),
                     "zq": _carry_rows(state["zq"], zq)}
        return (wi.reshape(wi.shape[:-2] + (-1,)),
                wq.reshape(wq.shape[:-2] + (-1,)), new_state)

"""Feedforward synchronization: timing, carrier, and frame acquisition.

The reference's entire acquisition apparatus is a one-shot 64-sample PLL run
against a known preamble tone (`/root/reference/src/modem/demodulator.rs:32-36`,
`pll.rs:16-22`) — a per-sample feedback loop that assumes perfect symbol
timing and zero frequency offset. A production receiver must acquire under
unknown timing, carrier frequency offset (CFO), phase, and gain.

This module is the TPU-native inversion of that design: **feedforward block
estimators** instead of feedback loops. Every estimator is a reduction over a
block — no data-dependent control flow, no per-sample recursion — so the
whole acquisition path jits, vmaps over channels, and shards like any other
block transform:

* :func:`oerder_meyr_timing` — square-law symbol-timing estimate from the
  cyclostationarity of ``|x|^2`` (Oerder & Meyr 1988): one FFT-bin projection.
* :func:`correct_timing` — traced-``mu`` Farrow resampler
  (:func:`modem_tpu.ops.impairments.farrow_delay`).
* :func:`mth_power_cfo` / :func:`viterbi_viterbi_phase` — blind carrier
  recovery for M-PSK by modulation stripping (z = d^M).
* :func:`sfo_track` / :func:`phase_track` — feedforward per-block trackers
  for LONG streams (sampling-clock drift / residual-CFO phase spin): block
  estimates, unwrap, fit, one parallel correction — no feedback loop.
* :func:`frame_sync` — CFO-robust differential preamble correlation over a
  static lag window.
* :func:`preamble_cfo_phase_gain` — data-aided joint CFO/phase/gain estimate
  from the located preamble.
* :class:`AcquiringReceiver` — the composed burst receiver over a
  :class:`modem_tpu.chain.PulseShapedChain`: impaired waveform -> timing ->
  frame -> carrier -> corrected decision points -> bits.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .config import TWO_PI
from .ops.impairments import farrow_delay
from .ops.sync_metric import aligned_frame_matmul


def _angle(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(im, re)


# ---------------------------------------------------------------------------
# Symbol timing: Oerder & Meyr square-law estimator
# ---------------------------------------------------------------------------

def oerder_meyr_timing(i: jnp.ndarray, q: jnp.ndarray,
                       sps: int) -> jnp.ndarray:
    """Blind symbol-timing offset from ``|x|^2`` cyclostationarity.

    Returns ``t0 [...]`` in samples, in ``[0, sps)``: pulse peaks sit at
    ``n ~= t0 (mod sps)``. The estimator projects the squared envelope onto
    the symbol-rate tone, ``S = sum_n |x[n]|^2 exp(-j*2*pi*n/sps)``, and
    reads the timing phase off ``arg S`` — insensitive to CFO and carrier
    phase (it never looks at the signal's own phase), which is why timing is
    acquired *first* in :class:`AcquiringReceiver`. Needs ``sps >= 4`` for a
    clean spectral line and an RRC-shaped input with beta > 0.
    """
    env = i * i + q * q
    n = jnp.arange(env.shape[-1], dtype=jnp.float32)
    w = TWO_PI / sps
    sr = jnp.sum(env * jnp.cos(w * n), axis=-1)
    si = jnp.sum(env * -jnp.sin(w * n), axis=-1)
    return (-_angle(sr, si) * (sps / TWO_PI)) % sps


def correct_timing(i: jnp.ndarray, q: jnp.ndarray, t0) -> tuple[
        jnp.ndarray, jnp.ndarray]:
    """Remove the fractional part of a timing estimate ``t0`` (traced).

    Applies a Farrow delay of ``1 + ((-t0) mod 1)`` samples so pulse peaks
    land on integer sample indices; the remaining *integer* offset is
    absorbed by :func:`frame_sync` (which scans integer lags). Broadcasts a
    scalar or per-channel ``t0 [...]`` against ``[..., N]`` waveforms.
    """
    mu = (-jnp.asarray(t0, jnp.float32)) % 1.0
    mu = mu[..., None] if mu.ndim else mu
    return farrow_delay(i, mu), farrow_delay(q, mu)


# ---------------------------------------------------------------------------
# Blind carrier recovery for M-PSK (modulation stripping)
# ---------------------------------------------------------------------------

def varying_delay(i: jnp.ndarray, q: jnp.ndarray, delay: jnp.ndarray,
                  max_int: int):
    """Apply a per-sample TIME-VARYING delay: ``y(n) = x(n - delay[n])``
    with ``delay`` in ``[0, max_int + 1)`` samples.

    The TPU-native resampler for slowly-drifting timing (sampling-clock
    offset): the fractional part drives per-sample cubic-Lagrange
    (Farrow) weights — pure elementwise algebra — and the integer part
    selects among ``max_int + 1`` statically-shifted copies with a
    one-hot sum (the gather rule: no ``take_along_axis``). Cost is
    ``4 * (max_int + 1)`` multiply-adds per sample, all fused
    elementwise work. The first few output samples read the zero
    history (edge transient), like :func:`~modem_tpu.ops.impairments
    .farrow_delay`.
    """
    k = jnp.clip(jnp.floor(delay).astype(jnp.int32), 0, max_int)
    f = jnp.clip(delay - k, 0.0, 1.0)
    # same Lagrange basis as farrow_delay: nodes {-1, 0, 1, 2} relative
    # to x[n0-2], evaluated at fv = 1 - f -> y[n0] ~ x(n0 - 1 - f) with
    # base n0 = n - k + 1, i.e. taps over x[n - k - 2 .. n - k + 1]
    fv = 1.0 - f
    w = (-fv * (fv - 1.0) * (fv - 2.0) / 6.0,
         (fv * fv - 1.0) * (fv - 2.0) / 2.0,
         -fv * (fv + 1.0) * (fv - 2.0) / 2.0,
         fv * (fv * fv - 1.0) / 6.0)
    n = i.shape[-1]
    pl = max_int + 2
    zl = jnp.zeros(i.shape[:-1] + (pl,), i.dtype)
    zr = jnp.zeros(i.shape[:-1] + (1,), i.dtype)
    ip = jnp.concatenate([zl, i, zr], axis=-1)
    qp = jnp.concatenate([zl, q, zr], axis=-1)
    yi = jnp.zeros_like(i)
    yq = jnp.zeros_like(q)
    for j in range(max_int + 1):
        oh = (k == j).astype(jnp.float32)
        # tap t reads x[n - j - 2 + t] = xp[n + pl - j - 2 + t]
        si = sum(w[t] * lax.dynamic_slice_in_dim(
            ip, pl - j - 2 + t, n, axis=-1) for t in range(4))
        sq = sum(w[t] * lax.dynamic_slice_in_dim(
            qp, pl - j - 2 + t, n, axis=-1) for t in range(4))
        yi = yi + oh * si
        yq = yq + oh * sq
    return yi, yq


def sfo_track(i: jnp.ndarray, q: jnp.ndarray, sps: int, block_len: int,
              max_delay: int | None = None, fit: str = "linear"):
    """Feedforward timing-drift tracking for long single-carrier streams.

    A one-shot :func:`oerder_meyr_timing` estimate goes stale under
    sampling-clock offset (SFO): at 100 ppm the decision grid walks a
    full sample every 10k samples and a fixed grid starts slicing
    between pulses. This tracker is the TPU-shaped cure — feedforward
    and fully parallel over blocks, no feedback loop:

    1. the stream splits into ``block_len``-sample blocks (``block_len``
       a multiple of ``sps`` so every block shares the symbol-tone phase
       reference) and O&M runs on every block at once;
    2. the per-block timing phases unwrap across blocks (drift per block
       << sps/2 — at 100 ppm and block_len 4096 the drift is 0.4
       samples/block);
    3. ``fit="linear"`` least-squares a line through the unwrapped
       timings (the slope IS the SFO estimate, reported in the sync
       report); ``fit="piecewise"`` interpolates them per block for
       non-linear drift;
    4. :func:`varying_delay` resamples the whole stream by the fitted
       per-sample delay — after which pulse peaks sit at ``n = 0 (mod
       sps)`` for the entire stream and any downstream burst receiver
       (:class:`AcquiringReceiver`, :func:`frame_sync`) works unchanged.

    Returns ``(ci, cq, report)`` with ``report = {"t0_blocks",
    "delay0", "sfo_ppm", "clipped"}``. The trailing partial block (if
    any) is corrected by extrapolation. ``max_delay`` bounds the applied
    integer delay (default: ``2 * sps`` plus the fitted drift range is
    assumed to fit; raise it for very long streams) —
    ``report["clipped"]`` is True per channel wherever the fitted drift
    range exceeded the bound and the correction was frozen at
    ``max_delay`` for part of the stream.
    """
    if block_len % sps:
        raise ValueError("block_len must be a multiple of sps")
    n = i.shape[-1]
    nb = n // block_len
    if nb < 2:
        raise ValueError("need >= 2 blocks to track drift")
    head = nb * block_len
    bi = i[..., :head].reshape(i.shape[:-1] + (nb, block_len))
    bq = q[..., :head].reshape(q.shape[:-1] + (nb, block_len))
    t0 = oerder_meyr_timing(bi, bq, sps)          # [..., nb] in [0, sps)
    # unwrap mod sps across blocks
    d = t0[..., 1:] - t0[..., :-1]
    d = (d + sps / 2.0) % sps - sps / 2.0
    un = jnp.concatenate(
        [t0[..., :1], t0[..., :1] + jnp.cumsum(d, axis=-1)], axis=-1)
    centers = (np.arange(nb, dtype=np.float32) + 0.5) * block_len
    if fit == "linear":
        cm = float(centers.mean())
        cc = jnp.asarray(centers - cm)
        denom = float(np.sum((centers - cm) ** 2))
        slope = jnp.sum(un * cc, axis=-1, keepdims=True) / denom
        mean = jnp.mean(un, axis=-1, keepdims=True)
        ns = jnp.arange(n, dtype=jnp.float32)
        delay = mean + slope * (ns - cm)
    elif fit == "piecewise":
        # linear interpolation between block centers, extrapolated ends
        ns = jnp.arange(n, dtype=jnp.float32)
        x = (ns - centers[0]) / block_len            # center units
        j = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nb - 2)
        frac = x - j.astype(jnp.float32)
        ohj = (j[..., :, None]
               == jnp.arange(nb - 1, dtype=jnp.int32)).astype(jnp.float32)
        lo = jnp.einsum("...b,nb->...n", un[..., :-1], ohj,
                        precision=jax.lax.Precision.HIGHEST)
        hi = jnp.einsum("...b,nb->...n", un[..., 1:], ohj,
                        precision=jax.lax.Precision.HIGHEST)
        delay = lo + frac * (hi - lo)
        slope = (un[..., -1:] - un[..., :1]) / ((nb - 1) * block_len)
    else:
        raise ValueError(f"unknown fit {fit!r}")
    # A pulse measured at phase fit(n) must be pushed BACK onto the
    # grid: apply delay C - fit(n) with C a per-channel multiple of sps
    # covering max(fit) (delaying by +fit would DOUBLE the drift). The
    # applied delay then decreases along the stream at exactly the SFO
    # rate, cancelling it; the constant C (0 mod sps) is absorbed by the
    # downstream integer frame search.
    c = sps * jnp.ceil(jnp.max(delay, axis=-1, keepdims=True) / sps)
    mi = int(2 * sps) if max_delay is None else int(max_delay)
    applied = c - delay
    # The applied delay spans [0, sps) + fitted drift range; if the
    # stream drifts further than max_delay the clip below silently
    # freezes the correction mid-stream. Surface that as a per-channel
    # report flag (device-side, works under jit) instead of degrading
    # quietly; callers needing a hard stop can assert on it host-side.
    clipped = jnp.max(applied, axis=-1) > jnp.float32(mi + 0.999)
    delay = jnp.clip(applied, 0.0, mi + 0.999)
    ci, cq = varying_delay(i, q, delay, mi)
    report = {"t0_blocks": un, "delay0": delay[..., 0],
              "sfo_ppm": slope[..., 0] * 1e6, "clipped": clipped}
    return ci, cq, report


def phase_track(di: jnp.ndarray, dq: jnp.ndarray, m: int, block_len: int,
                fit: str = "linear"):
    """Feedforward blind carrier phase/CFO tracking for long M-PSK
    decision-point streams — the carrier twin of :func:`sfo_track`.

    A one-shot :func:`viterbi_viterbi_phase` estimate goes stale under
    residual CFO (the constellation spins); a feedback PLL is the
    classic cure but serializes the stream. This tracker is feedforward
    and fully parallel over blocks:

    1. the symbol stream splits into ``block_len`` blocks and
       Viterbi&Viterbi runs on every block at once (modulation stripped
       by the M-th power), giving per-block phases mod ``2*pi/M``;
    2. the block phases unwrap across blocks (requires drift per block
       ``< pi/M`` — at 1e-3 rad/symbol and block_len 256 the drift is
       0.26 rad, inside QPSK's pi/4 margin);
    3. a ``fit="linear"`` least-squares line through the unwrapped
       phases (the slope IS the residual CFO in rad/symbol, reported)
       or ``fit="piecewise"`` per-block interpolation for non-linear
       drift (oscillator wander);
    4. the whole stream derotates by the fitted per-symbol phase.

    Returns ``(ci, cq, report)`` with ``report = {"phase_blocks",
    "cfo_rad_per_sym"}``. The inherent M-fold ambiguity remains a
    CONSTANT offset after tracking — resolved downstream exactly as for
    the one-shot estimator (known preamble or differential encoding).
    The trailing partial block (if any) is corrected by extrapolation.
    """
    n = di.shape[-1]
    nb = n // block_len
    if nb < 2:
        raise ValueError("need >= 2 blocks to track drift")
    head = nb * block_len
    bi = di[..., :head].reshape(di.shape[:-1] + (nb, block_len))
    bq = dq[..., :head].reshape(dq.shape[:-1] + (nb, block_len))
    zi, zq = _mth_power(bi, bq, m)
    pb = _angle(jnp.sum(zi, axis=-1), jnp.sum(zq, axis=-1)) / m  # [..., nb]
    # unwrap mod 2*pi/M across blocks
    per = 2.0 * np.pi / m
    d = pb[..., 1:] - pb[..., :-1]
    d = (d + per / 2.0) % per - per / 2.0
    un = jnp.concatenate(
        [pb[..., :1], pb[..., :1] + jnp.cumsum(d, axis=-1)], axis=-1)
    centers = (np.arange(nb, dtype=np.float32) + 0.5) * block_len
    ns = jnp.arange(n, dtype=jnp.float32)
    if fit == "linear":
        cm = float(centers.mean())
        cc = jnp.asarray(centers - cm)
        denom = float(np.sum((centers - cm) ** 2))
        slope = jnp.sum(un * cc, axis=-1, keepdims=True) / denom
        mean = jnp.mean(un, axis=-1, keepdims=True)
        ph = mean + slope * (ns - cm)
    elif fit == "piecewise":
        x = (ns - centers[0]) / block_len
        j = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nb - 2)
        frac = x - j.astype(jnp.float32)
        ohj = (j[..., :, None]
               == jnp.arange(nb - 1, dtype=jnp.int32)).astype(jnp.float32)
        lo = jnp.einsum("...b,nb->...n", un[..., :-1], ohj,
                        precision=jax.lax.Precision.HIGHEST)
        hi = jnp.einsum("...b,nb->...n", un[..., 1:], ohj,
                        precision=jax.lax.Precision.HIGHEST)
        ph = lo + frac * (hi - lo)
        slope = (un[..., -1:] - un[..., :1]) / ((nb - 1) * block_len)
    else:
        raise ValueError(f"unknown fit {fit!r}")
    c, s = jnp.cos(ph), jnp.sin(ph)
    ci = di * c + dq * s          # multiply by e^{-j*ph}
    cq = dq * c - di * s
    report = {"phase_blocks": un, "cfo_rad_per_sym": slope[..., 0]}
    return ci, cq, report


def _mth_power(di: jnp.ndarray, dq: jnp.ndarray, m: int):
    """z = (di + j*dq)^m via polar real-plane math (no complex dtype)."""
    r = (di * di + dq * dq) ** (m / 2.0)
    th = m * _angle(di, dq)
    return r * jnp.cos(th), r * jnp.sin(th)


def mth_power_cfo(di: jnp.ndarray, dq: jnp.ndarray, m: int) -> jnp.ndarray:
    """Blind CFO estimate from symbol-rate decision points of an M-PSK
    constellation. Returns radians/symbol in ``(-pi/m, pi/m]``.

    Raising to the M-th power strips the data phases (all M-PSK points
    collapse onto one ray); the residual per-symbol rotation is ``M`` times
    the CFO, read from the averaged one-lag autocorrelation
    ``sum_k z[k+1] * conj(z[k])``.
    """
    zi, zq = _mth_power(di, dq, m)
    ar = jnp.sum(zi[..., 1:] * zi[..., :-1] + zq[..., 1:] * zq[..., :-1],
                 axis=-1)
    ai = jnp.sum(zq[..., 1:] * zi[..., :-1] - zi[..., 1:] * zq[..., :-1],
                 axis=-1)
    return _angle(ar, ai) / m


def viterbi_viterbi_phase(di: jnp.ndarray, dq: jnp.ndarray,
                          m: int) -> jnp.ndarray:
    """Blind carrier-phase estimate for M-PSK (Viterbi & Viterbi): strip the
    modulation with z = d^M and average. Returns radians in
    ``(-pi/m, pi/m]`` — the inherent M-fold ambiguity is resolved by a known
    preamble (:func:`preamble_cfo_phase_gain`) or differential encoding
    (:class:`modem_tpu.chain.DifferentialChain`)."""
    zi, zq = _mth_power(di, dq, m)
    return _angle(jnp.sum(zi, axis=-1), jnp.sum(zq, axis=-1)) / m


# ---------------------------------------------------------------------------
# Frame synchronization: CFO-robust differential preamble correlation
# ---------------------------------------------------------------------------

def frame_sync(
    yi: jnp.ndarray,
    yq: jnp.ndarray,
    preamble: np.ndarray,
    sps: int,
    max_lag: int,
) -> jnp.ndarray:
    """Locate a known preamble in a matched-filtered waveform.

    ``preamble [P, 2]`` are the known symbols' I/Q; candidate symbol grids
    start at sample lags ``t in [0, max_lag)``. Correlating differential
    products ``y[t+(k+1)sps] * conj(y[t+k*sps])`` against the preamble's own
    differentials makes the metric invariant to constant phase **and** CFO
    (a constant offset rotates every product equally), so frame sync needs no
    prior carrier estimate. Returns the argmax lag ``[...]`` (int32) — the
    *absolute* sample index of preamble symbol 0's decision instant in ``y``
    (all group delays — the chain's ``span*sps``, any channel delay, the
    Farrow shift — are part of the located lag).

    The search is one static gather ``[max_lag, P]`` + a reduction — an
    acquisition-sized cost paid once per burst, fully parallel over channels.
    """
    p = np.asarray(preamble, np.float32)
    need = max_lag + (p.shape[0] - 1) * sps + 1
    if yi.shape[-1] < need:
        raise ValueError(
            f"frame_sync needs >= {need} samples for max_lag={max_lag}, "
            f"got {yi.shape[-1]}"
        )
    dpi = p[1:, 0] * p[:-1, 0] + p[1:, 1] * p[:-1, 1]
    dpq = p[1:, 1] * p[:-1, 0] - p[1:, 0] * p[:-1, 1]
    lags = jnp.arange(max_lag, dtype=jnp.int32)[:, None]
    ks = jnp.arange(p.shape[0], dtype=jnp.int32)[None, :] * sps
    idx = lags + ks  # [max_lag, P]
    wi = yi[..., idx]  # [..., max_lag, P]
    wq = yq[..., idx]
    ui = wi[..., 1:] * wi[..., :-1] + wq[..., 1:] * wq[..., :-1]
    uq = wq[..., 1:] * wi[..., :-1] - wi[..., 1:] * wq[..., :-1]
    cr = jnp.sum(ui * dpi + uq * dpq, axis=-1)
    ci = jnp.sum(uq * dpi - ui * dpq, axis=-1)
    return jnp.argmax(cr * cr + ci * ci, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Data-aided carrier estimation from the located preamble
# ---------------------------------------------------------------------------

def preamble_cfo_phase_gain(
    di: jnp.ndarray,
    dq: jnp.ndarray,
    preamble: np.ndarray,
):
    """Joint CFO/phase/gain from received preamble decision points.

    ``di, dq [..., P]`` are the symbol-rate samples at the located frame
    start; ``preamble [P, 2]`` the known symbols. With
    ``p_k = d_k * conj(a_k)`` (data wiped), the CFO is the phase slope of
    ``p`` (one-lag autocorrelation) and, after derotating it, gain and phase
    fall out of the matched sum ``sum p~_k / sum |a_k|^2``. Returns
    ``(cfo_rad_per_symbol, phase_rad, gain)``, each ``[...]``.
    """
    a = np.asarray(preamble, np.float32)
    ai, aq = jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1])
    pi = di * ai + dq * aq
    pq = dq * ai - di * aq
    ar = jnp.sum(pi[..., 1:] * pi[..., :-1] + pq[..., 1:] * pq[..., :-1],
                 axis=-1)
    aj = jnp.sum(pq[..., 1:] * pi[..., :-1] - pi[..., 1:] * pq[..., :-1],
                 axis=-1)
    cfo = _angle(ar, aj)  # rad/symbol
    k = jnp.arange(a.shape[0], dtype=jnp.float32)
    th = cfo[..., None] * k
    c, s = jnp.cos(th), jnp.sin(th)
    ri = jnp.sum(pi * c + pq * s, axis=-1)  # p~ = p * exp(-j*cfo*k)
    rq = jnp.sum(pq * c - pi * s, axis=-1)
    e = float(np.sum(a[:, 0] ** 2 + a[:, 1] ** 2))
    phase = _angle(ri, rq)
    gain = jnp.sqrt(ri * ri + rq * rq) / e
    return cfo, phase, gain


# ---------------------------------------------------------------------------
# Decision-directed carrier phase tracking (block rate)
# ---------------------------------------------------------------------------

def dd_phase_track(
    di: jnp.ndarray,
    dq: jnp.ndarray,
    lut: np.ndarray,
    block: int = 16,
):
    """Track residual carrier phase across a symbol stream, decision-directed.

    A one-shot preamble CFO/phase estimate leaves a residual slope (ISI and
    noise bias it; see the acquisition tests) that accumulates over long
    payloads. This tracker corrects it the TPU way: a ``lax.scan`` at
    **block** rate (not symbol rate — a feedback loop over ``K/block`` steps
    of fully vectorized work). Per block: derotate by the carried phase,
    min-distance slice against ``lut``, measure the average rotation of the
    received points off their decisions, fold it into the carry.

    Returns ``(ci, cq, phases)`` with ``phases [..., n_blocks]`` the absolute
    correction applied per block. Tolerates residual CFO up to roughly
    ``pi / (2*M*block)`` rad/symbol (the slice must stay in the right
    decision cell within one block).
    """
    import jax

    from .ops.slicer import lut_slice

    k = di.shape[-1]
    nb = -(-k // block)
    pad = nb * block - k
    if pad:
        z = jnp.zeros(di.shape[:-1] + (pad,), di.dtype)
        di = jnp.concatenate([di, z], axis=-1)
        dq = jnp.concatenate([dq, z], axis=-1)
    bshape = di.shape[:-1] + (nb, block)
    bi = jnp.moveaxis(di.reshape(bshape), -2, 0)  # [nb, ..., block]
    bq = jnp.moveaxis(dq.reshape(bshape), -2, 0)
    # Keep the LUT as host numpy: the scan body closes over it, and a
    # device-array closure becomes a tracer inside the body (breaking
    # lut_slice's host-side tap prep).
    lut_np = np.asarray(lut, np.float32)

    def step(phi, xs):
        xi, xq = xs
        c = jnp.cos(phi)[..., None]
        s = jnp.sin(phi)[..., None]
        ri = xi * c + xq * s          # rotate by -phi
        rq = xq * c - xi * s
        a = jnp.asarray(lut_np)[lut_slice(ri, rq, lut_np)]  # [..., block, 2]
        er = jnp.sum(ri * a[..., 0] + rq * a[..., 1], axis=-1)
        ei = jnp.sum(rq * a[..., 0] - ri * a[..., 1], axis=-1)
        err = _angle(er, ei)
        phi_new = phi + err
        c2, s2 = jnp.cos(err)[..., None], jnp.sin(err)[..., None]
        yi = ri * c2 + rq * s2
        yq = rq * c2 - ri * s2
        return phi_new, (yi, yq, phi_new)

    phi0 = jnp.zeros(di.shape[:-1], jnp.float32)
    _, (yi, yq, phases) = jax.lax.scan(step, phi0, (bi, bq))
    yi = jnp.moveaxis(yi, 0, -2).reshape(di.shape)[..., :k]
    yq = jnp.moveaxis(yq, 0, -2).reshape(dq.shape)[..., :k]
    return yi, yq, jnp.moveaxis(phases, 0, -1)


def dd_carrier_track(
    di: jnp.ndarray,
    dq: jnp.ndarray,
    lut: np.ndarray,
    block: int = 16,
    phase_gain: float = 0.7,
    freq_gain: float = 0.25,
):
    """Second-order decision-directed carrier loop (phase **and** frequency).

    :func:`dd_phase_track` is first-order: under a residual CFO it converges
    to a constant phase *lag* of roughly ``slope·block`` (each step only
    cancels the error it just measured, then the ramp re-accrues). This
    loop also integrates the error into a frequency state, so a constant
    slope is tracked with zero steady-state lag — the classic type-II PLL,
    run the TPU way at block rate: the scan carry is ``(phi, freq)`` per
    channel, the within-block derotation includes the per-symbol slope
    ``freq·j``, and all ``block`` symbols process vectorized.

    Returns ``(ci, cq, report)`` with ``report = {"phase", "freq"}`` the
    per-block carry trajectories (``freq`` in rad/symbol; its tail is an
    estimate of the residual CFO).
    """
    import jax

    from .ops.slicer import lut_slice

    k = di.shape[-1]
    nb = -(-k // block)
    pad = nb * block - k
    if pad:
        z = jnp.zeros(di.shape[:-1] + (pad,), di.dtype)
        di = jnp.concatenate([di, z], axis=-1)
        dq = jnp.concatenate([dq, z], axis=-1)
    bshape = di.shape[:-1] + (nb, block)
    bi = jnp.moveaxis(di.reshape(bshape), -2, 0)  # [nb, ..., block]
    bq = jnp.moveaxis(dq.reshape(bshape), -2, 0)
    lut_np = np.asarray(lut, np.float32)
    j = jnp.arange(block, dtype=jnp.float32)

    def step(carry, xs):
        phi, f = carry
        xi, xq = xs
        th = phi[..., None] + f[..., None] * j  # predicted phase per symbol
        c, s = jnp.cos(th), jnp.sin(th)
        ri = xi * c + xq * s                    # rotate by -theta
        rq = xq * c - xi * s
        a = jnp.asarray(lut_np)[lut_slice(ri, rq, lut_np)]  # [..., block, 2]
        er = jnp.sum(ri * a[..., 0] + rq * a[..., 1], axis=-1)
        ei = jnp.sum(rq * a[..., 0] - ri * a[..., 1], axis=-1)
        err = _angle(er, ei)                    # mean residual rotation
        # apply the measured correction to this block's output
        c2, s2 = jnp.cos(err)[..., None], jnp.sin(err)[..., None]
        yi = ri * c2 + rq * s2
        yq = rq * c2 - ri * s2
        phi_new = phi + f * block + phase_gain * err
        f_new = f + freq_gain * err / block
        return (phi_new, f_new), (yi, yq, phi_new, f_new)

    phi0 = jnp.zeros(di.shape[:-1], jnp.float32)
    f0 = jnp.zeros(di.shape[:-1], jnp.float32)
    _, (yi, yq, phases, freqs) = jax.lax.scan(step, (phi0, f0), (bi, bq))
    yi = jnp.moveaxis(yi, 0, -2).reshape(di.shape)[..., :k]
    yq = jnp.moveaxis(yq, 0, -2).reshape(dq.shape)[..., :k]
    report = {"phase": jnp.moveaxis(phases, 0, -1),
              "freq": jnp.moveaxis(freqs, 0, -1)}
    return yi, yq, report


# ---------------------------------------------------------------------------
# Composed burst receiver
# ---------------------------------------------------------------------------

class AcquiringReceiver:
    """Burst receiver with full feedforward acquisition over a
    :class:`modem_tpu.chain.PulseShapedChain`.

    The transmitted burst is ``preamble_symbols`` followed by the payload,
    RRC-shaped by the chain's TX. The received waveform may carry an unknown
    integer+fractional delay (up to ``max_lag`` samples of the integer part
    after the chain's own group delay), CFO, phase, and gain. ``rx`` runs:

    1. :func:`oerder_meyr_timing` + :func:`correct_timing` (blind, CFO-proof);
    2. matched filter (the chain's);
    3. :func:`frame_sync` (differential — CFO-proof);
    4. :func:`preamble_cfo_phase_gain` on the located preamble;
    5. derotate/rescale payload decision points, slice to bits.

    Everything is one jittable graph with static shapes; the only
    data-dependent value is the frame lag, consumed by one-hot matmul
    selections (never gathers — the gather rule, BENCH.md).
    """

    def __init__(self, chain, preamble_symbols: np.ndarray, max_lag: int,
                 eq_taps: int | None = None, eq_ridge: float = 1e-3,
                 track_block: int | None = None, track_order: int = 1):
        if chain.carrier_hz is not None:
            raise NotImplementedError(
                "AcquiringReceiver operates at complex baseband; downconvert "
                "passband first (chain.downconvert)"
            )
        self.chain = chain
        self.pre_syms = np.asarray(preamble_symbols, np.int64)
        self.pre_iq = np.asarray(chain.lut, np.float32)[self.pre_syms]
        self.max_lag = int(max_lag)
        #: optional preamble-trained symbol-spaced LMMSE equalizer
        #: (:mod:`modem_tpu.ops.equalizer`): corrects multipath ISI the
        #: matched filter cannot; ``eq_taps`` is the complex FIR length.
        self.eq_taps = eq_taps
        self.eq_ridge = eq_ridge
        if eq_taps is not None and eq_taps > len(self.pre_syms) // 2:
            raise ValueError("eq_taps should be << preamble length")
        #: optional decision-directed block phase tracking
        #: (:func:`dd_phase_track`) over the payload — corrects the residual
        #: CFO/phase the one-shot preamble estimate leaves behind.
        #: ``track_order=2`` uses the second-order loop
        #: (:func:`dd_carrier_track`): zero steady-state lag under residual
        #: CFO.
        self.track_block = track_block
        if track_order not in (1, 2):
            raise ValueError("track_order must be 1 or 2")
        self.track_order = track_order

    def tx_burst(self, payload_bits: jnp.ndarray):
        """Preamble + payload bits -> baseband I/Q via the chain's TX."""
        from .utils.bits import unpack_symbols

        pre_bits = unpack_symbols(
            jnp.asarray(self.pre_syms, jnp.int32),
            self.chain.scheme.bits_per_symbol,
        )
        pre_bits = jnp.broadcast_to(
            pre_bits, payload_bits.shape[:-1] + pre_bits.shape[-1:]
        )
        bits = jnp.concatenate([pre_bits, payload_bits], axis=-1)
        return self.chain.tx(bits)

    def acquire(self, i: jnp.ndarray, q: jnp.ndarray, n_payload: int):
        """Impaired waveform -> (payload decision points, sync report).

        ``max_lag`` must cover the full lag of preamble symbol 0's decision
        instant: the chain's ``span*sps`` group delay plus any channel
        delay. Waveforms shorter than the last candidate decision instant
        are zero-padded (silence after the burst).
        """
        sps = self.chain.sps
        p = self.pre_iq.shape[0]
        # With an equalizer, gather extra trailing decision points so the
        # last payload symbols' windows see the channel's echo tail instead
        # of zero padding.
        extra = 0 if self.eq_taps is None else self.eq_taps
        n_tot = p + n_payload + extra
        need = self.max_lag + (n_tot - 1) * sps + 1
        if i.shape[-1] < need:
            # The receiver listens past the burst end: silence. Zero-pad so
            # every candidate lag's last decision instant is in range.
            pad = jnp.zeros(i.shape[:-1] + (need - i.shape[-1],), i.dtype)
            i = jnp.concatenate([i, pad], axis=-1)
            q = jnp.concatenate([q, pad], axis=-1)
        t0 = oerder_meyr_timing(i, q, sps)
        ci, cq = correct_timing(i, q, t0)
        yi, yq = self.chain.matched_filter(ci, cq)
        lag = frame_sync(yi, yq, self.pre_iq, sps, self.max_lag)
        # Decision instants lag + k*sps, extracted without a gather (the
        # per-channel take_along_axis was ~22% of the whole rx pass on
        # hardware, BENCH.md): decompose lag = a*sps + b, select the
        # polyphase lane b with a one-hot reduction, then shift by the
        # symbol offset a with the banded one-hot matmul. Bit-exact.
        a_max = -(-self.max_lag // sps)  # lag // sps < a_max
        tneed = (n_tot + a_max) * sps
        if yi.shape[-1] < tneed:
            zp = jnp.zeros(yi.shape[:-1] + (tneed - yi.shape[-1],),
                           yi.dtype)
            yi = jnp.concatenate([yi, zp], axis=-1)
            yq = jnp.concatenate([yq, zp], axis=-1)
        yri = yi[..., :tneed].reshape(yi.shape[:-1] + (n_tot + a_max, sps))
        yrq = yq[..., :tneed].reshape(yq.shape[:-1] + (n_tot + a_max, sps))
        ohb = (jnp.arange(sps, dtype=jnp.int32)
               == (lag % sps)[..., None]).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        pi_ = jnp.einsum("...kb,...b->...k", yri, ohb, precision=hp)
        pq_ = jnp.einsum("...kb,...b->...k", yrq, ohb, precision=hp)
        di, dq = aligned_frame_matmul(pi_, pq_, lag // sps, n_tot, a_max)
        cfo, phase, gain = preamble_cfo_phase_gain(
            di[..., :p], dq[..., :p], self.pre_iq
        )
        # Derotate/rescale the whole burst (preamble + payload) so the
        # corrected preamble can train the optional equalizer.
        k = jnp.arange(n_tot, dtype=jnp.float32)
        th = cfo[..., None] * k + phase[..., None]
        c, s = jnp.cos(th), jnp.sin(th)
        g = jnp.maximum(gain[..., None], 1e-12)
        ci = (di * c + dq * s) / g
        cq = (dq * c - di * s) / g
        report = {"timing": t0, "lag": lag, "cfo_rad_per_symbol": cfo,
                  "phase": phase, "gain": gain}
        if self.eq_taps is not None:
            from .ops.equalizer import apply_equalizer, train_lmmse

            wr, wi = train_lmmse(ci[..., :p], cq[..., :p], self.pre_iq,
                                 self.eq_taps, self.eq_ridge)
            ci, cq = apply_equalizer(ci, cq, wr, wi)
            report["eq_taps"] = (wr, wi)
        ci = ci[..., p:p + n_payload]
        cq = cq[..., p:p + n_payload]
        if self.track_block is not None:
            if self.track_order == 2:
                ci, cq, trk = dd_carrier_track(
                    ci, cq, self.chain.lut, self.track_block)
                report["tracked_phase"] = trk["phase"]
                report["tracked_freq"] = trk["freq"]
            else:
                ci, cq, phases = dd_phase_track(
                    ci, cq, self.chain.lut, self.track_block)
                report["tracked_phase"] = phases
        return (ci, cq), report

    def rx(self, i: jnp.ndarray, q: jnp.ndarray,
           n_payload: int) -> jnp.ndarray:
        """Impaired waveform -> payload bits ``[..., n_payload*bps]``."""
        from .ops.slicer import lut_slice
        from .utils.bits import unpack_symbols

        (ri, rq), _ = self.acquire(i, q, n_payload)
        syms = lut_slice(ri, rq, self.chain.lut)
        return unpack_symbols(syms, self.chain.scheme.bits_per_symbol)

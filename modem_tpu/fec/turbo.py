"""Turbo codes (LTE-shaped PCCC): RSC pair + QPP interleaver + max-log BCJR.

The fifth FEC family here (conv/Viterbi, Reed-Solomon, QC-LDPC, polar,
turbo) — parallel-concatenated convolutional codes are what LTE deploys
on its data channels; with this the framework covers every code class
the deployed cellular/satellite standards use downstream of the soft
outputs it produces. The reference has no FEC at all (SURVEY.md "What
the reference is NOT").

Construction (3GPP LTE shape): two identical 8-state recursive
systematic convolutional encoders, feedback ``g0 = 1 + D^2 + D^3``
(013 octal) and output ``g1 = 1 + D + D^3`` (015 octal), the second fed
through a quadratic permutation polynomial (QPP) interleaver
``pi(i) = (f1 i + f2 i^2) mod K``; both trellises are terminated with 3
feedback-clearing tail bits, so the rate is exactly ``K/(3K + 12)``.

TPU shaping:

* **QPP interleaving is a one-hot [K, K] matmul** (both directions), not
  a gather — the gather rule (BENCH.md round 2). For LLRs the matmul
  runs under ``Precision.HIGHEST`` (exact one-hot selection); for bits
  it is an integer matmul.
* **Encoding is a ``lax.scan``** over the time axis with the 3 state
  bits as int32 planes, fully batched over codewords.
* **Max-log BCJR as two 8-wide scans.** Branch metrics are closed-form
  in the systematic/parity/a-priori LLRs; the alpha (forward) and beta
  (backward) recursions index the 8-state trellis with STATIC
  predecessor/successor tables unrolled into 8-way max expressions — no
  ``take_along_axis``, mirroring the gather-free Viterbi ACS
  (`fec/conv.py`). Per-step normalization keeps the metrics bounded.
* **Iterations are a static Python loop** (default 6) of
  decoder-1 -> interleave -> decoder-2 -> deinterleave extrinsic
  exchange; each half-iteration is one compiled forward+backward scan
  pair over the whole batch.

LLR convention matches the framework (positive = bit 0,
:mod:`modem_tpu.ops.llr`), so chain/OFDM/SC-FDE soft outputs feed
straight in.

Wire layout of a codeword: ``[sys K | par1 K | par2 K | tail1 (3 sys,
3 par) | tail2 (3 sys, 3 par)]``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# LTE QPP parameters for a few standard block sizes (3GPP 36.212 tbl
# 5.1.3-3 entries); any (k, f1, f2) whose polynomial is a bijection is
# accepted — bijectivity is checked at construction.
_QPP = {40: (3, 10), 64: (7, 16), 128: (15, 32), 256: (15, 32),
        512: (31, 64), 1024: (31, 64), 2048: (21, 120), 6144: (263, 480)}

_NEG = np.float32(-1e30)


class TurboCode:
    """Rate ``K/(3K+12)`` LTE-shaped turbo code with max-log decoding."""

    def __init__(self, k: int = 1024, f1: int | None = None,
                 f2: int | None = None, iters: int = 6):
        self.k = int(k)
        if f1 is None or f2 is None:
            if k not in _QPP:
                raise ValueError(
                    f"no built-in QPP for K={k}; pass f1/f2 explicitly "
                    f"(built-ins: {sorted(_QPP)})")
            f1, f2 = _QPP[k]
        self.f1, self.f2 = int(f1), int(f2)
        i = np.arange(k, dtype=np.int64)
        pi = (self.f1 * i + self.f2 * i * i) % k
        if len(np.unique(pi)) != k:
            raise ValueError(f"QPP (f1={f1}, f2={f2}) is not a "
                             f"permutation mod {k}")
        self._pi = pi
        # one-hot interleaver matrices: x_interleaved[i] = x[pi[i]]
        p = np.zeros((k, k), np.float32)
        p[i, pi] = 1.0
        self._p = p        # interleave:   y = P  @ x  (as x @ P.T)
        self._pt = p.T.copy()
        self.iters = int(iters)
        self.n = 3 * self.k + 12

    # ------------------------------------------------------------------
    # RSC constituent encoder (scan over time)
    # ------------------------------------------------------------------

    @staticmethod
    def _rsc(bits: jnp.ndarray):
        """``[..., T]`` info bits -> (parity ``[..., T]``, tail_sys
        ``[..., 3]``, tail_par ``[..., 3]``). Feedback-terminated."""
        x = jnp.moveaxis(bits.astype(jnp.int32), -1, 0)  # [T, ...]
        s0 = jnp.zeros((3,) + x.shape[1:], jnp.int32)

        def step(s, u):
            a = u ^ s[1] ^ s[2]
            par = a ^ s[0] ^ s[2]
            return jnp.stack([a, s[0], s[1]]), par

        s, par = lax.scan(step, s0, x)
        # 3 termination steps: u = s2 ^ s3 zeroes the feedback bit
        ts, tp = [], []
        for _ in range(3):
            u = s[1] ^ s[2]
            ts.append(u)
            tp.append(u ^ s[1] ^ s[2] ^ s[0] ^ s[2])  # a=0 -> par=s0^s2
            s = jnp.stack([jnp.zeros_like(u), s[0], s[1]])
        return (jnp.moveaxis(par, 0, -1),
                jnp.stack(ts, axis=-1), jnp.stack(tp, axis=-1))

    def encode(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., K]`` info bits -> ``[..., 3K+12]`` codeword."""
        if bits.shape[-1] != self.k:
            raise ValueError(f"expected {self.k} bits, got {bits.shape[-1]}")
        b = bits.astype(jnp.int32)
        b2 = b @ jnp.asarray(self._pt, jnp.int32)   # b2[i] = b[pi[i]]
        par1, t1s, t1p = self._rsc(b)
        par2, t2s, t2p = self._rsc(b2)
        return jnp.concatenate(
            [b, par1, par2, t1s, t1p, t2s, t2p], axis=-1)

    # ------------------------------------------------------------------
    # max-log BCJR for one constituent
    # ------------------------------------------------------------------

    # static trellis tables: state s = (s1, s2, s3) packed s1*4+s2*2+s3
    @staticmethod
    def _tables():
        nxt = np.zeros((8, 2), np.int64)   # next state for info bit u
        par = np.zeros((8, 2), np.int64)   # parity emitted
        for s in range(8):
            s1, s2, s3 = (s >> 2) & 1, (s >> 1) & 1, s & 1
            for u in (0, 1):
                a = u ^ s2 ^ s3
                par[s, u] = a ^ s1 ^ s3
                nxt[s, u] = (a << 2) | (s1 << 1) | s2
        return nxt, par

    def _scans(self, gam, a0, bT, t_keep):
        """Shared alpha/beta/app machinery over stacked gammas
        ``gam [T', ..., 8, 2]`` with inits ``a0/bT [..., 8]``; returns
        app LLRs for the first ``t_keep`` steps, ``[t_keep, ...]``."""
        nxt, _ = self._tables()

        def fwd(alpha, g):
            cand = alpha[..., None] + g
            outs = []
            for sp in range(8):
                # the two (s, u) branches landing on sp (static table)
                terms = [cand[..., s, u] for s in range(8)
                         for u in (0, 1) if nxt[s, u] == sp]
                outs.append(jnp.maximum(terms[0], terms[1]))
            new = jnp.stack(outs, axis=-1)
            new = new - jnp.max(new, axis=-1, keepdims=True)
            return new, alpha

        _, alphas = lax.scan(fwd, a0, gam)          # alphas[t] = pre-step

        def bwd(beta, g):
            outs = []
            for s in range(8):
                b0 = g[..., s, 0] + beta[..., nxt[s, 0]]
                b1 = g[..., s, 1] + beta[..., nxt[s, 1]]
                outs.append(jnp.maximum(b0, b1))
            new = jnp.stack(outs, axis=-1)
            new = new - jnp.max(new, axis=-1, keepdims=True)
            return new, beta

        _, betas = lax.scan(bwd, bT, gam, reverse=True)  # betas[t] = post

        def app(carry, x):
            g, alpha, beta = x
            m = alpha[..., None] + g  # [..., 8, 2]
            m = m + jnp.stack(
                [jnp.stack([beta[..., nxt[s, u]] for u in (0, 1)],
                           axis=-1) for s in range(8)], axis=-2)
            m0 = jnp.max(m[..., 0], axis=-1)
            m1 = jnp.max(m[..., 1], axis=-1)
            return carry, m0 - m1

        _, llr_app = lax.scan(
            app, 0, (gam[:t_keep], alphas[:t_keep], betas[:t_keep]))
        return llr_app                               # [t_keep, ...]

    def _gammas(self, lsys, lpar, la, t_sys, t_par):
        """Branch metrics ``gamma[t][..., s, u] = 0.5*((1-2u)(lsys+la)
        + (1-2p)lpar)``; the tail steps carry ``la = 0``."""
        _, par = self._tables()
        lu = jnp.concatenate([lsys + la, t_sys], axis=-1)
        lp = jnp.concatenate([lpar, t_par], axis=-1)
        lu_t = jnp.moveaxis(lu, -1, 0)[..., None]   # [T+3, ..., 1]
        lp_t = jnp.moveaxis(lp, -1, 0)[..., None]
        usig = jnp.asarray([0.5, -0.5], jnp.float32)     # 0.5*(1-2u)
        psig = jnp.asarray(0.5 * (1.0 - 2.0 * par), jnp.float32)  # [8, 2]
        return lu_t[..., None, :] * usig + lp_t[..., None, :] * psig

    def _bcjr(self, lsys, lpar, la, t_sys, t_par):
        """One full-block max-log BCJR pass.

        ``lsys, lpar, la [..., T]`` info-section LLRs (positive = bit 0);
        ``t_sys, t_par [..., 3]`` this constituent's tail LLRs. Returns
        the EXTRINSIC LLRs ``[..., T]``.
        """
        t = lsys.shape[-1]
        gam = self._gammas(lsys, lpar, la, t_sys, t_par)
        neg = jnp.float32(_NEG)
        a0 = jnp.full(gam.shape[1:-2] + (8,), neg).at[..., 0].set(0.0)
        bT = jnp.full(gam.shape[1:-2] + (8,), neg).at[..., 0].set(0.0)
        llr_app = self._scans(gam, a0, bT, t)
        llr_app = jnp.moveaxis(llr_app, 0, -1)       # [..., T]
        return llr_app - (lsys + la)

    def _bcjr_windowed(self, lsys, lpar, la, t_sys, t_par,
                       window: int, guard: int):
        """Sliding-window max-log BCJR: the throughput form.

        The trellis is cut into ``window``-step cores processed as BATCH
        elements of one short scan (sequential depth ``window + 2*guard``
        instead of T+3 — the `fec/conv.decode_soft_windowed` trick).
        Each window carries ``guard`` warm-up steps on both sides whose
        alpha/beta start NEUTRAL (all-zero metrics) and converge onto the
        survivor mass within a few constraint lengths — except at the
        true trellis ends, where special pin-gammas (only the state-0
        self-loop survives) propagate the exact initial/terminal
        conditions through the padding, so the boundary conditions are
        not approximated. Standard hardware-decoder practice; the
        approximation error for ``guard >~ 5 constraint lengths`` is far
        below max-log's own loss (BER-verified in tests/test_turbo.py).
        """
        t = lsys.shape[-1]
        tp = t + 3
        gam = self._gammas(lsys, lpar, la, t_sys, t_par)  # [T+3, ..., 8, 2]
        n_win = -(-tp // window)
        pad_tail = n_win * window - tp
        # pin-gamma: only (state 0, u=0) survives — walks the padding and
        # the +/- guard extensions while carrying the exact end conditions
        pin = np.full((8, 2), _NEG, np.float32)
        pin[0, 0] = 0.0
        pin = jnp.broadcast_to(jnp.asarray(pin), (1,) + gam.shape[1:])
        parts = [jnp.broadcast_to(pin, (guard,) + gam.shape[1:]), gam]
        if pad_tail:
            parts.append(jnp.broadcast_to(pin,
                                          (pad_tail,) + gam.shape[1:]))
        parts.append(jnp.broadcast_to(pin, (guard,) + gam.shape[1:]))
        ge = jnp.concatenate(parts, axis=0)  # [n_win*window + 2g, ...]
        wins = jnp.stack(
            [lax.slice_in_dim(ge, w * window, w * window + window
                              + 2 * guard, axis=0)
             for w in range(n_win)], axis=1)  # [window+2g, n_win, ...]
        zero = jnp.zeros(wins.shape[1:-2] + (8,), jnp.float32)
        llr_app = self._scans(wins, zero, zero, guard + window)
        core = llr_app[guard:]                        # [window, n_win, ...]
        flat = jnp.moveaxis(core, (0, 1), (-1, -2))   # [..., n_win, window]
        flat = flat.reshape(flat.shape[:-2] + (n_win * window,))[..., :t]
        return flat - (lsys + la)

    # ------------------------------------------------------------------

    def _il(self, x: jnp.ndarray) -> jnp.ndarray:
        """LLR interleave ``y[i] = x[pi[i]]`` (exact one-hot matmul)."""
        return jnp.einsum("...k,jk->...j", x, jnp.asarray(self._p),
                          precision=lax.Precision.HIGHEST)

    def _dil(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...k,jk->...j", x, jnp.asarray(self._pt),
                          precision=lax.Precision.HIGHEST)

    def decode(self, llrs: jnp.ndarray, iters: int | None = None,
               window: int | None = None, guard: int = 32,
               backend: str = "auto",
               early_exit: bool = False) -> jnp.ndarray:
        """``[..., 3K+12]`` channel LLRs -> ``[..., K]`` hard info bits
        after ``iters`` max-log turbo iterations.

        ``window``: if set, each BCJR half-iteration runs the
        sliding-window form (:meth:`_bcjr_windowed`) — sequential depth
        ``window + 2*guard`` instead of K+3, with the windows processed
        as batch elements (the throughput form; BER equivalence at the
        operating point is tested).

        ``backend``: ``"pallas"`` fuses each windowed half-iteration
        into ONE kernel (alpha + beta + APP, gammas assembled on the
        fly — :mod:`modem_tpu.ops.pallas_bcjr`), bit-identical to the
        XLA windowed form at the same (window, guard); ``"auto"``
        (default) picks pallas on TPU backends whenever ``window`` is
        set (and defaults ``window=256`` there), ``"xla"`` otherwise.

        ``early_exit``: device-side ``lax.while_loop`` that stops as
        soon as no codeword's hard decisions changed in the last full
        iteration (``iters`` stays the cap). Converged output is
        identical to the fixed-iteration decode whenever decisions are
        stable from the stopping point on (the typical case; BER
        equivalence at the operating point is tested).
        """
        if llrs.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} LLRs, got {llrs.shape[-1]}")
        it = self.iters if iters is None else int(iters)
        if backend == "auto":
            on_tpu = jax.default_backend() in ("tpu", "axon")
            backend = "pallas" if on_tpu else "xla"
        if backend == "pallas":
            from ..ops.pallas_bcjr import bcjr_windowed, pick_guard
            if window is None:
                # round-5 auto geometry: one window covering the whole
                # trellis where VMEM allows (pick_geometry) — the EXACT
                # full-block BCJR at ~1.5x fewer steps than the legacy
                # 256-step multi-window schedule
                bcjr = lambda *a: bcjr_windowed(  # noqa: E731
                    *a, window=None, guard=int(guard))
            else:
                g = pick_guard(int(window), int(guard))
                bcjr = lambda *a: bcjr_windowed(  # noqa: E731
                    *a, window=int(window), guard=g)
        elif backend != "xla":
            raise ValueError(f"unknown backend {backend!r}")
        elif window is not None:
            bcjr = lambda *a: self._bcjr_windowed(  # noqa: E731
                *a, window=int(window), guard=int(guard))
        else:
            bcjr = self._bcjr
        k = self.k
        x = llrs.astype(jnp.float32)
        ls = x[..., :k]
        lp1 = x[..., k:2 * k]
        lp2 = x[..., 2 * k:3 * k]
        t1s = x[..., 3 * k:3 * k + 3]
        t1p = x[..., 3 * k + 3:3 * k + 6]
        t2s = x[..., 3 * k + 6:3 * k + 9]
        t2p = x[..., 3 * k + 9:]
        ls2 = self._il(ls)
        la1 = jnp.zeros_like(ls)
        le1 = jnp.zeros_like(ls)

        def one_iter(la1, le1):
            le1 = bcjr(ls, lp1, la1, t1s, t1p)
            la2 = self._il(le1)
            le2 = bcjr(ls2, lp2, la2, t2s, t2p)
            return self._dil(le2), le1

        if early_exit:
            # decision-stability stopping: run full iterations while ANY
            # codeword's hard decisions still changed in the last one (the
            # LDPC decoder's batched-syndrome pattern; turbo has no cheap
            # syndrome, so stability is the standard device-side rule). At
            # operating SNR most batches converge in 2-4 of the 6-8
            # budgeted iterations.
            def cond(st):
                _, _, _, i, ch = st
                return jnp.logical_and(i < it, ch)

            def body(st):
                la1, le1, prev, i, _ = st
                la1, le1 = one_iter(la1, le1)
                hard = ((ls + la1 + le1) < 0).astype(jnp.int8)
                return la1, le1, hard, i + 1, jnp.any(hard != prev)

            prev0 = jnp.full(ls.shape, -1, jnp.int8)
            la1, le1, _, _, _ = jax.lax.while_loop(
                cond, body, (la1, le1, prev0, jnp.int32(0),
                             jnp.bool_(True)))
        else:
            for _ in range(it):
                la1, le1 = one_iter(la1, le1)
        app = ls + la1 + le1
        return (app < 0).astype(jnp.int32)

"""Convolutional coding: block encoder + TPU-native Viterbi decoder.

New capability (the reference has no FEC; its RX stops at soft I/Q,
`/root/reference/src/bin/demodulate.rs:41-43`). This closes the loop the
soft-output layer opens (:mod:`modem_tpu.ops.llr` produces LLRs "for
downstream FEC" — here is the downstream FEC).

TPU-first shape of the classic algorithms:

* **Encoder** — the shift-register recursion is a static XOR of delayed bit
  planes: one stacked shift + sum-mod-2 per generator, fully parallel over
  time and channels (no scan).
* **Viterbi** — add-compare-select over all ``S = 2^(K-1)`` states is one
  vectorized butterfly per trellis step: a ``lax.scan`` over time whose body
  is two static gathers + one ``[S, n] x [n]`` contraction, batched over
  channels. Path metrics are renormalized each step (subtract the min) so
  f32 never saturates on long blocks. Traceback is a second (reverse) scan
  over the stored per-state decisions.

The trellis is **terminated**: ``encode`` appends ``K-1`` zero flush bits,
``decode`` tracks back from state 0 — block decisions are exactly the
maximum-likelihood path (hard: minimum Hamming distance; soft: minimum
correlation cost ``sum llr_j * c_j`` in this framework's positive-LLR =
bit-0 convention).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# NB: numpy scalars, not jnp — a module-level jnp constant would initialize
# the XLA backend at import time, which breaks `jax.distributed.initialize`
# in multi-process workers that import this package first.
_BIG = np.float32(1e9)
#: Guard branch cost for padding *before* the stream start: transitions that
#: emit a 1-bit during the guard region are effectively forbidden, so the
#: path metric stays pinned to the all-zero state — for a non-catastrophic
#: code the zero self-loop is the only zero-output cycle. This converts a
#: free-running window start into the exact terminated-trellis start without
#: special-casing window 0 (used by the windowed/streaming/sharded decoders).
_GUARD = np.float32(1e6)


class ConvCode:
    """Rate ``1/n`` convolutional code, constraint length ``K``.

    ``polys``: generator polynomials as integers whose bit ``K-1-t`` taps
    input delay ``t`` (the standard octal convention: the K=7 CCSDS/Voyager
    code is ``ConvCode(7, (0o171, 0o133))``).
    """

    def __init__(self, constraint: int, polys: tuple[int, ...]):
        if constraint < 2:
            raise ValueError("constraint length must be >= 2")
        for g in polys:
            if g >= 1 << constraint:
                raise ValueError(f"polynomial {g:o} exceeds {constraint} bits")
        self.k = int(constraint)
        self.polys = tuple(int(g) for g in polys)
        self.n = len(self.polys)
        self.n_states = 1 << (self.k - 1)

        # Butterfly tables, host-side: for each target state s', its two
        # predecessor states (differing in the dropped oldest bit) and the
        # code bits emitted on those transitions. The input bit that *led to*
        # s' is its top register bit.
        s = np.arange(self.n_states)
        self._in_bit = (s >> (self.k - 2)).astype(np.int32)
        ps0 = (s << 1) & (self.n_states - 1)
        self._pred = np.stack([ps0, ps0 | 1], axis=0).astype(np.int32)
        # register r = (b << (K-1)) | pred_state; outputs per generator
        outs = np.zeros((2, self.n_states, self.n), np.float32)
        for d in (0, 1):
            r = (self._in_bit << (self.k - 1)) | self._pred[d]
            for j, g in enumerate(self.polys):
                v = r & g
                par = np.zeros_like(v)
                for t in range(self.k):
                    par ^= (v >> t) & 1
                outs[d, :, j] = par
        self._outs = outs  # [2, S, n] code bits on (pred d) -> s'

    # ---- encoder ----

    def encode(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., L]`` data bits -> ``[..., n*(L+K-1)]`` code bits
        (terminated; time-major interleave ``c_0[0], c_1[0], ..., c_0[1]``).
        """
        km1 = self.k - 1
        flush = jnp.zeros(bits.shape[:-1] + (km1,), bits.dtype)
        b = jnp.concatenate([bits, flush], axis=-1)
        t = b.shape[-1]
        pad = jnp.zeros(bits.shape[:-1] + (km1,), bits.dtype)
        bp = jnp.concatenate([pad, b], axis=-1)  # bp[..., i] = b[i - (K-1)]
        outs = []
        for g in self.polys:
            acc = jnp.zeros_like(b)
            for tap in range(self.k):
                if (g >> (self.k - 1 - tap)) & 1:
                    # delayed-by-`tap` plane: b[k - tap]
                    acc = acc + bp[..., km1 - tap:km1 - tap + t]
            outs.append(acc % 2)
        c = jnp.stack(outs, axis=-1)  # [..., T, n]
        return c.reshape(c.shape[:-2] + (t * self.n,))

    # ---- Viterbi ----

    def _acs(self, costs: jnp.ndarray, pm0: jnp.ndarray | None = None,
             end_state: jnp.ndarray | None = None, trim: bool = True,
             end_bias: jnp.ndarray | None = None, unroll: int = 8):
        """``costs [..., T, n]`` per-step per-branch-bit costs (cost of a
        transition = sum over its code bits of ``costs[..., k, j]`` where the
        bit is 1) -> terminated-ML data bits ``[..., T - (K-1)]``.

        ``pm0``: optional ``[..., S]`` initial path metrics (default: state 0
        only — the terminated-trellis start). ``end_state``: traceback start
        — default state 0 (terminated trellis), the string ``"argmin"`` for
        the best final state (free-running / windowed decoding), or a
        ``[...]`` array of states. ``end_bias``: optional ``[..., S]`` cost
        added to the final metrics before the argmin (used to pin selected
        batch elements — e.g. the last window — to a known end state).

        TPU shaping (measured on the chip; the naive form is dominated by
        per-step gathers and scan overhead, not arithmetic):

        * the predecessor fetch is a *perfect shuffle*, not a gather:
          ``pred0`` of every state is an even state in order, twice over, so
          ``pm[pred0] = tile(pm[even], 2)`` — a reshape + concat;
        * traceback needs no tables: the decoded bit is ``state >> (K-2)``
          and the survivor flag is a one-hot mask-reduce, so the backward
          scan is pure elementwise math;
        * both scans process ``unroll`` trellis steps per iteration and
          renormalize once per chunk (branch costs are bounded by
          ``_GUARD``, so f32 headroom is ample); the front is padded to a
          chunk multiple with guard steps (terminated start: provably
          held at state 0) or zero steps (free-running start: metrics
          unchanged).
        """
        s = self.n_states
        u = int(unroll)
        t_in = costs.shape[-2]
        pad = (-t_in) % u
        if pad:
            fill = _GUARD if pm0 is None else jnp.float32(0.0)
            g = jnp.full(costs.shape[:-2] + (pad, self.n), fill,
                         costs.dtype)
            costs = jnp.concatenate([g, costs], axis=-2)
        tp = t_in + pad
        out0 = jnp.asarray(self._outs[0])  # [S, n]
        out1 = jnp.asarray(self._outs[1])
        tm = jnp.moveaxis(costs, -2, 0)  # [T', ..., n]
        tm = tm.reshape((tp // u, u) + tm.shape[1:])

        def step(pm, lam):
            bm0 = jnp.einsum("sn,...n->...s", out0, lam)
            bm1 = jnp.einsum("sn,...n->...s", out1, lam)
            pm2 = pm.reshape(pm.shape[:-1] + (s // 2, 2))
            e, o = pm2[..., 0], pm2[..., 1]
            c0 = jnp.concatenate([e, e], axis=-1) + bm0
            c1 = jnp.concatenate([o, o], axis=-1) + bm1
            d = c1 < c0
            return jnp.where(d, c1, c0), d

        def fwd(pm, lam_u):
            decs = []
            for i in range(u):
                pm, d = step(pm, lam_u[i])
                decs.append(d)
            pm = pm - jnp.min(pm, axis=-1, keepdims=True)
            return pm, jnp.stack(decs)

        if pm0 is None:
            pm0 = jnp.full(costs.shape[:-2] + (s,), _BIG)
            pm0 = pm0.at[..., 0].set(0.0)
        else:
            # Anchor to the data so shard_map's varying-axis tracking agrees
            # between carry input and output (costs are finite, so this is
            # exactly zero).
            pm0 = pm0 + 0.0 * jnp.sum(costs, axis=(-1, -2))[..., None]
            pm0 = jnp.broadcast_to(pm0, costs.shape[:-2] + (s,))
        pm_f, dec = jax.lax.scan(fwd, pm0, tm)  # dec [T'/u, u, ..., S]

        ar = jnp.arange(s)

        def back(state, d_u):
            bs = []
            for i in range(u - 1, -1, -1):
                b = state >> (self.k - 2)  # the input bit that led here
                m = ar == state[..., None]
                d = jnp.sum(jnp.where(m, d_u[i], False).astype(jnp.int32),
                            axis=-1)
                state = ((state << 1) & (s - 1)) | d
                bs.append(b)
            return state, jnp.stack(bs[::-1])

        if end_state is None:
            st0 = jnp.zeros(costs.shape[:-2], jnp.int32)
        elif isinstance(end_state, str) and end_state == "argmin":
            if end_bias is not None:
                pm_f = pm_f + end_bias
            st0 = jnp.argmin(pm_f, axis=-1).astype(jnp.int32)
        else:
            st0 = jnp.broadcast_to(end_state, costs.shape[:-2])
        _, bits_rev = jax.lax.scan(back, st0, dec, reverse=True)
        # scan(reverse=True) walks chunks T'/u-1 .. 0 but stacks outputs in
        # input order, so after flattening, bits_rev[k] is the data bit of
        # padded step k.
        bits = bits_rev.reshape((tp,) + bits_rev.shape[2:])
        bits = jnp.moveaxis(bits, 0, -1)[..., pad:]
        if not trim:
            return bits
        return bits[..., : bits.shape[-1] - (self.k - 1)]

    def decode_soft(self, llrs: jnp.ndarray) -> jnp.ndarray:
        """``[..., n*T]`` per-code-bit LLRs (positive = bit 0, the
        :mod:`modem_tpu.ops.llr` convention) -> ML data bits
        ``[..., T-(K-1)]``."""
        t = llrs.shape[-1] // self.n
        lam = llrs.reshape(llrs.shape[:-1] + (t, self.n))
        return self._acs(lam)

    def decode_hard(self, code_bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., n*T]`` hard code bits -> minimum-Hamming-distance data
        bits (soft decode with ``llr = 1 - 2*bit``)."""
        lam = 1.0 - 2.0 * code_bits.astype(jnp.float32)
        t = lam.shape[-1] // self.n
        return self._acs(lam.reshape(lam.shape[:-1] + (t, self.n)))

    def rate(self) -> float:
        return 1.0 / self.n

    # ---- windowed (truncated-traceback) decoding ----

    def decode_soft_windowed(self, llrs: jnp.ndarray, block_steps: int,
                             halo_steps: int | None = None,
                             backend: str = "auto") -> jnp.ndarray:
        """Overlapped-window decode: the time-parallel / streaming form.

        The full-block scan above is sequential over all ``T`` trellis
        steps; production decoders instead use *truncated traceback*: decode
        windows of ``block_steps`` with ``halo_steps`` of context on each
        side (free initial metrics, argmin traceback) and keep only the
        interior — survivor paths merge within ~5–10 constraint lengths, so
        a halo of ``10·K`` steps (the default) reproduces the full Viterbi
        decision sequence except with vanishing probability. Here every
        window is an independent batch element: ``T/B`` windows decode in
        ONE batched scan of length ``B + 2h`` instead of one scan of length
        ``T`` — this is how the decoder spans the time axis of the mesh
        (:mod:`modem_tpu.parallel.viterbi`) and how unbounded streams decode
        in constant memory (:class:`StreamingViterbi`).

        Padding outside the stream is exact: ``_GUARD`` branch costs on
        both flanks pin window 0 to the terminated-trellis start and the
        last window to the state-0 end (traceback through the guard region
        provably rides the zero self-loop back to the true stream end).

        ``backend``: ``"pallas"`` runs every window inside ONE fused
        kernel (forward ACS + traceback, decisions VMEM-resident —
        :mod:`modem_tpu.ops.pallas_viterbi`), bit-identical to the
        ``"xla"`` scan form; ``"auto"`` (default) picks pallas whenever
        the code shape supports it (S >= 8).
        """
        t = llrs.shape[-1] // self.n
        lam = llrs.reshape(llrs.shape[:-1] + (t, self.n))
        h = 10 * self.k if halo_steps is None else int(halo_steps)
        b = int(block_steps)
        if backend == "auto":
            backend = ("pallas" if self.n_states >= 8
                       and jax.default_backend() in ("tpu", "axon")
                       else "xla")
        if backend == "pallas":
            from ..ops.pallas_viterbi import viterbi_decode_stream
            return viterbi_decode_stream(self, lam, b, h, _GUARD)
        if backend != "xla":
            raise ValueError(f"unknown backend {backend!r}")
        w = -(-t // b)  # windows
        tp = w * b
        pad_l = h
        pad_r = tp - t + h
        pad_cfg = [(0, 0)] * (lam.ndim - 2) + [(pad_l, pad_r), (0, 0)]
        lam_p = jnp.pad(lam, pad_cfg)
        lam_p = lam_p.at[..., :h, :].set(_GUARD)
        lam_p = lam_p.at[..., h + t:, :].set(_GUARD)
        idx = np.arange(w)[:, None] * b + np.arange(b + 2 * h)[None, :]
        win = lam_p[..., idx, :]               # [..., W, B+2h, n]
        win = jnp.moveaxis(win, -3, 0)         # [W, ..., B+2h, n]
        pm0 = jnp.zeros((self.n_states,), jnp.float32)
        # Pin the last window's traceback to the terminated end state.
        pin = jnp.full((self.n_states,), _BIG).at[0].set(0.0)
        bias = jnp.zeros((w,) + (1,) * (lam.ndim - 2) + (self.n_states,),
                         jnp.float32).at[w - 1].add(pin)
        bits = self._acs(win, pm0=pm0, end_state="argmin", trim=False,
                         end_bias=bias)
        bits = bits[..., h:h + b]              # [W, ..., B]
        bits = jnp.moveaxis(bits, 0, -2)
        bits = bits.reshape(bits.shape[:-2] + (tp,))
        return bits[..., : t - (self.k - 1)]


class StreamingViterbi:
    """Constant-memory streaming Viterbi over an unbounded LLR stream.

    Push fixed blocks of ``block_steps`` trellis steps (``n·block_steps``
    LLRs); each push returns the decisions of the *previous* block — one
    block of latency buys the right-side traceback context. ``flush``
    returns the final block and drops the ``K-1`` flush bits (terminated
    stream). The carried state (previous block + left context) is an
    explicit pytree, like every other streaming op in this framework.
    """

    def __init__(self, code: ConvCode, block_steps: int,
                 halo_steps: int | None = None, backend: str = "auto"):
        self.code = code
        self.b = int(block_steps)
        self.h = 10 * code.k if halo_steps is None else int(halo_steps)
        if self.h < code.k:
            raise ValueError("halo must cover at least one constraint length")
        if self.b < self.h:
            raise ValueError(
                "block_steps must be >= halo (the right context of a block "
                "is the head of the next push)")
        if backend == "auto":
            backend = ("pallas" if code.n_states >= 8
                       and jax.default_backend() in ("tpu", "axon")
                       else "xla")
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self._prev = None      # [..., B, n] undecoded previous block
        self._pretail = None   # [..., h, n] steps before prev

    def _window_decode(self, pretail, prev, right, final: bool = False):
        win = jnp.concatenate([pretail, prev, right], axis=-2)
        if self.backend == "pallas":
            # each push is exactly one free-start window batch — the
            # fused kernel's native shape (bit-identical to the _acs
            # form, tests/test_pallas_viterbi.py)
            from ..ops.pallas_viterbi import viterbi_decode_windows
            pin = jnp.float32(1.0 if final else 0.0)
            bits = viterbi_decode_windows(self.code, win, pin)
        else:
            pm0 = jnp.zeros((self.code.n_states,), jnp.float32)
            bias = None
            if final:  # pin the terminated end state
                bias = jnp.full((self.code.n_states,), _BIG).at[0].set(0.0)
            bits = self.code._acs(win, pm0=pm0, end_state="argmin",
                                  trim=False, end_bias=bias)
        return bits[..., self.h:self.h + self.b]

    def push(self, llrs: jnp.ndarray) -> jnp.ndarray | None:
        """One block in; the previous block's decisions out (None first)."""
        t = llrs.shape[-1] // self.code.n
        if t != self.b:
            raise ValueError(f"push exactly {self.b} steps, got {t}")
        lam = llrs.reshape(llrs.shape[:-1] + (t, self.code.n))
        if self._prev is None:
            self._prev = lam
            # pre-stream guard: pins the first window to the exact
            # terminated-trellis start (see ``_GUARD``)
            self._pretail = jnp.full(
                lam.shape[:-2] + (self.h, self.code.n), _GUARD, lam.dtype)
            return None
        out = self._window_decode(self._pretail, self._prev, lam[..., :self.h, :])
        self._pretail = jnp.concatenate(
            [self._pretail, self._prev], axis=-2)[..., -self.h:, :]
        self._prev = lam
        return out

    def flush(self) -> jnp.ndarray:
        """Decode the final buffered block; drops the K-1 flush bits."""
        if self._prev is None:
            raise ValueError("nothing buffered")
        right = jnp.full(
            self._prev.shape[:-2] + (self.h, self.code.n), _GUARD,
            self._prev.dtype)
        out = self._window_decode(self._pretail, self._prev, right,
                                  final=True)
        self._prev = None
        return out[..., : self.b - (self.code.k - 1)]


def ccsds_code() -> ConvCode:
    """The standard K=7, rate-1/2 code (CCSDS/Voyager, g = 171/133 octal)."""
    return ConvCode(7, (0o171, 0o133))

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

_BIG = jnp.float32(1e9)


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

    def _acs(self, costs: jnp.ndarray):
        """``costs [..., T, n]`` per-step per-branch-bit costs (cost of a
        transition = sum over its code bits of ``costs[..., k, j]`` where the
        bit is 1) -> terminated-ML data bits ``[..., T - (K-1)]``."""
        s = self.n_states
        tm = jnp.moveaxis(costs, -2, 0)  # [T, ..., n]
        pred0 = jnp.asarray(self._pred[0])
        pred1 = jnp.asarray(self._pred[1])
        out0 = jnp.asarray(self._outs[0])  # [S, n]
        out1 = jnp.asarray(self._outs[1])

        def step(pm, lam):
            bm0 = jnp.einsum("sn,...n->...s", out0, lam)
            bm1 = jnp.einsum("sn,...n->...s", out1, lam)
            c0 = pm[..., pred0] + bm0
            c1 = pm[..., pred1] + bm1
            d = (c1 < c0)
            pm_new = jnp.where(d, c1, c0)
            pm_new = pm_new - jnp.min(pm_new, axis=-1, keepdims=True)
            return pm_new, d

        pm0 = jnp.full(costs.shape[:-2] + (s,), _BIG)
        pm0 = pm0.at[..., 0].set(0.0)
        _, dec = jax.lax.scan(step, pm0, tm)  # dec [T, ..., S] bool

        in_bit = jnp.asarray(self._in_bit)

        def back(state, d_k):
            b = in_bit[state]
            d = jnp.take_along_axis(
                d_k, state[..., None], axis=-1)[..., 0].astype(jnp.int32)
            prev = ((state << 1) & (s - 1)) | d
            return prev, b

        st0 = jnp.zeros(costs.shape[:-2], jnp.int32)
        _, bits_rev = jax.lax.scan(back, st0, dec, reverse=True)
        # scan(reverse=True) walks k = T-1 .. 0 but stacks outputs in input
        # order, so bits_rev[k] is already the data bit of step k.
        bits = jnp.moveaxis(bits_rev, 0, -1)
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


def ccsds_code() -> ConvCode:
    """The standard K=7, rate-1/2 code (CCSDS/Voyager, g = 171/133 octal)."""
    return ConvCode(7, (0o171, 0o133))

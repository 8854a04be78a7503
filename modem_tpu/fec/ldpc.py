"""QC-LDPC codes: IRA-structured encode + gather-free min-sum decode.

New capability (the reference has no FEC at all; this completes the modern
soft-decision stack next to the convolutional/Viterbi and Reed-Solomon
codes in this package — LDPC is what current standards such as DVB-S2,
802.11n and 5G actually deploy downstream of the soft outputs this
framework produces).

Construction — an *irregular repeat-accumulate* (IRA) template, the same
structure DVB-S2 uses: ``H = [A | T]`` over GF(2), where ``A`` is a
quasi-cyclic block matrix (Z x Z circulants, weight-3 block columns,
shifts chosen deterministically with 4-cycle rejection) and ``T`` is the
block-bidiagonal accumulator chain (identity blocks on the diagonal and
subdiagonal). ``T`` is unit lower-triangular, so the code is always
encodable in linear time with **no generator matrix**: per block row,
``p_i = p_{i-1} XOR lambda_i`` with ``lambda_i`` the row's circulant-
rotated data sums — a prefix XOR over ``m_b`` rows. Shift tables from a
deployed standard can be dropped in by subclassing :meth:`_shifts`.

TPU shaping of the decoder (normalized min-sum, flooding schedule):

* **No gathers, no scatters.** The Tanner graph is static host-side
  metadata: each circulant edge is a static ``jnp.roll`` over the Z lanes
  (XLA lowers it to two contiguous slices + concat); per-column and
  per-row aggregations are unrolled static adds (block degrees are 3-5).
* **Check update by prefix/suffix reductions.** The standard "min over
  all other edges" needs an exclusion per edge; with row degree d <= 6
  that is two length-d prefix/suffix sweeps of mins and sign-parities —
  elementwise VPU work over the ``[..., Z]`` lanes, batched over
  channels, no sorting and no ``take_along_axis``.
* **Iterations are a ``lax.scan``** with the check-to-variable messages
  ``[E, ..., Z]`` as carry: one compiled trellis regardless of iteration
  count, matching the windowed-Viterbi design (`fec/conv.py`).

Two schedules:

* ``flooding`` — all check rows update from the same posterior snapshot;
  the classic fully-parallel schedule (kept as the reference form).
* ``layered`` (default) — row-layered: the posterior totals are updated
  after *each* check row inside an iteration, so later rows in the same
  sweep see fresher messages. Converges in about half the iterations of
  flooding at equal BER (standard result; re-verified in
  ``tests/test_ldpc.py::TestLayered``), which directly halves the
  dominant cost — HBM traffic on the ``[E, ...]`` message tensor.

Throughput shaping on top of the schedule (the decoder is HBM-bound:
per iteration it streams the whole message tensor in and out):

* **Batch on the lane dimension.** Public arrays are ``[..., n]``;
  internally everything is transposed to ``[Z, *batch]`` per block
  column so the (large) batch occupies the 128-wide vector lanes and the
  lifting size ``Z`` (27 here) sits in sublanes. In the naive layout the
  last dim is ``Z`` and 101 of 128 lanes are padding.
* **Optional bf16 messages** (``msg_dtype``): check-to-variable messages
  are stored bfloat16 while posterior totals accumulate in f32 — halves
  message traffic. The posterior update uses the *quantized* message so
  totals stay exactly ``ch + sum(stored messages)`` and the extrinsic
  subtraction never drifts. Waterfall impact verified < measurement
  noise in ``tests/test_ldpc.py``.
* **On-device early termination** (``early_exit=True``): a
  ``lax.while_loop`` whose predicate is the batched syndrome check —
  iteration stops when EVERY codeword in the batch satisfies all parity
  checks (or at ``iters``). At operating SNR the mean converged
  iteration count is far below the cap, and the syndrome check is one
  cheap XOR/roll sweep per iteration.

LLR convention matches the rest of the framework (positive = bit 0,
:mod:`modem_tpu.ops.llr`), so chain/OFDM soft outputs feed straight in.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def _has_4cycle(entries: dict, z: int, row: int, col: int, s: int) -> bool:
    """Would adding shift ``s`` at (row, col) close a 4-cycle?

    A 4-cycle needs rows i1 != i2 and cols j1 != j2, all four blocks
    non-zero, with ``s[i1,j1] - s[i1,j2] + s[i2,j2] - s[i2,j1] == 0
    (mod Z)``. Two cases: both columns in the data part, or one of them
    an accumulator (parity) column — parity column ``kb+j`` carries
    shift-0 identity blocks in rows ``j`` and ``j+1``, so it closes a
    4-cycle with a data column exactly when that column has entries with
    EQUAL shifts in ADJACENT rows (``s - 0 + 0 - s2 == 0``). Parity
    columns cannot 4-cycle among themselves (adjacent ones share only
    one row).
    """
    for (r2, c2), s22 in entries.items():
        if c2 == col:
            # same data column: adjacent rows + equal shifts would close
            # a cycle through the shared accumulator column
            if abs(r2 - row) == 1 and (s - s22) % z == 0:
                return True
            continue
        if r2 == row:
            continue
        s12 = entries.get((row, c2))
        s21 = entries.get((r2, col))
        if s12 is None or s21 is None:
            continue
        if (s - s12 + s22 - s21) % z == 0:
            return True
    return False


class QcLdpc:
    """Rate ``k/n`` QC-LDPC code with IRA (accumulator) parity structure.

    ``n = nb * z``, ``k = (nb - mb) * z``. Defaults give the classic
    (648, 324) rate-1/2 geometry (nb=24, mb=12, Z=27).
    """

    def __init__(self, z: int = 27, mb: int = 12, nb: int = 24,
                 col_weight: int = 3, seed: int = 11):
        if nb <= mb:
            raise ValueError("need nb > mb (positive code rate)")
        if col_weight > mb:
            raise ValueError("col_weight cannot exceed mb")
        self.z = int(z)
        self.mb = int(mb)
        self.nb = int(nb)
        self.kb = self.nb - self.mb
        self.n = self.nb * self.z
        self.k = self.kb * self.z
        self.col_weight = int(col_weight)
        self.seed = int(seed)
        # data-part circulants: {(block_row, block_col): shift}
        self._a = self._shifts()
        # decoder edge list (sorted by row, contiguous row groups), with
        # the accumulator chain appended: row i sees parity cols i (shift
        # 0) and i-1 (shift 0).
        edges = sorted(
            [(r, c, s) for (r, c), s in self._a.items()]
            + [(r, self.kb + r, 0) for r in range(self.mb)]
            + [(r, self.kb + r - 1, 0) for r in range(1, self.mb)])
        self._edges = edges
        self._row_slices = []
        pos = 0
        for r in range(self.mb):
            deg = sum(1 for e in edges if e[0] == r)
            self._row_slices.append((pos, deg))
            pos += deg
        self._col_edges = [
            [e for e, (_, c, _) in enumerate(edges) if c == j]
            for j in range(self.nb)]

    def _shifts(self) -> dict:
        """Deterministic circulant shifts for the data part: each of the
        ``kb`` block columns gets ``col_weight`` entries in distinct block
        rows, rejecting any (row, shift) assignment that closes a 4-cycle
        (girth >= 6). Override to install a standard's shift table."""
        rng = np.random.default_rng(self.seed)
        entries: dict = {}
        counts = np.zeros(self.mb, np.int64)  # balance check degrees
        for c in range(self.kb):
            used: set = set()
            for _ in range(self.col_weight):
                order = sorted(
                    (int(counts[r]), rng.random(), r)
                    for r in range(self.mb) if r not in used)
                placed = False
                for _, _, r in order:
                    for _try in range(64):
                        s = int(rng.integers(0, self.z))
                        if not _has_4cycle(entries, self.z, r, c, s):
                            entries[(r, c)] = s
                            used.add(r)
                            counts[r] += 1
                            placed = True
                            break
                    if placed:
                        break
                if not placed:
                    raise RuntimeError(
                        "4-cycle-free placement failed; lower col_weight, "
                        "raise z, or change seed")
        return entries

    # ------------------------------------------------------------------
    # Encoder: prefix XOR over the accumulator chain
    # ------------------------------------------------------------------

    def _blocks(self, bits: jnp.ndarray, nblocks: int) -> jnp.ndarray:
        return bits.reshape(bits.shape[:-1] + (nblocks, self.z))

    def encode(self, bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., k]`` data bits (int) -> ``[..., n]`` systematic codeword.

        ``lambda_i = XOR_j roll(s_j, -shift_ij)``; ``p_i = p_{i-1} XOR
        lambda_i`` — ``mb`` static rows of a handful of rolls + XORs.
        """
        if bits.shape[-1] != self.k:
            raise ValueError(f"expected {self.k} data bits, "
                             f"got {bits.shape[-1]}")
        s = self._blocks(bits.astype(jnp.int32), self.kb)
        lam = []
        for r in range(self.mb):
            acc = jnp.zeros(s.shape[:-2] + (self.z,), jnp.int32)
            for (rr, c), sh in self._a.items():
                if rr == r:
                    acc = acc ^ jnp.roll(s[..., c, :], -sh, axis=-1)
            lam.append(acc)
        p = []
        run = jnp.zeros(s.shape[:-2] + (self.z,), jnp.int32)
        for r in range(self.mb):
            run = run ^ lam[r]
            p.append(run)
        par = jnp.stack(p, axis=-2).reshape(s.shape[:-2] + (self.mb * self.z,))
        return jnp.concatenate([bits.astype(jnp.int32), par], axis=-1)

    def syndrome_ok(self, code_bits: jnp.ndarray) -> jnp.ndarray:
        """``[..., n]`` -> bool ``[...]``: every parity check satisfied."""
        v = self._blocks(code_bits.astype(jnp.int32), self.nb)
        bad = jnp.zeros(v.shape[:-2], jnp.int32)
        for r in range(self.mb):
            acc = jnp.zeros(v.shape[:-2] + (self.z,), jnp.int32)
            start, deg = self._row_slices[r]
            for _, c, sh in self._edges[start:start + deg]:
                acc = acc ^ jnp.roll(v[..., c, :], -sh, axis=-1)
            bad = bad | jnp.max(acc, axis=-1)
        return bad == 0

    # ------------------------------------------------------------------
    # Decoder: normalized min-sum, flooding, lax.scan over iterations
    # ------------------------------------------------------------------

    def decode(self, llrs: jnp.ndarray, iters: int = 25,
               alpha: float = 0.75, schedule: str = "layered",
               msg_dtype=None, early_exit: bool = False) -> jnp.ndarray:
        """``[..., n]`` channel LLRs (positive = bit 0) -> ``[..., k]``
        hard data bits after at most ``iters`` min-sum iterations.

        ``schedule``: ``"layered"`` (default; ~2x faster convergence) or
        ``"flooding"`` (the reference parallel schedule). ``msg_dtype``:
        storage dtype for check-to-variable messages (default f32; pass
        ``jnp.bfloat16`` to halve message HBM traffic). ``early_exit``:
        stop as soon as the whole batch passes the syndrome check
        (layered schedule only; ``lax.while_loop`` on device).
        """
        out = self.decode_full(llrs, iters, alpha, schedule=schedule,
                               msg_dtype=msg_dtype, early_exit=early_exit)
        return out[..., :self.k]

    def decode_full(self, llrs: jnp.ndarray, iters: int = 25,
                    alpha: float = 0.75, schedule: str = "layered",
                    msg_dtype=None, early_exit: bool = False) -> jnp.ndarray:
        """Like :meth:`decode` but returns all ``n`` codeword bits."""
        if schedule == "layered":
            return self._decode_layered(llrs, iters, alpha,
                                        msg_dtype, early_exit)
        if schedule != "flooding":
            raise ValueError(f"unknown schedule {schedule!r}")
        if early_exit:
            raise ValueError("early_exit requires schedule='layered'")
        return self._decode_flooding(llrs, iters, alpha)

    # -- layered schedule ----------------------------------------------

    def _lanes_first(self, llrs: jnp.ndarray) -> jnp.ndarray:
        """``[..., nb*z]`` -> ``[nb, z, *batch]``: batch onto the lanes."""
        cols = self._blocks(llrs, self.nb)               # [..., nb, z]
        return jnp.moveaxis(cols, (-2, -1), (0, 1))      # [nb, z, ...]

    def _syndrome_bad(self, t: jnp.ndarray) -> jnp.ndarray:
        """Internal-layout posteriors ``[nb, z, *batch]`` -> scalar bool:
        True while ANY codeword in the batch fails ANY parity check."""
        v = (t < 0).astype(jnp.int32)
        bad = jnp.zeros((), jnp.int32)
        for r in range(self.mb):
            start, deg = self._row_slices[r]
            acc = jnp.zeros_like(v[0])
            for _, c, sh in self._edges[start:start + deg]:
                acc = acc ^ jnp.roll(v[c], -sh, axis=0)
            bad = bad | jnp.max(acc)
        return bad > 0

    def _decode_layered(self, llrs, iters, alpha, msg_dtype,
                        early_exit) -> jnp.ndarray:
        if llrs.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} LLRs, got {llrs.shape[-1]}")
        mdt = jnp.float32 if msg_dtype is None else msg_dtype
        ch = self._lanes_first(llrs.astype(jnp.float32))  # [nb, z, *batch]
        e = len(self._edges)
        # check-frame messages; tied to ch by a zero-valued term (not
        # fresh zeros) so the scan carry keeps a consistent varying type
        # under shard_map. The tie goes through isfinite -> int so ±inf
        # LLRs (pinned/shortened bits) cannot poison it with NaN.
        zv = (0 * jnp.sum(jnp.isfinite(ch).astype(jnp.int32))
              ).astype(jnp.float32)
        l0 = (jnp.zeros((e,) + ch.shape[1:], jnp.float32) + zv).astype(mdt)
        a = np.float32(alpha)

        def sweep(t, l):
            """One full iteration: every check row, posteriors updated
            in place after each row (the layered property)."""
            for r in range(self.mb):
                start, deg = self._row_slices[r]
                row = self._edges[start:start + deg]
                old = [l[start + k].astype(jnp.float32)
                       for k in range(deg)]
                # variable -> check in the check's lane frame, against
                # the CURRENT posteriors (this is what makes it layered)
                u = [jnp.roll(t[c], -sh, axis=0) - old[k]
                     for k, (_, c, sh) in enumerate(row)]
                mag = [jnp.abs(x) for x in u]
                neg = [(x < 0).astype(jnp.int32) for x in u]
                big = jnp.full_like(mag[0], np.inf)
                pre_m, pre_s = [big], [jnp.zeros_like(neg[0])]
                for k in range(deg - 1):
                    pre_m.append(jnp.minimum(pre_m[-1], mag[k]))
                    pre_s.append(pre_s[-1] ^ neg[k])
                suf_m, suf_s = big, jnp.zeros_like(neg[0])
                for k in range(deg - 1, -1, -1):
                    em = jnp.minimum(pre_m[k], suf_m)
                    es = pre_s[k] ^ suf_s
                    sgn = 1.0 - 2.0 * es.astype(jnp.float32)
                    # quantize FIRST, then update posteriors with the
                    # quantized value: totals remain exactly
                    # ch + sum(stored messages), so the extrinsic
                    # subtraction above never drifts
                    wq = (a * sgn * em).astype(mdt)
                    _, c, sh = row[k]
                    t = t.at[c].add(
                        jnp.roll(wq.astype(jnp.float32) - old[k], sh,
                                 axis=0))
                    l = l.at[start + k].set(wq)
                    suf_m = jnp.minimum(suf_m, mag[k])
                    suf_s = suf_s ^ neg[k]
            return t, l

        if early_exit:
            def cond(state):
                t, _, it, bad = state
                return jnp.logical_and(it < iters, bad)

            def body(state):
                t, l, it, _ = state
                t, l = sweep(t, l)
                return t, l, it + 1, self._syndrome_bad(t)

            t, _, _, _ = lax.while_loop(
                cond, body, (ch, l0, jnp.int32(0), jnp.bool_(True)))
        else:
            def body(carry, _):
                return sweep(*carry), None

            (t, _), _ = lax.scan(body, (ch, l0), None, length=iters)

        hard = (t < 0).astype(jnp.int32)                 # [nb, z, *batch]
        return jnp.moveaxis(hard, (0, 1), (-2, -1)).reshape(
            llrs.shape[:-1] + (self.n,))

    # -- flooding schedule (reference form) ----------------------------

    def _decode_flooding(self, llrs: jnp.ndarray, iters: int,
                         alpha: float) -> jnp.ndarray:
        if llrs.shape[-1] != self.n:
            raise ValueError(f"expected {self.n} LLRs, got {llrs.shape[-1]}")
        ch = self._blocks(llrs.astype(jnp.float32), self.nb)
        e = len(self._edges)
        # tied to ch by a zero-valued term (not fresh zeros): consistent
        # varying type in the scan carry under shard_map; inf-safe via
        # isfinite (±inf LLRs for pinned bits must not become NaN)
        c2v0 = jnp.zeros(
            (e,) + ch.shape[:-2] + (self.z,), jnp.float32
        ) + (0 * jnp.sum(jnp.isfinite(ch).astype(jnp.int32))
             ).astype(jnp.float32)
        a = jnp.float32(alpha)

        def totals(c2v):
            cols = []
            for j in range(self.nb):
                t = ch[..., j, :]
                for ei in self._col_edges[j]:
                    t = t + c2v[ei]
                cols.append(t)
            return cols

        def body(c2v, _):
            cols = totals(c2v)
            new = []
            for r in range(self.mb):
                start, deg = self._row_slices[r]
                row = self._edges[start:start + deg]
                # variable -> check, rotated into the check's lane frame
                u = [jnp.roll(cols[c] - c2v[start + t], -sh, axis=-1)
                     for t, (_, c, sh) in enumerate(row)]
                mag = [jnp.abs(x) for x in u]
                neg = [(x < 0).astype(jnp.int32) for x in u]
                big = jnp.full_like(mag[0], np.inf)
                pre_m, pre_s = [big], [jnp.zeros_like(neg[0])]
                for t in range(deg - 1):
                    pre_m.append(jnp.minimum(pre_m[-1], mag[t]))
                    pre_s.append(pre_s[-1] ^ neg[t])
                suf_m, suf_s = big, jnp.zeros_like(neg[0])
                w = [None] * deg
                for t in range(deg - 1, -1, -1):
                    em = jnp.minimum(pre_m[t], suf_m)
                    es = pre_s[t] ^ suf_s
                    sgn = 1.0 - 2.0 * es.astype(jnp.float32)
                    # back to the variable's lane frame
                    w[t] = jnp.roll(a * sgn * em, row[t][2], axis=-1)
                    suf_m = jnp.minimum(suf_m, mag[t])
                    suf_s = suf_s ^ neg[t]
                new.extend(w)
            return jnp.stack(new), None

        c2v, _ = lax.scan(body, c2v0, None, length=iters)
        cols = totals(c2v)
        hard = jnp.stack([(t < 0).astype(jnp.int32) for t in cols], axis=-2)
        return hard.reshape(ch.shape[:-2] + (self.n,))

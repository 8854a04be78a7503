"""Link-quality metrics: BER / SER / EVM / SNR, stateless and streaming.

First-class outputs of the chain (the reference has no metrics at all —
SURVEY.md section 5 'Metrics / logging / observability'). Two layers:

* stateless block helpers (:func:`ber`, :func:`evm_rms`, ...) — one-shot
  arrays in, scalar out;
* :class:`LinkStats` — an accumulating carry pytree matching the streaming
  design everywhere else in the framework: thread it through a chunked run
  (``stats = stats.update_bits(tx, rx)`` per block), merge across shards
  (:meth:`LinkStats.merge` / :meth:`LinkStats.psum`), checkpoint it with
  :mod:`modem_tpu.checkpoint`, and read exact totals at the end.

Counters are exact 60-bit integers stored as two int32 limbs (base 2^30):
jax defaults to 32-bit ints, and a production link at ~5 Gbit/s wraps an
int32 bit counter in under a second. Each single update may add at most
2^30 - 1 (a block of >10^9 bits would be a >128 MB bit tensor — far past
any realistic block size). EVM/SNR power sums use Kahan-compensated f32
accumulation, so a multi-hour stream does not lose the error-power sum to
cancellation."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def bit_errors(tx_bits: jnp.ndarray, rx_bits: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(tx_bits.astype(jnp.int32) != rx_bits.astype(jnp.int32))


def ber(tx_bits: jnp.ndarray, rx_bits: jnp.ndarray) -> jnp.ndarray:
    return bit_errors(tx_bits, rx_bits) / tx_bits.size


def ser(tx_syms: jnp.ndarray, rx_syms: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(tx_syms != rx_syms) / tx_syms.size


def evm_rms(
    rx_i: jnp.ndarray, rx_q: jnp.ndarray, ref_i: jnp.ndarray, ref_q: jnp.ndarray
) -> jnp.ndarray:
    """RMS error-vector magnitude, normalized to RMS reference power."""
    err = (rx_i - ref_i) ** 2 + (rx_q - ref_q) ** 2
    ref = ref_i**2 + ref_q**2
    return jnp.sqrt(jnp.mean(err) / jnp.mean(ref))


def snr_estimate_db(
    rx_i: jnp.ndarray, rx_q: jnp.ndarray, ref_i: jnp.ndarray, ref_q: jnp.ndarray
) -> jnp.ndarray:
    err = (rx_i - ref_i) ** 2 + (rx_q - ref_q) ** 2
    ref = ref_i**2 + ref_q**2
    return 10.0 * jnp.log10(jnp.mean(ref) / jnp.mean(err))


# ----------------------------------------------------------------------
# streaming counters
# ----------------------------------------------------------------------

_LIMB = 1 << 30  # two int32 limbs, base 2^30 -> exact counts to 2^60


def _c64_zero() -> jnp.ndarray:
    return jnp.zeros((2,), jnp.int32)


def _c64_add(c: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Add a non-negative int32 delta ``d < 2^30`` to a two-limb counter.
    ``lo + d < 2^31`` always holds, so the int32 add never wraps."""
    lo = c[1] + d.astype(jnp.int32)
    return jnp.stack([c[0] + lo // _LIMB, lo % _LIMB])


def _c64_merge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lo = a[1] + b[1]
    return jnp.stack([a[0] + b[0] + lo // _LIMB, lo % _LIMB])


def _c64_int(c) -> int:
    import numpy as np

    c = np.asarray(c)
    return int(c[0]) * _LIMB + int(c[1])


def _kahan(sum_, comp, x_sum: jnp.ndarray):
    """One compensated accumulation step: add block-sum ``x_sum``."""
    y = x_sum - comp
    t = sum_ + y
    return t, (t - sum_) - y


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LinkStats:
    """Accumulating link statistics as an immutable carry pytree.

    Every ``update_*`` method is pure and jittable (returns a new
    :class:`LinkStats`), so the carry threads through ``lax.scan`` bodies,
    ``shard_map`` programs, and host-side streaming loops alike, and
    serializes through :func:`modem_tpu.checkpoint.save_state`.
    """

    bit_err: jnp.ndarray
    bit_tot: jnp.ndarray
    sym_err: jnp.ndarray
    sym_tot: jnp.ndarray
    frame_err: jnp.ndarray
    frame_tot: jnp.ndarray
    blocks: jnp.ndarray
    evm_err: jnp.ndarray  # [2] f32: Kahan (sum, compensation)
    evm_ref: jnp.ndarray  # [2] f32

    def _fields(self):
        # NOT dataclasses.astuple: that deep-copies every leaf array on
        # each flatten (i.e. at every jit boundary / scan step)
        return (self.bit_err, self.bit_tot, self.sym_err, self.sym_tot,
                self.frame_err, self.frame_tot, self.blocks,
                self.evm_err, self.evm_ref)

    def tree_flatten(self):
        return self._fields(), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def zero(cls) -> "LinkStats":
        z = _c64_zero()
        f = jnp.zeros((2,), jnp.float32)
        return cls(z, z, z, z, z, z, z, f, f)

    # -- updates (each counts one block) -------------------------------

    def update_bits(self, tx_bits: jnp.ndarray,
                    rx_bits: jnp.ndarray) -> "LinkStats":
        err = bit_errors(tx_bits, rx_bits)
        return dataclasses.replace(
            self,
            bit_err=_c64_add(self.bit_err, err),
            bit_tot=_c64_add(self.bit_tot, jnp.int32(tx_bits.size)),
            blocks=_c64_add(self.blocks, jnp.int32(1)),
        )

    def update_symbols(self, tx_syms: jnp.ndarray,
                       rx_syms: jnp.ndarray) -> "LinkStats":
        err = jnp.sum((tx_syms != rx_syms).astype(jnp.int32))
        return dataclasses.replace(
            self,
            sym_err=_c64_add(self.sym_err, err),
            sym_tot=_c64_add(self.sym_tot, jnp.int32(tx_syms.size)),
        )

    def update_frames(self, crc_ok: jnp.ndarray) -> "LinkStats":
        """``crc_ok``: boolean per frame (e.g. :meth:`FramedLink.rx`)."""
        bad = jnp.sum((~crc_ok.astype(bool)).astype(jnp.int32))
        return dataclasses.replace(
            self,
            frame_err=_c64_add(self.frame_err, bad),
            frame_tot=_c64_add(self.frame_tot, jnp.int32(crc_ok.size)),
        )

    def update_evm(self, rx_i, rx_q, ref_i, ref_q) -> "LinkStats":
        err = jnp.sum((rx_i - ref_i) ** 2 + (rx_q - ref_q) ** 2)
        ref = jnp.sum(ref_i ** 2 + ref_q ** 2)
        es, ec = _kahan(self.evm_err[0], self.evm_err[1], err)
        rs, rc = _kahan(self.evm_ref[0], self.evm_ref[1], ref)
        return dataclasses.replace(
            self,
            evm_err=jnp.stack([es, ec]),
            evm_ref=jnp.stack([rs, rc]),
        )

    # -- combination ----------------------------------------------------

    def merge(self, other: "LinkStats") -> "LinkStats":
        return LinkStats(
            *[_c64_merge(a, b) for a, b in zip(
                self._fields()[:7], other._fields()[:7])],
            evm_err=jnp.stack(
                [self.evm_err[0] + other.evm_err[0],
                 self.evm_err[1] + other.evm_err[1]]),
            evm_ref=jnp.stack(
                [self.evm_ref[0] + other.evm_ref[0],
                 self.evm_ref[1] + other.evm_ref[1]]),
        )

    def psum(self, axis_name: str) -> "LinkStats":
        """Combine per-shard stats inside ``shard_map`` — psum the limbs,
        then renormalize the carries.

        A naive ``psum(lo)`` would wrap int32 with >= 3 shards (each lo
        limb reaches 2^30 - 1), so the lo limb is psummed as two 15-bit
        halves and recombined with explicit carry propagation — exact for
        up to 2^15 devices."""
        import jax.lax as lax

        def norm(c):
            hi = lax.psum(c[0], axis_name)
            a = lax.psum(c[1] >> 15, axis_name)       # < n * 2^15
            b = lax.psum(c[1] & 0x7FFF, axis_name)    # < n * 2^15
            # value of the lo sum = a * 2^15 + b, reconstructed in-range:
            s = (a % (1 << 15)) * (1 << 15) + b        # < 2^31 for n<=2^15
            return jnp.stack([hi + a // (1 << 15) + s // _LIMB, s % _LIMB])

        t = self._fields()
        return LinkStats(*[norm(c) for c in t[:7]],
                         evm_err=lax.psum(self.evm_err, axis_name),
                         evm_ref=lax.psum(self.evm_ref, axis_name))

    # -- host-side readout ----------------------------------------------

    @property
    def n_bits(self) -> int:
        return _c64_int(self.bit_tot)

    @property
    def n_bit_errors(self) -> int:
        return _c64_int(self.bit_err)

    @property
    def n_blocks(self) -> int:
        return _c64_int(self.blocks)

    @property
    def ber(self) -> float:
        n = self.n_bits
        return _c64_int(self.bit_err) / n if n else 0.0

    @property
    def ser(self) -> float:
        n = _c64_int(self.sym_tot)
        return _c64_int(self.sym_err) / n if n else 0.0

    @property
    def fer(self) -> float:
        n = _c64_int(self.frame_tot)
        return _c64_int(self.frame_err) / n if n else 0.0

    @property
    def evm(self) -> float:
        import math

        ref = float(self.evm_ref[0])
        return math.sqrt(float(self.evm_err[0]) / ref) if ref > 0 else 0.0

    @property
    def snr_db(self) -> float:
        import math

        err = float(self.evm_err[0])
        ref = float(self.evm_ref[0])
        return 10.0 * math.log10(ref / err) if err > 0 and ref > 0 else float("inf")

    def summary(self) -> dict:
        return {
            "blocks": self.n_blocks,
            "bits": self.n_bits, "bit_errors": self.n_bit_errors,
            "ber": self.ber,
            "symbols": _c64_int(self.sym_tot),
            "symbol_errors": _c64_int(self.sym_err), "ser": self.ser,
            "frames": _c64_int(self.frame_tot),
            "frame_errors": _c64_int(self.frame_err), "fer": self.fer,
            "evm": self.evm, "snr_db": self.snr_db,
        }

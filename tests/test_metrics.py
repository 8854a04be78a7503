"""LinkStats streaming counters: exact totals, limb carries, merge/psum,
scan-carry jittability, checkpoint roundtrip (VERDICT r2 item 6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu.metrics import (
    _LIMB, _c64_add, _c64_int, _c64_zero, LinkStats)


def test_chunked_counts_match_offline():
    rng = np.random.default_rng(0)
    tx = rng.integers(0, 2, (40, 1024)).astype(np.int32)
    rx = tx.copy()
    flip = rng.random(rx.shape) < 0.01
    rx[flip] ^= 1

    stats = LinkStats.zero()
    for b in range(tx.shape[0]):
        stats = stats.update_bits(jnp.asarray(tx[b]), jnp.asarray(rx[b]))
    assert stats.n_bits == tx.size
    assert stats.n_bit_errors == int(flip.sum())
    assert stats.n_blocks == tx.shape[0]
    assert stats.ber == pytest.approx(flip.sum() / tx.size)


def test_limb_carry_exact_past_int32():
    """Counter stays exact beyond 2^31 (the int32 wrap point)."""
    c = _c64_zero()
    d = (1 << 30) - 1
    n = 5  # 5 * (2^30 - 1) > 2^32
    for _ in range(n):
        c = _c64_add(c, jnp.int32(d))
    assert _c64_int(c) == n * d
    assert _c64_int(c) > 2 ** 32


def test_symbols_frames_evm():
    rng = np.random.default_rng(1)
    ts = rng.integers(0, 4, 512)
    rs = ts.copy()
    rs[:7] = (rs[:7] + 1) % 4
    ok = np.ones(32, bool)
    ok[[3, 11]] = False
    ri = rng.standard_normal(256).astype(np.float32)
    rq = rng.standard_normal(256).astype(np.float32)
    ni = (ri + 0.1 * rng.standard_normal(256)).astype(np.float32)
    nq = (rq + 0.1 * rng.standard_normal(256)).astype(np.float32)

    stats = LinkStats.zero()
    stats = stats.update_symbols(jnp.asarray(ts), jnp.asarray(rs))
    stats = stats.update_frames(jnp.asarray(ok))
    # EVM accumulated in two chunks == offline one-shot (Kahan exactness not
    # required here, just block-sum associativity at these sizes)
    stats = stats.update_evm(jnp.asarray(ni[:128]), jnp.asarray(nq[:128]),
                             jnp.asarray(ri[:128]), jnp.asarray(rq[:128]))
    stats = stats.update_evm(jnp.asarray(ni[128:]), jnp.asarray(nq[128:]),
                             jnp.asarray(ri[128:]), jnp.asarray(rq[128:]))
    s = stats.summary()
    assert s["symbol_errors"] == 7 and s["symbols"] == 512
    assert s["frame_errors"] == 2 and s["frames"] == 32
    err = ((ni - ri) ** 2 + (nq - rq) ** 2).sum()
    ref = (ri ** 2 + rq ** 2).sum()
    assert s["evm"] == pytest.approx(np.sqrt(err / ref), rel=1e-5)
    assert s["snr_db"] == pytest.approx(10 * np.log10(ref / err), rel=1e-5)


def test_merge_and_scan_carry():
    rng = np.random.default_rng(2)
    tx = rng.integers(0, 2, (8, 256)).astype(np.int32)
    rx = tx ^ (rng.random(tx.shape) < 0.05)

    # merge of two halves == sequential accumulation
    a, b = LinkStats.zero(), LinkStats.zero()
    for i in range(4):
        a = a.update_bits(jnp.asarray(tx[i]), jnp.asarray(rx[i]))
    for i in range(4, 8):
        b = b.update_bits(jnp.asarray(tx[i]), jnp.asarray(rx[i]))
    merged = a.merge(b)
    assert merged.n_bit_errors == int((tx != rx).sum())
    assert merged.n_bits == tx.size

    # the same accumulation as a lax.scan carry, under jit
    @jax.jit
    def run(tx_blocks, rx_blocks):
        def body(st, xy):
            return st.update_bits(xy[0], xy[1]), 0
        st, _ = jax.lax.scan(body, LinkStats.zero(),
                             (tx_blocks, rx_blocks))
        return st

    st = run(jnp.asarray(tx), jnp.asarray(rx))
    assert st.n_bit_errors == merged.n_bit_errors
    assert st.n_blocks == 8


def test_psum_across_shards():
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("d",))
    rng = np.random.default_rng(3)
    tx = rng.integers(0, 2, (4, 512)).astype(np.int32)
    rx = tx ^ (rng.random(tx.shape) < 0.03)

    def shard_fn(txs, rxs):
        st = LinkStats.zero().update_bits(txs[0], rxs[0])
        return st.psum("d")

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("d", None), P("d", None)),
        out_specs=P()))
    st = fn(jnp.asarray(tx), jnp.asarray(rx))
    assert st.n_bit_errors == int((tx != rx).sum())
    assert st.n_bits == tx.size


def test_checkpoint_roundtrip(tmp_path):
    from modem_tpu.checkpoint import load_state, save_state

    rng = np.random.default_rng(4)
    tx = rng.integers(0, 2, 333).astype(np.int32)
    rx = tx ^ (rng.random(tx.shape) < 0.02)
    st = LinkStats.zero().update_bits(jnp.asarray(tx), jnp.asarray(rx))
    save_state(tmp_path / "stats.npz", st)
    st2 = load_state(tmp_path / "stats.npz", LinkStats.zero())
    assert st2.summary() == st.summary()


def test_psum_limb_overflow_safe():
    """psum with near-full lo limbs on 8 shards: a naive int32 psum of the
    lo limbs would wrap; the split-limb psum must stay exact."""
    import dataclasses

    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("d",))
    big = (1 << 30) - 1  # each shard's lo limb at max

    def shard_fn():
        st = LinkStats.zero()
        st = dataclasses.replace(
            st, bit_tot=jnp.asarray([0, big], jnp.int32))
        return st.psum("d")

    st = jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=(),
                               out_specs=P()))()
    assert st.n_bits == 8 * big  # 8589934584 > 2^32

"""Windowed / streaming / time-sharded Viterbi (fec/conv.py,
parallel/viterbi.py).

Truncated traceback is exact-in-practice: at the default 10K halo the
windowed, streaming, and mesh-sharded decoders must reproduce the
full-block scan's decisions bit-for-bit on noisy inputs (fixed seeds). A
deliberately starved halo must break that equality (showing the halo is
load-bearing), and the sharded decode must also hold on a coded-modem loop
through the real chain.
"""

import numpy as np

import jax
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.fec import StreamingViterbi, ccsds_code
from modem_tpu.ops.channel import awgn
from modem_tpu.parallel import make_modem_mesh, sharded_viterbi_fn


def _noisy_llrs(code, shape, n_data, sigma, seed):
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(rng.integers(0, 2, shape + (n_data,)), jnp.int32)
    c = np.asarray(code.encode(bits)).astype(np.float32)
    y = 1.0 - 2.0 * c + sigma * rng.normal(size=c.shape).astype(np.float32)
    return bits, jnp.asarray(2.0 * y / sigma**2)


class TestWindowed:
    def test_matches_full_decode_noisy(self):
        code = ccsds_code()
        for seed in (0, 1, 2):
            bits, llr = _noisy_llrs(code, (4,), 1000, 0.8, seed)
            full = code.decode_soft(llr)
            for block in (160, 503, 1006):
                win = code.decode_soft_windowed(llr, block)
                np.testing.assert_array_equal(
                    np.asarray(win), np.asarray(full),
                    err_msg=f"seed {seed} block {block}")

    def test_starved_halo_breaks_equality(self):
        # halo of 2 steps << the merge depth: windows can no longer agree
        # with the full decode at this noise level (the halo is load-bearing).
        code = ccsds_code()
        bits, llr = _noisy_llrs(code, (4,), 1000, 1.0, 3)
        full = code.decode_soft(llr)
        win = code.decode_soft_windowed(llr, 100, halo_steps=2)
        assert np.any(np.asarray(win) != np.asarray(full))

    def test_short_tail_block(self):
        # T = 506 steps with block 100 -> ragged last window, right-pad path.
        code = ccsds_code()
        bits, llr = _noisy_llrs(code, (), 500, 0.6, 4)
        np.testing.assert_array_equal(
            np.asarray(code.decode_soft_windowed(llr, 100)),
            np.asarray(code.decode_soft(llr)))


class TestStreaming:
    def test_chunked_equals_full(self):
        code = ccsds_code()
        block = 200
        n_data = 6 * block - 6  # trellis steps = 6 blocks exactly
        bits, llr = _noisy_llrs(code, (3,), n_data, 0.8, 5)
        full = np.asarray(code.decode_soft(llr))
        sv = StreamingViterbi(code, block)
        lam = np.asarray(llr).reshape(3, -1, code.n)
        outs = []
        for b in range(lam.shape[1] // block):
            seg = jnp.asarray(
                lam[:, b * block:(b + 1) * block].reshape(3, -1))
            out = sv.push(seg)
            if out is not None:
                outs.append(np.asarray(out))
        outs.append(np.asarray(sv.flush()))
        got = np.concatenate(outs, -1)
        np.testing.assert_array_equal(got, full)

    def test_push_size_validated(self):
        code = ccsds_code()
        sv = StreamingViterbi(code, 100)
        try:
            sv.push(jnp.zeros((2, 150 * 2)))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestSharded:
    def test_matches_full_decode_on_mesh(self):
        code = ccsds_code()
        mesh = make_modem_mesh(ch=2, time=4)
        # flat LLR length 2*(n_data+6) must divide by time=4 into
        # whole-step slabs: n_data + 6 = 1008 -> 504 flat per device
        bits, llr = _noisy_llrs(code, (4,), 1002, 0.8, 6)
        fn = sharded_viterbi_fn(code, mesh)
        np.testing.assert_array_equal(
            np.asarray(fn(llr)), np.asarray(code.decode_soft(llr)))

    def test_time_only_mesh_no_batch(self):
        code = ccsds_code()
        mesh = make_modem_mesh(ch=1, time=8)
        bits, llr = _noisy_llrs(code, (), 1018, 0.7, 7)  # 2048 flat / 8
        fn = sharded_viterbi_fn(code, mesh, batch_axis=None)
        np.testing.assert_array_equal(
            np.asarray(fn(llr)), np.asarray(code.decode_soft(llr)))

    def test_coded_modem_loop_sharded_decode(self):
        # encode -> QPSK chain + AWGN -> LLRs -> sharded Viterbi: clean
        # payload at an SNR where raw decisions fail.
        code = ccsds_code()
        chain = qpsk_reference_chain(Rates(1250, 10000))
        mesh = make_modem_mesh(ch=2, time=4)
        rng = np.random.default_rng(8)
        data = jnp.asarray(rng.integers(0, 2, (8, 1002)), jnp.int32)
        tx_bits = code.encode(data)  # [..., 512]
        i, q = chain.tx(tx_bits)
        ni, nq = awgn(jax.random.key(8), i, q, snr_db=-4.0)
        p = float(jnp.mean(i * i + q * q))
        nv = p / (2.0 * 10.0 ** (-4.0 / 10.0))
        llr = chain.rx_soft((ni, nq), tx_bits.shape[-1] // 2, noise_var=nv)
        dec = sharded_viterbi_fn(code, mesh)(llr)
        raw_errs = int(jnp.sum((llr < 0).astype(jnp.int32) != tx_bits))
        assert raw_errs > 30
        assert int(jnp.sum(dec != data)) == 0

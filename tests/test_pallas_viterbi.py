"""Fused Pallas Viterbi vs the XLA scan decoder: exact-equality gates.

The kernel reproduces `ConvCode._acs`'s arithmetic step for step (same
branch-metric accumulation order, same per-chunk renormalization, same
first-min tie-breaking), so the gate is bit-identical decisions — the
same standard every fused kernel in this package is held to
(SURVEY.md section 4). Runs in interpreter mode on the CPU test mesh;
the identical code path compiles for the chip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu.fec.conv import ConvCode, StreamingViterbi, ccsds_code


def _noisy_llrs(code, rng, shape, t, snr=1.0):
    bits = rng.integers(0, 2, shape + (t,))
    cw = np.asarray(code.encode(jnp.asarray(bits, jnp.int32)))
    llr = (1.0 - 2.0 * cw) * 2.0 + rng.normal(0, snr, cw.shape)
    return bits, jnp.asarray(llr, jnp.float32)


class TestWindowedParity:
    def test_k7_rate_half_exact_vs_xla(self):
        code = ccsds_code()
        rng = np.random.default_rng(0)
        _, llr = _noisy_llrs(code, rng, (3,), 500, snr=1.2)
        ref = code.decode_soft_windowed(llr, 128, backend="xla")
        got = code.decode_soft_windowed(llr, 128, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_rate_third_exact_vs_xla(self):
        code = ConvCode(7, (0o171, 0o133, 0o165))
        rng = np.random.default_rng(1)
        _, llr = _noisy_llrs(code, rng, (2,), 300, snr=1.0)
        ref = code.decode_soft_windowed(llr, 96, backend="xla")
        got = code.decode_soft_windowed(llr, 96, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_k5_exact_vs_xla(self):
        code = ConvCode(5, (0o23, 0o35))
        rng = np.random.default_rng(2)
        _, llr = _noisy_llrs(code, rng, (4,), 257, snr=1.5)
        ref = code.decode_soft_windowed(llr, 64, backend="xla")
        got = code.decode_soft_windowed(llr, 64, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_noiseless_roundtrip(self):
        code = ccsds_code()
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, (5, 400))
        cw = code.encode(jnp.asarray(bits, jnp.int32))
        llr = 1.0 - 2.0 * cw.astype(jnp.float32)
        got = code.decode_soft_windowed(llr, 128, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), bits)

    def test_2d_batch(self):
        code = ccsds_code()
        rng = np.random.default_rng(4)
        _, llr = _noisy_llrs(code, rng, (2, 3), 200, snr=1.0)
        ref = code.decode_soft_windowed(llr, 64, backend="xla")
        got = code.decode_soft_windowed(llr, 64, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_small_state_count_rejected(self):
        code = ConvCode(3, (0o7, 0o5))   # S = 4 < 8
        rng = np.random.default_rng(5)
        _, llr = _noisy_llrs(code, rng, (1,), 100)
        with pytest.raises(ValueError, match="S >= 8"):
            code.decode_soft_windowed(llr, 32, backend="pallas")


class TestStreamingInterop:
    def test_stream_matches_pallas_block_decode(self):
        """StreamingViterbi (XLA windows) and the fused windowed decode
        agree on the same stream — seam behavior is identical."""
        code = ccsds_code()
        rng = np.random.default_rng(6)
        bits = rng.integers(0, 2, (2, 512 - (code.k - 1)))
        cw = code.encode(jnp.asarray(bits, jnp.int32))
        llr = ((1.0 - 2.0 * cw.astype(jnp.float32)) * 2.0
               + jnp.asarray(rng.normal(0, 0.9, cw.shape), jnp.float32))
        full = code.decode_soft_windowed(llr, 128, backend="pallas")
        sv = StreamingViterbi(code, 128)
        outs = []
        lam = llr.reshape(llr.shape[:-1] + (-1, code.n))
        for s0 in range(0, lam.shape[-2], 128):
            blk = lam[..., s0:s0 + 128, :]
            got = sv.push(blk.reshape(blk.shape[:-2] + (-1,)))
            if got is not None:
                outs.append(got)
        outs.append(sv.flush())
        stream = np.concatenate([np.asarray(o) for o in outs], axis=-1)
        np.testing.assert_array_equal(stream, np.asarray(full))

    def test_streaming_pallas_backend_matches_xla_stream(self):
        code = ccsds_code()
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2, (2, 384 - (code.k - 1)))
        cw = code.encode(jnp.asarray(bits, jnp.int32))
        llr = ((1.0 - 2.0 * cw.astype(jnp.float32)) * 2.0
               + jnp.asarray(rng.normal(0, 0.8, cw.shape), jnp.float32))
        lam = llr.reshape(llr.shape[:-1] + (-1, code.n))
        outs = {}
        for backend in ("xla", "pallas"):
            sv = StreamingViterbi(code, 128, backend=backend)
            got = []
            for s0 in range(0, lam.shape[-2], 128):
                blk = lam[..., s0:s0 + 128, :]
                o = sv.push(blk.reshape(blk.shape[:-2] + (-1,)))
                if o is not None:
                    got.append(np.asarray(o))
            got.append(np.asarray(sv.flush()))
            outs[backend] = np.concatenate(got, axis=-1)
        np.testing.assert_array_equal(outs["pallas"], outs["xla"])
        np.testing.assert_array_equal(outs["pallas"], bits)


class TestShardMapComposition:
    def test_channel_sharded_pallas_decode(self):
        """The fused kernel composes with shard_map channel sharding —
        the pod-deployment layout (parallel/viterbi.py docs): per-shard
        decisions are bitwise the unsharded ones."""
        from modem_tpu.parallel.generic import channel_sharded
        from modem_tpu.parallel.mesh import make_modem_mesh
        code = ccsds_code()
        rng = np.random.default_rng(8)
        _, llr = _noisy_llrs(code, rng, (8,), 300, snr=1.0)
        ref = code.decode_soft_windowed(llr, 96, backend="pallas")
        mesh = make_modem_mesh(ch=4, time=1)
        fn = channel_sharded(
            lambda x: code.decode_soft_windowed(x, 96, backend="pallas"),
            mesh)
        got = fn(llr)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

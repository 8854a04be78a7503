"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The standard JAX trick (SURVEY.md section 4): halo-exchange and prefix-scan
correctness is device-count generic, so an ``xla_force_host_platform_device_count=8``
mesh validates the collectives without a pod.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Modulator, Rates, make_scheme
from modem_tpu.chain import qpsk_reference_chain, PulseShapedChain
from modem_tpu.models.qam import QAM
from modem_tpu.parallel import (
    ShardedPulseChain, exclusive_prefix, make_modem_mesh, sharded_fir,
    time_sharded_baseband,
)

RATES = Rates(baud_rate=1250, sample_rate=10000)  # sps = 8


def bits_for(scheme, n_sym, seed=0, channels=None):
    rng = np.random.default_rng(seed)
    shape = (n_sym * scheme.bits_per_symbol,)
    if channels:
        shape = (channels,) + shape
    return jnp.asarray(rng.integers(0, 2, shape), jnp.int32)


@pytest.fixture(scope="module")
def mesh8():
    return make_modem_mesh(ch=2, time=4)


@pytest.fixture(scope="module")
def mesh_time8():
    return make_modem_mesh(ch=1, time=8)


class TestShardedFir:
    def test_matches_single_device(self, mesh_time8):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(800,)), jnp.float32)
        taps = rng.normal(size=33).astype(np.float32)
        y = sharded_fir(x, taps, mesh_time8, batch_axis=None)
        ref = np.convolve(np.asarray(x), taps)[: x.shape[0]]
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)

    def test_batched_2d_mesh(self, mesh8):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 640)), jnp.float32)
        taps = rng.normal(size=17).astype(np.float32)
        y = sharded_fir(x, taps, mesh8)
        for c in range(4):
            ref = np.convolve(np.asarray(x[c]), taps)[:640]
            np.testing.assert_allclose(np.asarray(y[c]), ref, atol=1e-4)


class TestExclusivePrefix:
    def test_values(self, mesh_time8):
        from jax.sharding import PartitionSpec as P

        vals = jnp.arange(8, dtype=jnp.int32) + 1  # one scalar per device

        def f(x):
            return exclusive_prefix(x[0], "time")[None]

        out = jax.jit(jax.shard_map(
            f, mesh=mesh_time8, in_specs=(P("time"),), out_specs=P("time")
        ))(vals)
        np.testing.assert_array_equal(
            np.asarray(out), np.concatenate([[0], np.cumsum(np.arange(7) + 1)])
        )


class TestShardedChain:
    def test_qpsk_noiseless_exact(self, mesh8):
        chain = qpsk_reference_chain(RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=64, channels=4)
        out = sharded.roundtrip_fn()(sharded.shard_bits(bits),
                                     jax.random.key(0))
        # Exact parity with the single-device chain, which itself round-trips.
        single = chain.roundtrip(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(single))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_qam16_noiseless_exact(self, mesh8):
        chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=32, channels=2)
        out = sharded.roundtrip_fn()(sharded.shard_bits(bits),
                                     jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_ber_step_noisy(self, mesh8):
        chain = qpsk_reference_chain(RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=64, channels=4, seed=3)
        err, tot = sharded.ber_fn(snr_db=20.0)(sharded.shard_bits(bits),
                                               jax.random.key(1))
        assert int(tot) == bits.size
        assert int(err) == 0  # 20 dB is far above QPSK threshold

    def test_passband_noiseless_exact(self, mesh8):
        """Passband sharded chain (per-shard closed-form NCO) matches the
        single-device passband chain bit-for-bit."""
        chain = PulseShapedChain(
            qpsk_reference_chain(RATES).scheme, RATES, carrier_hz=2000
        )
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=64, channels=4, seed=21)
        out = sharded.roundtrip_fn()(sharded.shard_bits(bits),
                                     jax.random.key(0))
        single = chain.roundtrip(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(single))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_passband_noisy_ber(self, mesh8):
        chain = PulseShapedChain(
            qpsk_reference_chain(RATES).scheme, RATES, carrier_hz=2000
        )
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=256, channels=4, seed=22)
        err, tot = sharded.ber_fn(snr_db=20.0)(sharded.shard_bits(bits),
                                               jax.random.key(3))
        assert int(err) == 0
        err, _ = sharded.ber_fn(snr_db=-4.0)(sharded.shard_bits(bits),
                                             jax.random.key(3))
        assert int(err) > 0

    def test_fused_kernel_sharded_exact(self, mesh8):
        """Fused Pallas kernel per device + ppermute symbol halos: decisions
        exactly equal the single-device fused kernel and the input bits."""
        chain = qpsk_reference_chain(RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=96, channels=4, seed=11)
        out = sharded.fused_roundtrip_fn()(sharded.shard_bits(bits),
                                           jnp.int32(0))
        single = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(single))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_fused_kernel_sharded_passband_exact(self, mesh8):
        """Sharded fused kernel with the in-kernel NCO passband loop: the
        per-shard sym_offset keeps the carrier phase stream-global, so
        decisions equal the single-device fused passband kernel exactly."""
        from modem_tpu.chain import PulseShapedChain
        from modem_tpu.models.qam import QAM

        chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES, carrier_hz=2000)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=96, channels=4, seed=13)
        out = sharded.fused_roundtrip_fn()(sharded.shard_bits(bits),
                                           jnp.int32(0))
        single = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(single))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        err, tot = sharded.fused_ber_fn(snr_db=20.0)(
            sharded.shard_bits(bits), jnp.int32(5)
        )
        assert int(tot) == bits.size
        assert int(err) == 0

    def test_ber_step_low_snr_has_errors(self, mesh8):
        chain = qpsk_reference_chain(RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=256, channels=4, seed=4)
        err, _ = sharded.ber_fn(snr_db=-6.0)(sharded.shard_bits(bits),
                                             jax.random.key(2))
        assert int(err) > 0


class TestShardedDemodulator:
    def _passband(self, channels=None, n_sym=64):
        from modem_tpu.models import make_scheme
        mod = Modulator(make_scheme("bpsk", RATES), RATES, carrier_hz=2000)
        rng = np.random.default_rng(31)
        shape = (n_sym,) if channels is None else (channels, n_sym)
        bits = jnp.asarray(rng.integers(0, 2, shape), jnp.int32)
        wave, _ = mod.passband(bits, mod.init_state(
            () if channels is None else (channels,)))
        return wave

    @pytest.mark.parametrize("channels", [None, 4])
    def test_matches_single_device(self, channels, mesh_time8, mesh8):
        from modem_tpu.parallel import sharded_demodulate
        from modem_tpu.rx import Demodulator
        from modem_tpu.ops.pll import LOCK_SAMPLES

        wave = self._passband(channels)
        demod = Demodulator(2000, 10000)
        mesh = mesh_time8 if channels is None else mesh8
        si, sq = sharded_demodulate(demod, wave, mesh,
                                    ch_axis=None if channels is None else "ch")

        batch = () if channels is None else (channels,)
        st = demod.lock_phase(wave[..., :LOCK_SAMPLES], demod.init_state(batch))
        (ri, rq), _ = demod.demodulate(wave[..., LOCK_SAMPLES:], st)
        np.testing.assert_allclose(np.asarray(si[..., LOCK_SAMPLES:]),
                                   np.asarray(ri), atol=2e-6)
        np.testing.assert_allclose(np.asarray(sq[..., LOCK_SAMPLES:]),
                                   np.asarray(rq), atol=2e-6)


class TestTimeShardedModulator:
    SCHEMES = ["qpsk", "bpsk", "bfsk", "mfsk", "dqpsk", "dbpsk", "dcqpsk",
               "msk", "oqpsk", "16cpfsk", "qam16", "16apsk"]

    @pytest.mark.parametrize("name", SCHEMES)
    def test_matches_single_device(self, name, mesh_time8):
        rates = RATES
        scheme = make_scheme(name, rates)
        mod = Modulator(scheme, rates)
        bits = bits_for(scheme, n_sym=64, seed=7)
        (ri, rq), _ = mod.baseband(bits, mod.init_state())
        si, sq = time_sharded_baseband(mod, bits, mesh_time8)
        tol = 2e-5 if name in ("dqpsk", "dbpsk") else 1e-6
        np.testing.assert_allclose(np.asarray(si), np.asarray(ri), atol=tol)
        np.testing.assert_allclose(np.asarray(sq), np.asarray(rq), atol=tol)

    def test_channel_and_time_sharded(self, mesh8):
        scheme = make_scheme("mfsk", RATES)
        mod = Modulator(scheme, RATES)
        bits = bits_for(scheme, n_sym=32, seed=8, channels=4)
        (ri, rq), _ = mod.baseband(bits, mod.init_state((4,)))
        si, sq = time_sharded_baseband(mod, bits, mesh8)
        np.testing.assert_allclose(np.asarray(si), np.asarray(ri), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sq), np.asarray(rq), atol=1e-6)


class TestShardedDifferentialChain:
    def test_fused_dmpsk_sharded_exact(self, mesh8):
        """Distributed fused DMPSK: cross-device modular prefix + fused LUT
        kernel + seam-stitched differential decode == single-device fused
        roundtrip == input bits."""
        from modem_tpu import make_scheme
        from modem_tpu.chain import DifferentialChain
        from modem_tpu.parallel import ShardedDifferentialChain

        chain = DifferentialChain(make_scheme("dqpsk", RATES), RATES)
        sharded = ShardedDifferentialChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=96, channels=4, seed=31)
        out = sharded.fused_roundtrip_fn()(sharded.shard_bits(bits))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(chain.roundtrip_fused(bits))
        )

    def test_rejects_non_differential(self, mesh8):
        from modem_tpu.parallel import ShardedDifferentialChain

        with pytest.raises(TypeError):
            ShardedDifferentialChain(qpsk_reference_chain(RATES), mesh8)


class TestShardedFusedTxRx:
    """Sharded one-way fused TX / RX (`fused_tx_fn` / `fused_rx_fn`)."""

    def test_tx_waveform_matches_single_device(self, mesh8):
        chain = qpsk_reference_chain(RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=96, channels=4, seed=21)
        wave, ext = sharded.fused_tx_fn()(sharded.shard_bits(bits))
        one_i, one_q = chain.tx_fused(bits)
        n = 96 * chain.sps
        np.testing.assert_allclose(np.asarray(wave[0]), np.asarray(one_i[..., :n]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(wave[1]), np.asarray(one_q[..., :n]),
                                   atol=1e-6)
        # the last shard's ext is the stream flush tail
        d = chain.span * chain.sps
        np.testing.assert_allclose(np.asarray(ext[0][..., -d:]),
                                   np.asarray(one_i[..., n:]), atol=1e-6)

    def test_tx_rx_pipeline_exact(self, mesh8):
        chain = qpsk_reference_chain(RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=96, channels=4, seed=22)
        wave, ext = sharded.fused_tx_fn()(sharded.shard_bits(bits))
        out = sharded.fused_rx_fn()(wave, ext)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_passband_tx_rx_pipeline_exact(self, mesh8):
        chain = PulseShapedChain(QAM(4, 0.0, 6.0), RATES, carrier_hz=2000)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=96, channels=4, seed=23)
        wave, ext = sharded.fused_tx_fn()(sharded.shard_bits(bits))
        x_one = chain.tx_fused(bits)
        n = 96 * chain.sps
        np.testing.assert_allclose(np.asarray(wave[0]), np.asarray(x_one[..., :n]),
                                   atol=1e-5)
        out = sharded.fused_rx_fn()(wave, ext)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_rx_accepts_staged_tx_waveform(self, mesh8):
        """The sharded fused RX decodes the *staged* single-device TX output
        re-sharded onto the mesh (interop across implementations)."""
        chain = qpsk_reference_chain(RATES)
        sharded = ShardedPulseChain(chain, mesh8)
        bits = bits_for(chain.scheme, n_sym=96, channels=4, seed=24)
        si, sq = chain.tx(bits)
        n = 96 * chain.sps
        d = chain.span * chain.sps
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh8, P("ch", "time"))
        wave = tuple(jax.device_put(w[..., :n], sh) for w in (si, sq))
        # fake per-shard ext: zeros except the true flush everywhere (only
        # the last shard's ext is read)
        t_dev = mesh8.shape["time"]
        ext = tuple(
            jax.device_put(jnp.tile(w[..., n:], (1, t_dev)), sh)
            for w in (si, sq))
        out = sharded.fused_rx_fn()(wave, ext)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


class TestShardedResampled:
    """Distributed config #4 (`parallel.resampled.ShardedResampledChain`)."""

    def _make(self, mesh, up, down):
        from modem_tpu.parallel import ShardedResampledChain
        from modem_tpu.resampled import ResampledChain

        chain = ResampledChain(QAM(4, 0.0, 1.0), RATES, up, down)
        return chain, ShardedResampledChain(chain, mesh)

    @pytest.mark.parametrize("up,down", [(3, 2), (2, 3)])
    def test_roundtrip_matches_single_device(self, mesh8, up, down):
        chain, sharded = self._make(mesh8, up, down)
        k_local = 24 * sharded.quantum  # per-shard symbols, quantum-aligned
        k = k_local * mesh8.shape["time"]
        bits = bits_for(chain.scheme, n_sym=k, channels=4, seed=41)
        out = sharded.fused_roundtrip_fn()(sharded.shard_bits(bits))
        single = chain.roundtrip_fused(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(single))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_tx_rx_pipeline(self, mesh8):
        chain, sharded = self._make(mesh8, 3, 2)
        k = 24 * sharded.quantum * mesh8.shape["time"]
        bits = bits_for(chain.scheme, n_sym=k, channels=4, seed=42)
        wave, drain = sharded.fused_tx_fn()(sharded.shard_bits(bits))
        # the sharded waveform equals the single-device channel waveform
        ci, cq = chain.tx_fused(bits)
        n = k * chain.sps * chain.up // chain.down
        np.testing.assert_allclose(np.asarray(wave[0]),
                                   np.asarray(ci[..., :n]), atol=1e-5)
        out = sharded.fused_rx_fn()(wave, drain)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_rejects_misaligned_shards(self, mesh8):
        chain, sharded = self._make(mesh8, 2, 3)
        assert sharded.quantum == 3
        # one extra symbol per shard breaks the 3-symbol pattern quantum
        bad = (24 * sharded.quantum + 1) * mesh8.shape["time"]
        bits = bits_for(chain.scheme, n_sym=bad, channels=4, seed=43)
        with pytest.raises(Exception, match="multiple"):
            sharded.fused_roundtrip_fn()(sharded.shard_bits(bits))


class TestGenericChannelSharding:
    """parallel.generic.channel_sharded: any batched chain, one line."""

    def test_gmsk_roundtrip_sharded(self):
        from modem_tpu.gmsk import GmskChain
        from modem_tpu.parallel import channel_sharded, make_modem_mesh

        c = GmskChain(RATES, bt=0.3)
        mesh = make_modem_mesh(ch=8)
        rng = np.random.default_rng(31)
        bits = jnp.asarray(rng.integers(0, 2, (8, 96)), jnp.int32)
        ref = c.roundtrip(bits)
        out = channel_sharded(c.roundtrip, mesh)(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_dsss_roundtrip_sharded(self):
        from modem_tpu.dsss import DsssChain
        from modem_tpu import make_scheme
        from modem_tpu.parallel import channel_sharded, make_modem_mesh

        c = DsssChain(make_scheme("qpsk", RATES), RATES, 16)
        mesh = make_modem_mesh(ch=8)
        rng = np.random.default_rng(33)
        bits = jnp.asarray(rng.integers(0, 2, (8, 64)), jnp.int32)
        out = channel_sharded(c.roundtrip, mesh)(bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_stbc_rx_sharded(self):
        from modem_tpu.parallel import channel_sharded, make_modem_mesh
        from modem_tpu.stbc import AlamoutiOfdm
        from modem_tpu import make_scheme

        st = AlamoutiOfdm(make_scheme("qpsk", RATES))
        mesh = make_modem_mesh(ch=8)
        rng = np.random.default_rng(32)
        bits = jnp.asarray(
            rng.integers(0, 2, (8, st.bits_per_frame(4))), jnp.int32)
        (ia, qa), (ib, qb) = st.tx(bits)
        ci, cq = ia + ib, qa + qb
        ref = st.rx(ci, cq, 4)
        out = channel_sharded(lambda i, q: st.rx(i, q, 4), mesh)(ci, cq)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

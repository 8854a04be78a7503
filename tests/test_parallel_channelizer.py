"""Distributed channelizer (parallel/channelizer.py): waveform parity of
the time-sharded banks vs the single-device Channelizer (to float32 ULP —
XLA orders the DFT-matmul accumulation differently inside shard_map), and
the full config-#5 story — channel-sharded modems on every device talking
through ONE time-sharded wideband stream, exact BITS end to end.
"""

import numpy as np

import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.ops.channelizer import Channelizer
from modem_tpu.parallel.channelizer import (
    sharded_analyze_fn, sharded_synthesize_fn, wideband_rx_fn,
    wideband_tx_fn,
)
from modem_tpu.parallel.mesh import make_modem_mesh
from modem_tpu.sync import AcquiringReceiver

RATES = Rates(baud_rate=1250, sample_rate=10000)
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def _ulp_close(a, b):
    # identical math modulo XLA's accumulation order inside shard_map
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=2e-6)


def _rand_channels(m, k, seed):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)))


class TestShardedBankParity:
    def test_analyze_bitexact(self):
        m = 16
        bank = Channelizer(m)
        mesh = make_modem_mesh(ch=1, time=8)
        rng = np.random.default_rng(0)
        n = 8 * m * 64
        wi = jnp.asarray(rng.normal(size=n).astype(np.float32))
        wq = jnp.asarray(rng.normal(size=n).astype(np.float32))
        ref = bank.analyze(wi, wq)
        got = sharded_analyze_fn(bank, mesh)(wi, wq)
        _ulp_close(ref[0], got[0])
        _ulp_close(ref[1], got[1])

    def test_synthesize_bitexact(self):
        m = 16
        bank = Channelizer(m)
        mesh = make_modem_mesh(ch=1, time=8)
        ci, cq = _rand_channels(m, 8 * 64, 1)
        ref = bank.synthesize(ci, cq)
        got = sharded_synthesize_fn(bank, mesh)(ci, cq)
        _ulp_close(ref[0], got[0])
        _ulp_close(ref[1], got[1])

    def test_redeal_roundtrip_bitexact(self):
        # wideband_tx_fn / wideband_rx_fn = banks + all_to_all re-deal:
        # same numbers as the single-device banks, channel-sharded layout
        m = 16
        bank = Channelizer(m)
        mesh = make_modem_mesh(ch=1, time=8)
        ci, cq = _rand_channels(m, 8 * 64, 2)
        wi_ref, wq_ref = bank.synthesize(ci, cq)
        wi, wq = wideband_tx_fn(bank, mesh)(ci, cq)
        _ulp_close(wi_ref, wi)
        yi_ref, yq_ref = bank.analyze(wi_ref, wq_ref)
        yi, yq = wideband_rx_fn(bank, mesh)(wi, wq)
        _ulp_close(yi_ref, yi)
        _ulp_close(yq_ref, yq)
        assert np.asarray(wq).shape == np.asarray(wq_ref).shape


class TestWidebandStory:
    def test_sharded_bursts_through_one_wideband_stream(self):
        # BASELINE config #5 end to end: 16 QPSK bursts modulated on the
        # (channel-sharded) devices, re-dealt + synthesized into ONE
        # time-sharded wideband stream, analyzed back, re-dealt to channel
        # sharding, blindly acquired — exact bits on every channel, and
        # bit-exact against the single-device wideband path.
        m, n_payload = 16, 96
        chain = qpsk_reference_chain(RATES)
        rxr = AcquiringReceiver(chain, PRE, max_lag=200)
        mesh = make_modem_mesh(ch=1, time=8)
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (m, n_payload * 2)), jnp.int32)
        ci, cq = rxr.tx_burst(bits)
        pad = jnp.zeros((m, (-ci.shape[-1] - 256) % 8 + 256), ci.dtype)
        ci = jnp.concatenate([ci, pad], axis=-1)
        cq = jnp.concatenate([cq, pad], axis=-1)

        bank = Channelizer(m)
        wi, wq = wideband_tx_fn(bank, mesh)(ci, cq)
        yi, yq = wideband_rx_fn(bank, mesh)(wi, wq)
        out = rxr.rx(yi, yq, n_payload)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

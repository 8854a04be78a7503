"""WidebandModem (wideband.py): the one-object wideband system — exact
payload bits through synthesis -> wideband -> analysis -> blind
acquisition, single-device and meshed, with identical decisions.
"""

import numpy as np

import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import apply_cfo, apply_gain_phase
from modem_tpu.parallel.mesh import make_modem_mesh
from modem_tpu.sync import AcquiringReceiver
from modem_tpu.wideband import WidebandModem

import jax

RATES = Rates(baud_rate=1250, sample_rate=10000)
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def _modems(m, n_payload):
    chain = qpsk_reference_chain(RATES)
    rxr = AcquiringReceiver(chain, PRE, max_lag=200)
    solo = WidebandModem(rxr, m, n_payload)
    mesh = make_modem_mesh(ch=1, time=8)
    dist = WidebandModem(rxr, m, n_payload, mesh=mesh)
    return solo, dist


class TestWidebandModem:
    def test_roundtrip_exact_and_mesh_parity(self):
        m, n_payload = 16, 128
        solo, dist = _modems(m, n_payload)
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, (m, n_payload * 2)), jnp.int32)

        wi1, wq1 = solo.tx(bits)
        assert wi1.shape[-1] == m * solo.window
        out1 = solo.rx(wi1, wq1)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(bits))

        wi2, wq2 = dist.tx(bits)
        out2 = dist.rx(wi2, wq2)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(bits))
        # same math modulo shard_map accumulation order, over the common
        # prefix (the meshed window rounds up to divide by the axis size)
        n = wi1.shape[-1]
        np.testing.assert_allclose(np.asarray(wi1),
                                   np.asarray(wi2)[..., :n],
                                   rtol=2e-5, atol=2e-5)

    def test_exact_through_front_end_impairments(self):
        # the whole bank tilts together (one analog front end): CFO + gain
        # + AWGN on the wideband stream, still exact bits per channel
        m, n_payload = 8, 96
        solo, _ = _modems(m, n_payload)
        rng = np.random.default_rng(1)
        bits = jnp.asarray(rng.integers(0, 2, (m, n_payload * 2)), jnp.int32)
        wi, wq = solo.tx(bits)
        wi, wq = apply_cfo(wi, wq, 3.0, RATES.sample_rate * m, phase0=0.4)
        wi, wq = apply_gain_phase(wi, wq, gain=0.9)
        wi, wq = awgn(jax.random.key(2), wi, wq, snr_db=28.0)
        out = solo.rx(wi, wq)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_validation(self):
        solo, _ = _modems(8, 64)
        rng = np.random.default_rng(2)
        bad = jnp.asarray(rng.integers(0, 2, (4, 128)), jnp.int32)
        try:
            solo.tx(bad)
            assert False, "expected channel-count mismatch to raise"
        except ValueError:
            pass

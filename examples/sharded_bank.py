"""A 256-channel modem bank over a device mesh (BASELINE config #5 shape).

Runs anywhere: on a pod it spans real chips; locally, test with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_bank.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import qpsk_reference_chain
from modem_tpu.debug import finite_fraction
from modem_tpu.parallel import ShardedPulseChain, make_modem_mesh


def main():
    n = len(jax.devices())
    time = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    mesh = make_modem_mesh(ch=n // time, time=time)
    print("mesh:", dict(mesh.shape))

    rates = Rates(baud_rate=1250, sample_rate=10000)
    chain = qpsk_reference_chain(rates)
    sc = ShardedPulseChain(chain, mesh)

    channels, n_sym = 256, 1024 * time
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (channels, n_sym * 2)), jnp.int32)

    out = sc.roundtrip_fn()(sc.shard_bits(bits), jax.random.key(0))
    print("noiseless decisions exact:", bool((out == bits).all()))

    err, tot = sc.ber_fn(snr_db=6.0)(sc.shard_bits(bits), jax.random.key(1))
    print(f"BER at 6 dB over {channels} channels: {int(err)}/{int(tot)}"
          f" = {int(err) / int(tot):.5f}")
    print("all finite:", float(finite_fraction(out)) == 1.0)


if __name__ == "__main__":
    main()

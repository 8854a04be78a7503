"""One antenna, M channels: the full wideband production story.

The reference is a single-channel pipe (one scheme, one stream,
`modulate.rs` -> `demodulate.rs`). A deployed system has ONE wideband
front end carrying many channels; this example runs that system end to
end on the device mesh:

    per-channel payload bits                     [M, n_bits]
      -> QPSK RRC bursts (preamble + payload)    sync.AcquiringReceiver.tx_burst
      -> channel-sharded over the mesh, re-dealt + polyphase synthesis bank
         -> ONE time-sharded wideband stream at M x the channel rate
                                                 parallel/channelizer.wideband_tx_fn
      -> wideband impairments: CFO + gain + AWGN (the whole bank tilts
         together, as one analog front end would)
      -> polyphase analysis bank + re-deal back to channel sharding
                                                 parallel/channelizer.wideband_rx_fn
      -> blind per-channel acquisition (timing/frame/CFO/phase/gain — also
         absorbs the banks' group delay)         parallel/acquire.sharded_acquire_fn
      -> exact payload bits on every channel

Run: python examples/wideband_bank.py          (TPU or 8-device CPU mesh)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from modem_tpu import Channelizer, Rates, qpsk_reference_chain
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import apply_cfo, apply_gain_phase
from modem_tpu.parallel import make_modem_mesh, sharded_acquire_fn
from modem_tpu.parallel.channelizer import wideband_rx_fn, wideband_tx_fn
from modem_tpu.sync import AcquiringReceiver

RATES = Rates(baud_rate=1250, sample_rate=10000)
PRE = np.array([0, 1, 3, 2, 2, 0, 1, 1, 3, 0, 2, 3, 0, 0, 1, 2,
                3, 3, 1, 0, 2, 1, 0, 2, 1, 3, 2, 2, 0, 3, 1, 0])


def main():
    n_dev = len(jax.devices())
    mesh = make_modem_mesh(ch=1, time=n_dev)
    m = 4 * n_dev                      # channels in the bank
    n_payload = 256                    # QPSK symbols per burst

    chain = qpsk_reference_chain(RATES)
    rxr = AcquiringReceiver(chain, PRE, max_lag=200)
    bank = Channelizer(m)

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (m, n_payload * 2)), jnp.int32)

    # --- TX: per-channel bursts -> one wideband stream ------------------
    ci, cq = rxr.tx_burst(bits)
    pad = jnp.zeros((m, (-(ci.shape[-1] + 256)) % n_dev + 256), ci.dtype)
    ci = jnp.concatenate([ci, pad], axis=-1)   # listen window, /= mesh
    cq = jnp.concatenate([cq, pad], axis=-1)
    wi, wq = wideband_tx_fn(bank, mesh)(ci, cq)
    print(f"{m} bursts -> wideband stream of {wi.shape[-1]} samples "
          f"at {m}x the channel rate, time-sharded over {n_dev} devices")

    # --- the air: one analog front end's worth of dirt ------------------
    wi, wq = apply_cfo(wi, wq, 3.0, RATES.sample_rate * m, phase0=0.7)
    wi, wq = apply_gain_phase(wi, wq, gain=0.85)
    wi, wq = awgn(jax.random.key(1), wi, wq, snr_db=28.0)

    # --- RX: channelize + blind per-channel acquisition -----------------
    yi, yq = wideband_rx_fn(bank, mesh)(wi, wq)
    acq_mesh = make_modem_mesh(ch=n_dev, time=1)
    out = sharded_acquire_fn(rxr, acq_mesh, n_payload)(yi, yq)

    errs = int(jnp.sum(out != bits))
    print(f"recovered {m} x {n_payload * 2} payload bits, "
          f"{errs} errors at 28 dB wideband SNR")
    assert errs == 0


if __name__ == "__main__":
    main()

"""One-way production pipeline: fused TX, a channel, fused RX with LLRs.

The fused *roundtrip* kernels (bench.py) never let the waveform touch HBM —
ideal for BER simulation. A deployment transmits and receives separately;
this example drives those halves (`ops/pallas_txrx`, round 2):

    bits --StreamingFusedTx--> int16 passband blocks   (the wire format)
         --channel (AWGN)-->
         --StreamingFusedRx--> decided bits
    and a soft path: rx_soft_fused -> per-bit LLRs for an outer FEC.

Run: python examples/production_pipeline.py          (TPU or CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from modem_tpu import LinkStats, PulseShapedChain, Rates
from modem_tpu.models.qam import QAM
from modem_tpu.streaming import StreamingFusedRx, StreamingFusedTx

SCALE = 8192.0  # int16 wire quantization


def main():
    rates = Rates(baud_rate=1250, sample_rate=10000)
    chain = PulseShapedChain(QAM(4, 0.0, 6.0), rates, carrier_hz=2000)
    rng = np.random.default_rng(0)
    n_sym = 600
    bits = jnp.asarray(
        rng.integers(0, 2, (n_sym * 4,)).astype(np.int32))

    # ---- transmit side: stream int16 passband blocks ----
    tx = StreamingFusedTx(chain, out_scale=SCALE)
    wire = []
    for start in range(0, n_sym, 200):
        seg = bits[start * 4: (start + 200) * 4]
        wire.append(np.asarray(tx.push(seg)))        # int16 [200*sps]
    wire.append(np.asarray(tx.flush()))              # the flush tail
    wire = np.concatenate(wire, -1)
    print(f"wire stream: {wire.size} int16 samples "
          f"({wire.size * 2} bytes for {bits.size} bits)")

    # ---- channel: AWGN on the physical (quantized) waveform ----
    x = wire.astype(np.float32) / SCALE
    snr_db = 22.0
    es = float(np.mean(np.sum(np.asarray(chain.lut) ** 2, -1)))
    sigma = float(np.sqrt(es / (10.0 ** (snr_db / 10.0)) / 4.0))
    x = x + sigma * rng.normal(size=x.shape).astype(np.float32)

    # ---- receive side: stream blocks, decisions lag span symbols;
    #      LinkStats accumulates exact streaming counters block by block ----
    rx = StreamingFusedRx(chain)
    stats = LinkStats.zero()
    decided = []
    sps = chain.sps
    emitted = 0
    for start in range(0, x.size, 160 * sps):
        blk = jnp.asarray(x[start: start + 160 * sps])
        if blk.shape[-1] % sps:
            break
        d = rx.push(blk)
        keep = min(int(d.shape[-1]), bits.size - emitted)
        if keep > 0:
            stats = stats.update_bits(bits[emitted: emitted + keep],
                                      d[..., :keep])
        emitted += keep
        decided.append(np.asarray(d))
    decided = np.concatenate(decided, -1)[: bits.size]
    ber = float(np.mean(decided != np.asarray(bits)))
    print(f"hard decisions at {snr_db:.0f} dB Es/N0: BER = {ber:.2e}")
    s = stats.summary()
    assert s["bit_errors"] == int(np.sum(decided != np.asarray(bits)))
    print(f"LinkStats: {s['blocks']} blocks, {s['bits']} bits, "
          f"{s['bit_errors']} errors (BER {s['ber']:.2e}) — "
          f"exactly matches the offline recount")

    # ---- soft output: one-shot LLRs for an outer decoder ----
    llr = chain.rx_soft_fused(jnp.asarray(x), n_sym, noise_var=sigma**2 * 2)
    agree = float(np.mean((np.asarray(llr) < 0).astype(np.int32)
                          == decided[: llr.shape[-1]]))
    print(f"LLR signs agree with hard decisions: {agree * 100:.1f}%")


if __name__ == "__main__":
    main()

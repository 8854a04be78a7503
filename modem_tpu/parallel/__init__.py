"""Multi-device sharding: the parallelism layer the reference lacks.

The reference is strictly single-threaded per-sample iteration
(`/root/reference/src/modem/modulator.rs:82-101`, `demodulator.rs:39-57`), so
every component here is a new capability (SURVEY.md section 2.6):

* **channel sharding** ("data parallel") — independent modem channels over a
  mesh axis, no cross-talk (:func:`channel_sharded`);
* **time sharding** ("sequence/context parallel") — one long sample stream
  split across devices, FIR/matched-filter boundaries stitched with halo
  exchanges over ICI (:mod:`.collectives`, :func:`sharded_fir`), and stateful
  phase accumulators carried across devices with an exclusive prefix scan
  (:func:`exclusive_prefix`);
* **the 2D-sharded flagship chain** (:class:`ShardedPulseChain`) — channels x
  time over a ``Mesh(("ch", "time"))``, exactly matching the single-device
  chain's bits->bits decisions.

All collectives are XLA collectives (``ppermute``/``psum``/``all_gather``)
compiled over ICI/DCN via ``jax.shard_map`` — no custom transport.
"""

from .acquire import sharded_acquire_fn
from .channelizer import (
    sharded_analyze_fn, sharded_synthesize_fn, wideband_rx_fn,
    wideband_tx_fn,
)
from .generic import channel_sharded
from .mesh import make_modem_mesh
from .ofdm import sharded_ofdm_rx_fn, sharded_ofdm_tx_fn
from .collectives import left_halo, right_halo, exclusive_prefix
from .fir import fir_with_halo, sharded_fir
from .chain import ShardedDifferentialChain, ShardedPulseChain
from .modulator import time_sharded_baseband
from .resampled import ShardedResampledChain
from .rx import sharded_demodulate
from .fsk import time_sharded_fsk_roundtrip_fn
from .viterbi import sharded_viterbi_fn, viterbi_with_halo

__all__ = [
    "channel_sharded", "make_modem_mesh", "left_halo", "right_halo", "exclusive_prefix",
    "fir_with_halo", "sharded_fir", "ShardedDifferentialChain",
    "ShardedPulseChain", "ShardedResampledChain",
    "sharded_acquire_fn", "sharded_analyze_fn", "sharded_synthesize_fn",
    "sharded_ofdm_rx_fn", "sharded_ofdm_tx_fn",
    "sharded_viterbi_fn", "time_sharded_baseband",
    "sharded_demodulate", "time_sharded_fsk_roundtrip_fn",
    "viterbi_with_halo", "wideband_rx_fn", "wideband_tx_fn",
]

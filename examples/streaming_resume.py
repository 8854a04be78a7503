"""Streaming with pause/resume: modulate an unbounded stream in blocks,
checkpoint mid-stream, 'restart', and verify bit-stable continuity.

    python examples/streaming_resume.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np
import jax.numpy as jnp

from modem_tpu import Modulator, Rates, make_scheme
from modem_tpu.checkpoint import load_state, save_state


def main():
    rates = Rates(baud_rate=1250, sample_rate=10000)
    mod = Modulator(make_scheme("mfsk", rates), rates)  # stateful phase
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, 4 * 256), jnp.int32)

    # One continuous run.
    (ri, rq), _ = mod.baseband(bits, mod.init_state())

    # Same stream in two halves with a checkpoint in between.
    (a_i, a_q), st = mod.baseband(bits[: bits.size // 2], mod.init_state())
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        save_state(f.name, st)
        st2 = load_state(f.name, mod.init_state())  # "new process"
    (b_i, b_q), _ = mod.baseband(bits[bits.size // 2:], st2)

    same = bool(
        (jnp.concatenate([a_i, b_i]) == ri).all()
        and (jnp.concatenate([a_q, b_q]) == rq).all()
    )
    print("resumed waveform bit-identical:", same)
    assert same


if __name__ == "__main__":
    main()

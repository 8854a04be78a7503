"""Streaming-state checkpoint/resume.

SURVEY.md section 5: the chain's per-block carry (NCO counters, continuity
phases, FIR tails — every ``TxState``/``RxState``/scheme-state pytree) *is* a
complete checkpoint of an unbounded stream. These helpers serialize any such
pytree to a single ``.npz`` so long streams can pause and resume across
processes with bit-stable continuity (tested: stop/reload mid-stream produces
the identical waveform).

The treedef is not serialized — resuming code always has the template state
(from ``init_state``), so :func:`load_state` restores into its structure and
verifies shapes/dtypes leaf by leaf.
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np


def save_state(path, state) -> None:
    """Serialize a state pytree's leaves to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(pathlib.Path(path), **arrays)


def load_state(path, like):
    """Restore a pytree saved by :func:`save_state` into the structure of
    ``like`` (e.g. a fresh ``init_state()``). Raises on any leaf-count,
    shape, or dtype mismatch."""
    with np.load(pathlib.Path(path)) as data:
        arrays = [data[f"leaf_{i}"] for i in range(len(data.files))]
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(arrays) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves, template has {len(leaves)}"
        )
    for i, (a, l) in enumerate(zip(arrays, leaves)):
        tmpl = np.asarray(l)
        if a.shape != tmpl.shape or a.dtype != tmpl.dtype:
            raise ValueError(
                f"leaf {i}: checkpoint {a.shape}/{a.dtype} vs template "
                f"{tmpl.shape}/{tmpl.dtype}"
            )
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(a) for a in arrays]
    )

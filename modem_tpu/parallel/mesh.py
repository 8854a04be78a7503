"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_modem_mesh(
    ch: int = 1, time: int = 1, devices=None
) -> Mesh:
    """A 2D ``("ch", "time")`` mesh for the modem chain.

    ``ch`` shards independent channels (embarrassingly parallel); ``time``
    shards the sample axis of one stream (halo-exchange parallel). Defaults
    cover all available devices when one factor is given as -1.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if ch == -1:
        ch = n // time
    if time == -1:
        time = n // ch
    if ch * time > n:
        raise ValueError(f"mesh {ch}x{time} needs {ch * time} devices, have {n}")
    grid = np.asarray(devices[: ch * time]).reshape(ch, time)
    return Mesh(grid, ("ch", "time"))

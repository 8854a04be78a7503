"""Test harness config: run the suite on a virtual 8-device CPU mesh.

The sandbox's sitecustomize registers the ``axon`` TPU plugin and force-sets
``jax_platforms="axon,cpu"`` in every process, so an env var alone is not
enough — we must override the config after importing jax (but before any
backend is initialized). Virtual CPU devices are the standard JAX trick for
testing N-device sharding without a pod (SURVEY.md section 4).

Set ``MODEM_TPU_TEST_PLATFORM=axon`` to run the suite on real TPU hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update(
    "jax_platforms", os.environ.get("MODEM_TPU_TEST_PLATFORM", "cpu")
)

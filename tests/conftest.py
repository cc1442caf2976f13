"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4 test-tier plan).

The container's sitecustomize eagerly registers and initializes the TPU
('axon') PJRT backend at interpreter start, before conftest can set
JAX_PLATFORMS.  Switch the already-imported jax to an 8-device CPU platform
in-process: update the ``jax_platforms`` config and drop the initialized
backends so the CPU client is (re)created with the host-device-count flag.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu" or jax.device_count() != 8:
    from jax._src import xla_bridge
    xla_bridge._clear_backends()
assert jax.device_count() == 8, jax.devices()

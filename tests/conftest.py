"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first ``import jax`` anywhere in the
test process (standard JAX fake-backend trick for exercising pjit /
shard_map sharding logic without TPU hardware).
"""

import os

# Force-set: the machine environment pins JAX_PLATFORMS=axon (TPU tunnel),
# which would silently route all tests through the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

"""Test configuration: run every test on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
process (SURVEY.md §4: multi-device tests via
xla_force_host_platform_device_count).
"""

import os

# force-override: the environment pins JAX_PLATFORMS=axon (the tunneled
# TPU); tests must run hermetically on the host CPU
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms="axon,cpu" via jax.config at
# interpreter startup (overriding env); re-pin to cpu before any backend
# is initialized
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.default_backend() == "cpu", (
    "tests must run on the host CPU backend, got "
    f"{jax.default_backend()!r} — a plugin imported jax before conftest?"
)

"""Root conftest: pin tests to a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in ``bench.py``; tests exercise the identical
code paths on CPU (XLA host platform) with 8 virtual devices so sharding
logic is covered without TPU hardware.
"""

import os

# Force CPU: the session environment may point JAX at a remote TPU tunnel
# (JAX_PLATFORMS=axon), which must not serve unit tests.  A sitecustomize
# may have imported jax before this file runs, so setting the env var is
# not enough — update the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

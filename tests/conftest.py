"""Test configuration: force an 8-virtual-device CPU platform BEFORE
jax initializes, so sharding tests exercise real multi-device code
paths without TPU hardware (the standard JAX fake-multi-device
mechanism)."""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Drop the axon TPU-tunnel plugin from sys.path: tests are CPU-only and
# the plugin's registration can block on the tunnel.
sys.path = [p for p in sys.path if "axon_site" not in p]

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_default_matmul_precision", "highest")

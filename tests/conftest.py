"""Test configuration: force an 8-virtual-device CPU platform so
sharding tests exercise real multi-device code paths without TPU
hardware (the standard JAX fake-multi-device mechanism).

Note: this environment pre-imports jax at interpreter startup (a
sitecustomize registers the TPU-tunnel PJRT plugin), so JAX_PLATFORMS
in os.environ is read too late — the platform must be forced through
jax.config. XLA_FLAGS still works because backends initialize lazily
at first device access, which is after conftest runs.
"""
import os

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " "
                               + _flag).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

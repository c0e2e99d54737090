"""Test configuration: run the suite on a virtual 8-device CPU platform.

The session environment pins ``JAX_PLATFORMS=axon`` (single real TPU chip) and a
sitecustomize module pre-imports JAX, so plain env vars are too late — we override the
platform through ``jax.config`` before any backend is initialized.  Numerics tests get
native float64 on CPU; sharding tests get an 8-device mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Global numerical configuration for neutfem_tpu.

The reference implementation (``/root/reference``, C++/Eigen) computes everything in
float64 (``include/FEM.hpp:30-37`` uses ``double`` throughout).  On TPU, float64 is
emulated; we therefore keep the *working* dtype configurable:

* ``NEUTFEM_X64=1`` (default): enable JAX x64 and solve in float64 — bit-faithful to
  the reference math, required for sub-pcm eigenvalue agreement out of the box.
* ``NEUTFEM_X64=0``: leave JAX in float32 mode.  The power iteration then runs in
  float32 with float64-emulated reductions where it matters.

This module must be imported before any other JAX work in the package.
"""

from __future__ import annotations

import os

import jax

_X64 = os.environ.get("NEUTFEM_X64", "1") not in ("0", "false", "False")

if _X64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

#: Working dtype for all solver arrays.
real_dtype = jnp.float64 if _X64 else jnp.float32

#: Index dtype.
index_dtype = jnp.int32


def x64_enabled() -> bool:
    return _X64

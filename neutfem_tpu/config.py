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

# Platform override (e.g. NEUTFEM_PLATFORM=cpu): the axon sitecustomize selects
# the TPU backend even with JAX_PLATFORMS=cpu in the env (CLAUDE.md trap), so a
# config-level update before backend init is the only reliable way to force a
# platform in subprocesses (benchmarks/coldstart.py smoke tests, CI-style runs).
_plat = os.environ.get("NEUTFEM_PLATFORM", "")
if _plat:
    jax.config.update("jax_platforms", _plat)

_X64 = os.environ.get("NEUTFEM_X64", "1") not in ("0", "false", "False")

if _X64:
    jax.config.update("jax_enable_x64", True)

# TPU matmul precision: JAX's DEFAULT lowers float32 contractions to single-pass
# bfloat16 on the MXU (~8-bit mantissa).  Every higher-order (P > 1) hot-path op
# here is a SMALL einsum (B/B^T mode contractions, bubble condensation, PxP
# block-Jacobi applies) whose operand dims are <= ~9 — MXU time is negligible but
# the bf16 rounding is not: it floors the outer flux-diff at ~1e-3..2e-3 at scale
# (the round-2 "higher-order float32 floor"; CPU f32, with true-f32 einsums,
# converges the same problems to dphi < 1e-5).  HIGHEST recovers ~f32 accuracy
# via multi-pass bf16 at immeasurable cost for these shapes.  Override with
# NEUTFEM_MATMUL_PRECISION=default if ever needed.
_prec = os.environ.get("NEUTFEM_MATMUL_PRECISION", "highest")
if _prec not in ("", "default"):
    jax.config.update("jax_default_matmul_precision", _prec)

# Persistent compilation cache: the jitted power-iteration while_loops are large
# graphs whose first compile dominates small-problem wall time; cache them across
# processes (override location with NEUTFEM_COMP_CACHE, disable with "0").
_cache_dir = os.environ.get("NEUTFEM_COMP_CACHE", os.path.expanduser("~/.cache/neutfem_jax"))
if _cache_dir not in ("0", ""):
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

#: Working dtype for all solver arrays.
real_dtype = jnp.float64 if _X64 else jnp.float32

#: Index dtype.
index_dtype = jnp.int32


def x64_enabled() -> bool:
    return _X64


def set_x64(enabled: bool) -> None:
    """Switch the working dtype at runtime (before building any solver).

    Needed because ``python -m benchmarks.<tool>`` imports the ``benchmarks``
    package (→ this module) BEFORE the tool's own module code runs, so setting
    ``NEUTFEM_X64`` at the tool's module top is already too late.  All package
    code reads ``config.real_dtype`` by attribute, so flipping it here is safe
    as long as no solver arrays exist yet."""
    global _X64, real_dtype
    _X64 = bool(enabled)
    jax.config.update("jax_enable_x64", _X64)
    real_dtype = jnp.float64 if _X64 else jnp.float32

"""Multi-chip SPMD execution over a JAX device mesh.

The reference is a serial, single-process CPU solver (SURVEY §2.6 — no MPI/threads);
this module is new TPU-native scope: spatial domain decomposition of the structured
grid over a 1D (or 2D) device mesh via ``jax.sharding`` + ``jit``.

Decomposition: cell grids (ng, nz, ny, nx, ...) are sharded along one spatial axis
("y" by default; "z" for tall 3D problems).  Everything the solver does is either

* elementwise / small einsum over trailing mode axes — embarrassingly parallel;
* shifted-slice neighbor coupling (B/B^T, CMFD stencils) — XLA inserts halo
  exchanges (collective-permute over ICI) automatically;
* tridiagonal solves along mesh lines — for directions orthogonal to the sharded
  axis these are batch-parallel; along the sharded axis the ``associative_scan``
  lowers to a log-depth tree whose cross-shard steps become collective permutes;
* two global reductions per outer iteration (fission production, flux norm) — psum.

The per-group Schur CG thus runs fully sharded with only O(boundary) communication
per matvec — the mixed-FEM analogue of halo-exchange stencil codes.

``dryrun_multichip`` in ``__graft_entry__.py`` validates this path on a virtual
8-device CPU mesh.

Note: the Pallas Thomas kernel (ops/pallas_tridiag.py) is opaque to GSPMD — for
multi-chip runs set ``NEUTFEM_PALLAS=0`` so the tridiagonal solves use the
``associative_scan`` path, which the partitioner handles (sharding a Pallas call
would force an all-gather of its operands).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .fespace import FESpace
from .power import SolveOptions, power_iteration

__all__ = ["device_mesh", "shard_context", "shard_state", "sharded_power_iteration"]

#: name of the mesh axis used for spatial decomposition
SPATIAL_AXIS = "space"


def device_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1D device mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (SPATIAL_AXIS,))


def _spec_for(key: str, shape, fes: FESpace, grid_axis: int, n_shards: int) -> P:
    """PartitionSpec sharding the chosen spatial grid axis of a context array.

    grid_axis: 1 => shard ny (axis index within (nz, ny, nx)), 0 => shard nz.
    Context arrays are either (ng, nz, ny, nx[, ...]) grids, face grids with one
    spatial axis extended by +1 (same rank), plain (nz, ny, nx) grids, or small
    reference-element tensors.  Arrays whose target dimension is not divisible by
    the mesh (face grids along the sharded direction, size n+1) are replicated —
    explicit device_put requires even shards; GSPMD still partitions the compute.
    """
    ndim = len(shape)
    if ndim >= 4:  # (ng, nz, ny, nx, ...) or (ng, ng, nz, ny, nx)
        lead = ndim - 3 if key in ("sigs",) else 1
        axis = lead + grid_axis
    elif ndim == 3:  # (nz, ny, nx) or face-shaped
        axis = grid_axis
    else:
        return P()  # small reference-element tensors
    if shape[axis] % n_shards != 0:
        return P()
    spec = [None] * ndim
    spec[axis] = SPATIAL_AXIS
    return P(*spec)


def shard_context(ctx: Dict, mesh: Mesh, fes: FESpace, grid_axis: int = 1) -> Dict:
    """device_put every context array with its spatial sharding."""
    n_shards = mesh.devices.size
    out = {}
    for k, v in ctx.items():
        spec = _spec_for(k, np.shape(v), fes, grid_axis, n_shards)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_state(phi, mesh: Mesh, grid_axis: int = 1):
    """Shard a flux array (ng, nz, ny, nx, P) along the chosen spatial axis."""
    spec = [None] * phi.ndim
    spec[1 + grid_axis] = SPATIAL_AXIS
    return jax.device_put(phi, NamedSharding(mesh, P(*spec)))


def sharded_power_iteration(fes: FESpace, ng: int, opts: SolveOptions, mesh: Mesh,
                            grid_axis: int = 1):
    """Jitted power iteration whose inputs/outputs live sharded on the mesh.

    Returns a function (ctx, phi0, keff0) -> result dict.  Input ctx/phi0 should be
    placed with shard_context/shard_state; GSPMD propagates the shardings through
    the whole while_loop (halo exchanges + psum reductions inserted automatically).
    """
    spec = [None, None, None, None, None]
    spec[1 + grid_axis] = SPATIAL_AXIS
    phi_sharding = NamedSharding(mesh, P(*spec))

    def run(ctx, phi0, keff0):
        res = power_iteration(fes, ng, opts, ctx, phi0, keff0)
        # pin the flux to the spatial decomposition so downstream steps (power
        # edits, repeated solves) stay sharded instead of gathering to one device
        res["phi"] = jax.lax.with_sharding_constraint(res["phi"], phi_sharding)
        return res

    return jax.jit(run), phi_sharding

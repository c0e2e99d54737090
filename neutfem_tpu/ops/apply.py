"""Matrix-free applications of the mixed-FEM operators on structured grids.

Replaces the reference's global sparse matrices + SpMV (``/root/reference/src/NeutFEM.cpp``
AssembleA/B/C + Eigen products) with stencil contractions:

* ``apply_C``-style terms are elementwise (tensor-Legendre flux mass is diagonal),
* ``apply_B`` / ``apply_BT`` are tiny einsums over (longitudinal-DOF, flux-mode,
  transverse-mode) tensors plus shifted-slice neighbor sums,
* ``solve_A`` is an exact per-direction solve: static condensation of bubble DOFs to a
  face-tridiagonal system, then batched parallel Thomas (see tridiag.py).

Axis convention (INTERNAL, mode-axis-first — this is load-bearing for TPU layout):

* flux      ``(..., P, nz, ny, nx)``          — mode axis at position -4
* J face d  ``(..., T, *face_shape)``         — transverse-mode axis at -4
* J bub  d  ``(..., nbub, T, nz, ny, nx)``    — bubble axis at -5, T at -4
* spatial axes are ALWAYS the last three; direction d's axis is ``di.axis - 3``.

Why mode-first: with the mode axis trailing (the round-1 layout), the minor array
dimension has size P/T (1 for RT0-P0) — a default TPU tiled layout then pads every
lane row 1 -> 128 (128x memory), so XLA's layout assignment flips all flux-sized
intermediates to a z-minor layout and pays ~9 full-array layout-conversion copies
per CG iteration converting back at each (default-layout) Pallas custom call:
measured 41% of device time at 2.6M cells, the 1M->3.5M scaling cliff.  With the
mode axes leading, the minor dims are spatial, default layouts are near-optimal,
and every kernel-boundary reshape is a bitcast.

Public (compat/driver) arrays keep the reference-shaped trailing-mode layout
``(ng, nz, ny, nx, P)``; ``power.py`` converts at its jit boundary (once per solve).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..fespace import DirectionInfo, FESpace
from .tridiag import tridiag_solve

__all__ = [
    "apply_BT_dir",
    "apply_B_dir",
    "solve_A_dir",
    "schur_matvec",
    "weighted_mass",
    "cyc_args",
    "phi_to_internal",
    "phi_to_public",
    "J_to_public",
]


def phi_to_internal(phi):
    """Public (..., nz, ny, nx, P) -> internal (..., P, nz, ny, nx)."""
    return jnp.moveaxis(phi, -1, -4)


def phi_to_public(phi):
    """Internal (..., P, nz, ny, nx) -> public (..., nz, ny, nx, P)."""
    return jnp.moveaxis(phi, -4, -1)


def J_to_public(J: Dict) -> Dict:
    """Convert a current dict from internal to public (trailing-mode) layout."""
    out = {}
    for key, entry in J.items():
        pub = {"face": jnp.moveaxis(entry["face"], -4, -1)}
        if "bub" in entry:
            pub["bub"] = jnp.moveaxis(entry["bub"], (-5, -4), (-2, -1))
        out[key] = pub
    return out


def _pad_zero(arr, axis: int, front: bool):
    """Pad one zero slice along `axis` (negative axis ok)."""
    ax = arr.ndim + axis if axis < 0 else axis
    cfg = [(0, 0)] * arr.ndim
    cfg[ax] = (1, 0) if front else (0, 1)
    return jnp.pad(arr, cfg)


def apply_BT_dir(fes: FESpace, di: DirectionInfo, phi):
    """B_d^T phi: face rhs (..., T, n_d+1 along di) and bubble rhs (..., nbub, T, sp) or None.

    The P=T=1 (RT0-P0) contraction is a scalar multiply, NOT an einsum: degenerate
    (1,1) dots would reintroduce layout-assignment pressure for no FLOPs."""
    BX = jnp.asarray(di.BX, dtype=phi.dtype)
    ax = di.axis - 3
    if BX.shape[1] == 1 and BX.shape[2] == 1:  # P == T == 1 (RT0-P0)
        c0 = phi * BX[0, 0, 0]
        c1 = phi * BX[1, 0, 0]
    else:
        c0 = jnp.einsum("...pzyx,pt->...tzyx", phi, BX[0])  # element's left-face row
        c1 = jnp.einsum("...pzyx,pt->...tzyx", phi, BX[1])  # element's right-face row
    rF = _pad_zero(c0, ax, front=False) + _pad_zero(c1, ax, front=True)
    rW = None
    if fes.et.nbub > 0:
        rW = jnp.einsum("...pzyx,lpt->...ltzyx", phi, BX[2:])
    return rF, rW


def _face_rhs(di: DirectionInfo, phi, BXt):
    """Face rhs (..., T, faces) from flux with an arbitrary (2, P, T) pairing
    tensor (BX[:2] for the raw B^T rows, BXc for the condensed matvec).

    Built as slice/concat, NOT the pad+add of apply_BT_dir: XLA pattern-matches
    dot + shifted pad/add into a window-2 convolution and fuses the downstream
    mask/m_t scaling into it; for the y direction that conv fusion emitted at
    ~18 GB/s effective — 3.66 ms/call, 52% of RT1 device time (round-3 trace,
    fusion.623/669).  The concat form blocks the conv rewrite."""
    ax = di.axis - 3
    if BXt.shape[1] == 1 and BXt.shape[2] == 1:
        c0 = phi * BXt[0, 0, 0]
        c1 = phi * BXt[1, 0, 0]
    else:
        c0 = jnp.einsum("...pzyx,pt->...tzyx", phi, BXt[0])
        c1 = jnp.einsum("...pzyx,pt->...tzyx", phi, BXt[1])
    axn = ax % c0.ndim
    n = c0.shape[axn]
    first = lax.slice_in_dim(c0, 0, 1, axis=axn)
    mid = (lax.slice_in_dim(c0, 1, n, axis=axn)
           + lax.slice_in_dim(c1, 0, n - 1, axis=axn))
    last = lax.slice_in_dim(c1, n - 1, n, axis=axn)
    return jnp.concatenate([first, mid, last], axis=axn)


def _face_out(di: DirectionInfo, F, BXt):
    """Flux-shaped contribution of face values F with pairing tensor BXt."""
    ax = di.axis - 3
    n = F.shape[ax]
    F_L = lax.slice_in_dim(F, 0, n - 1, axis=ax)
    F_R = lax.slice_in_dim(F, 1, n, axis=ax)
    if BXt.shape[1] == 1 and BXt.shape[2] == 1:
        return F_L * BXt[0, 0, 0] + F_R * BXt[1, 0, 0]
    return (jnp.einsum("...tzyx,pt->...pzyx", F_L, BXt[0])
            + jnp.einsum("...tzyx,pt->...pzyx", F_R, BXt[1]))


def apply_B_dir(fes: FESpace, di: DirectionInfo, F, W):
    """B_d J: flux-shaped (..., P, sp) contribution from direction d."""
    BX = jnp.asarray(di.BX, dtype=F.dtype)
    ax = di.axis - 3
    n = F.shape[ax]
    F_L = lax.slice_in_dim(F, 0, n - 1, axis=ax)  # per-element left face value
    F_R = lax.slice_in_dim(F, 1, n, axis=ax)
    if BX.shape[1] == 1 and BX.shape[2] == 1:  # P == T == 1 (RT0-P0)
        # degenerate RT0-P0 contraction: elementwise (see apply_BT_dir docstring)
        out = F_L * BX[0, 0, 0] + F_R * BX[1, 0, 0]
    else:
        out = (jnp.einsum("...tzyx,pt->...pzyx", F_L, BX[0])
               + jnp.einsum("...tzyx,pt->...pzyx", F_R, BX[1]))
    if W is not None:
        out = out + jnp.einsum("...ltzyx,lpt->...pzyx", W, BX[2:])
    return out


def solve_A_dir(
    fes: FESpace,
    di: DirectionInfo,
    dinv,
    l,
    mask,
    alpha,
    rF,
    rW,
    a_mode: str,
    cyc=None,
    part=None,
):
    """Exact solve of the per-direction RT mass block A_d J = r.

    dinv, l : tridiagonal factors over faces (batch..., face_shape); l is None unless a_mode == 'exact'.
    mask    : (face_shape) 1.0 for free faces, 0.0 for pinned (MIRROR / inactive).
    alpha   : (batch..., nz, ny, nx) element coefficient factor_d / D.
    cyc     : (wt, a0, a1) Sherman-Morrison data for a PERIODIC direction: the face
              grid has n+1 entries with face n TIED to face 0; the distinct faces
              form a cyclic tridiagonal solved as y = T~^-1 rc then
              x = y - wt (a0 y_0 + a1 y_{n-1}) (see ops/context.py).
    Returns (F, W) face and bubble solutions (internal layout).
    """
    et = fes.et
    ax = di.axis - 3
    m_t = jnp.asarray(di.m_t, dtype=rF.dtype).reshape(-1, 1, 1, 1)

    if rW is not None:
        GT = jnp.asarray(et.G.T, dtype=rF.dtype)  # (2, nbub) = M_fb M_bb^-1
        corr = jnp.einsum("fb,...btzyx->...ftzyx", GT, rW)  # (..., 2, T, sp)
        corr0 = lax.index_in_dim(corr, 0, axis=-5, keepdims=False)
        corr1 = lax.index_in_dim(corr, 1, axis=-5, keepdims=False)
        rF = rF - _pad_zero(corr0, ax, front=False) - _pad_zero(corr1, ax, front=True)

    rF = rF * mask
    rFs = rF / m_t

    # factors have no T axis: align them against (..., T, face_shape)
    dinv_e = jnp.expand_dims(dinv, -4)
    l_e = jnp.expand_dims(l, -4) if l is not None else None

    # Shard-aware dispatch: when tracing under parallel.sharded_power_iteration,
    # directions orthogonal to the mesh cut keep the Pallas kernel via a shard_map
    # of per-shard local solves; the direction along the cut uses the
    # GSPMD-partitionable associative_scan (cross-shard collective permutes).
    from ..shardctx import current_sharding

    sh = current_sharding()
    shard = None
    force_scan = False
    if sh is not None and a_mode == "exact":
        mesh, axis_map = sh
        if di.axis in axis_map:
            force_scan = True  # lines cross the cut: no local Thomas possible
        else:
            base = rFs.ndim - 3  # spatial dims are the last three
            shard = (mesh, {base + ga: nm for ga, nm in axis_map.items()})

    def _line_solve(r, axn):
        if force_scan:
            mesh, axis_map = sh
            if part is not None and cyc is None:
                # partitioned (substructured) solve: local Pallas Thomas per
                # shard + one small interface all_gather — replaces the
                # GSPMD-partitioned scan whose log-stride permutes moved ~8
                # flux arrays per application (SHARDING_r05.json).  On a 2D
                # device mesh the OTHER cut axis is a pure batch dim whose
                # mesh-axis name threads through every spec (round 5);
                # shard_context only attaches `part` when it divides.
                from .parttri import tridiag_solve_partitioned

                others = {r.ndim - 3 + ga: nm for ga, nm in axis_map.items()
                          if ga != di.axis}
                return tridiag_solve_partitioned(r, part, axn, mesh,
                                                 axis_map[di.axis],
                                                 other=others)
            from .tridiag import _scan_solve

            n = r.shape[axn]
            dinv_b = jnp.broadcast_to(dinv_e, r.shape)
            l_b = jnp.broadcast_to(l_e, r.shape[:axn] + (n - 1,) + r.shape[axn + 1:])
            return _scan_solve(r, dinv_b, l_b, axn)
        return tridiag_solve(r, dinv_e, l_e, axis=axn, shard=shard)

    if cyc is not None:
        # periodic direction: fold the tied face n into face 0, solve the cyclic
        # system via Sherman-Morrison, then re-expand (F[n] = F[0]).
        wt, a0, a1 = cyc
        wt_e = jnp.expand_dims(wt, -4)
        a0_e = jnp.expand_dims(a0, -4)
        a1_e = jnp.expand_dims(a1, -4)
        axn = ax % rFs.ndim
        n1 = rFs.shape[axn]
        body = lax.slice_in_dim(rFs, 0, n1 - 1, axis=axn)
        last = lax.slice_in_dim(rFs, n1 - 1, n1, axis=axn)
        first = lax.slice_in_dim(body, 0, 1, axis=axn) + last
        rc = jnp.concatenate(
            [first, lax.slice_in_dim(body, 1, n1 - 1, axis=axn)], axis=axn
        )
        y = _line_solve(rc, axn)
        y0 = lax.slice_in_dim(y, 0, 1, axis=axn)
        yl = lax.slice_in_dim(y, n1 - 2, n1 - 1, axis=axn)
        s = a0_e * y0 + a1_e * yl
        x = y - wt_e * s
        F = jnp.concatenate([x, lax.slice_in_dim(x, 0, 1, axis=axn)], axis=axn)
    elif a_mode != "exact":
        F = rFs * dinv_e
    else:
        F = _line_solve(rFs, ax % rFs.ndim)
    F = F * mask

    W = None
    if rW is not None:
        Mbb_inv = jnp.asarray(et.Mbb_inv, dtype=rF.dtype)
        G = jnp.asarray(et.G, dtype=rF.dtype)
        n = F.shape[ax]
        F_loc = jnp.stack(
            [lax.slice_in_dim(F, 0, n - 1, axis=ax), lax.slice_in_dim(F, 1, n, axis=ax)],
            axis=-5,
        )  # (..., 2, T, sp)
        alpha_e = jnp.expand_dims(alpha, (-5, -4))
        W = jnp.einsum("bc,...ctzyx->...btzyx", Mbb_inv, rW) / (alpha_e * m_t)
        W = W - jnp.einsum("bf,...ftzyx->...btzyx", G, F_loc)
    return F, W



def ctx_face(ctx: Dict, name: str, grid_axis: int):
    """Fetch a face-shaped context array, re-joining the body + seam split that
    ``parallel.shard_context`` applies along a cut direction (body sharded over
    the device mesh, 1-wide seam replicated — per-device context memory then
    scales ~1/n_devices).  Unsplit arrays pass through untouched."""
    a = ctx[name]
    seam = ctx.get(name + "__seam")
    if seam is None:
        return a
    return jnp.concatenate([a, seam], axis=a.ndim - 3 + grid_axis)


def cyc_args(ctx: Dict, key: str):
    """Sherman-Morrison bundle for a periodic direction, or None."""
    wt = ctx.get(f"cyc_wt_{key}")
    if wt is None:
        return None
    return (wt, ctx[f"cyc_a0_{key}"], ctx[f"cyc_a1_{key}"])


def part_args(ctx: Dict, key: str):
    """Partitioned cut-axis solve bundle (parallel.shard_context attaches it
    for the direction along a 1D mesh cut), or None."""
    if f"tri_part_dinv_{key}" not in ctx:
        return None
    from .parttri import PART_NAMES

    return {n: ctx[f"tri_part_{n}_{key}"] for n in PART_NAMES}


def _maybe_partitioned_dir(fes: FESpace, di: DirectionInfo, v, ctx, key: str,
                           a_mode: str, BXt):
    """Dispatch the fully-fused partitioned Schur direction (round 5c):
    build + solve + divergence of a CUT direction in one shard_map, so the
    m = n+1 face array never exists at the jnp level and GSPMD has no uneven
    concat to reshard (the dominant residual term of the second round-5 ICI
    accounting — face-rhs/divergence all-gathers).  Returns the flux-shaped
    contribution or None (uncut direction / periodic / no bundle / not
    exact)."""
    if a_mode != "exact" or f"cyc_wt_{key}" in ctx:
        return None
    if f"tri_part_dinv_{key}" not in ctx:
        return None
    from ..shardctx import current_sharding

    shc = current_sharding()
    if shc is None or di.axis not in shc[1]:
        return None
    from .parttri import partitioned_schur_dir

    return partitioned_schur_dir(fes, di, v, ctx, key, shc[0], shc[1], BXt)

def solve_A(fes: FESpace, ctx: Dict, rhs_by_dir, a_mode: str):
    """Apply A^{-1} to per-direction rhs dict {f"d{d}": (rF, rW)} -> same structure."""
    out = {}
    for di in fes.dirs:
        key = f"d{di.d}"
        rF, rW = rhs_by_dir[key]
        F, W = solve_A_dir(
            fes,
            di,
            ctx_face(ctx, f"tri_dinv_{key}", di.axis),
            ctx.get(f"tri_l_{key}"),
            ctx_face(ctx, f"mask_{key}", di.axis),
            ctx[f"alpha_{key}"],
            rF,
            rW,
            a_mode,
            cyc=cyc_args(ctx, key),
            part=part_args(ctx, key),
        )
        out[key] = (F, W)
    return out


def _fused_sharded(sh, acc, v, dm, lf, axis, bx0, bx1, si, interpret=False):
    """shard_map wrapper for the fused direction kernel under spatial sharding.
    Returns None unless the direction is orthogonal to every cut, all cut axes
    shard evenly, and the PER-SHARD local shape passes the kernel gates."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .pallas_fused import fused_fits, fused_schur_dir

    mesh, amap = sh
    ax = axis % v.ndim
    if (ax - (v.ndim - 3)) in amap:
        return None  # solve axis is cut: no local line solve possible
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    lshape = list(v.shape)
    for ga, nm in amap.items():
        d = v.ndim - 3 + ga
        if lshape[d] % sizes[nm] != 0:
            return None
        lshape[d] //= sizes[nm]
    if not fused_fits(tuple(lshape), v.dtype, axis, interpret):
        return None

    def spec_for(a):
        s = [None] * a.ndim
        for ga, nm in amap.items():
            s[a.ndim - 3 + ga] = nm
        return P(*s)

    def body(o, vv, d_, l_):
        r = fused_schur_dir(o, vv, d_, l_, axis, bx0, bx1, si,
                            interpret=interpret)
        assert r is not None  # guaranteed by the fused_fits pre-check
        return r

    return shard_map(
        body, mesh=mesh,
        in_specs=tuple(spec_for(a) for a in (acc, v, dm, lf)),
        out_specs=spec_for(acc),
        # pallas_call's ShapeDtypeStruct outputs carry no vma annotation
        check_vma=False,
    )(acc, v, dm, lf)


def _fused_sharded_ho(sh, fes, di, acc, v, ctx, tables, interpret=False):
    """shard_map wrapper for the HIGHER-ORDER fused direction kernel under
    spatial sharding (the k >= 1 sibling of _fused_sharded).  Engages when the
    solve axis is orthogonal to every cut, all cut axes shard evenly, the
    PER-SHARD local shape passes the kernel gates (ho_fits), and the staged
    operands slice cleanly along the cut:

    - z direction: natural (solve-axis-leading) operands — any y/x cut;
    - y direction: the hoyT solve-axis-major staged operands (ny+1, nz, nx) —
      any z/x cut;
    - x direction: the hoxT lane-packed operands (rows, nz*wy) merge nz with
      the PADDED ny, so only a pure z cut slices into per-shard blocks
      (the merged axis is nz-major); any y cut declines.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .pallas_fused_ho import fused_ho_dir, ho_fits

    if tables is None:
        return None
    mesh, amap = sh
    if di.axis in amap:
        return None  # solve axis is cut: no local line solve possible
    key = f"d{di.d}"
    # Batched layouts (sweep="jacobi" passes the un-group-sliced (ng, P, ...)
    # flux and 4D per-group ctx operands) decline exactly like fused_ho_dir
    # does; without this the z-branch broadcast_to / the 3D specs crash at
    # trace time instead of falling back to the unfused condensed chain.
    if v.ndim < 4 or any(s != 1 for s in v.shape[:-4]):
        return None
    if jnp.ndim(ctx[f"tri_dinvm_{key}"]) > 3:
        return None  # un-sliced per-group operands: same decline
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    lspat = list(v.shape[-3:])
    for ga, nm in amap.items():
        if lspat[ga] % sizes[nm] != 0:
            return None
        lspat[ga] //= sizes[nm]
    if not ho_fits(di.axis, tuple(lspat), v.dtype, fes.m + 1, interpret):
        return None

    nz, ny, nx = v.shape[-3:]
    spec_op = [None, None, None]
    if di.axis == 0:  # natural operand dims are (z, y, x)
        ops = (jnp.broadcast_to(ctx[f"tri_dinvm_{key}"], (nz + 1, ny, nx)),
               jnp.broadcast_to(ctx[f"tri_l_{key}"], (nz, ny, nx)),
               jnp.broadcast_to(ctx[f"alpha_{key}"], (nz, ny, nx)))
        for ga, nm in amap.items():
            spec_op[ga] = nm
    elif di.axis == 1:  # staged operand dims are (y, z, x)
        if f"tri_hoyT_dinvm_{key}" not in ctx:
            return None
        ops = (ctx[f"tri_hoyT_dinvm_{key}"],
               ctx[f"tri_hoyT_l_{key}"], ctx[f"tri_hoyT_alpha_{key}"])
        for ga, nm in amap.items():
            spec_op[{0: 1, 2: 2}[ga]] = nm
    else:  # x: lane-packed 2D staged operands, pure z cut only
        if f"tri_hoxT_dinvm_{key}" not in ctx or set(amap) != {0}:
            return None
        ops = (ctx[f"tri_hoxT_dinvm_{key}"],
               ctx[f"tri_hoxT_l_{key}"], ctx[f"tri_hoxT_alpha_{key}"])
        spec_op = [None, amap[0]]
    spec_op = P(*spec_op)
    spec_v = [None] * v.ndim
    for ga, nm in amap.items():
        spec_v[v.ndim - 3 + ga] = nm
    spec_v = P(*spec_v)

    def body(o, vv, d_, l_, a_):
        r = fused_ho_dir(fes, di, o, vv, d_, l_, a_, tables,
                         interpret=interpret)
        assert r is not None  # guaranteed by the ho_fits pre-check
        return r

    return shard_map(
        body, mesh=mesh,
        in_specs=(spec_v, spec_v, spec_op, spec_op, spec_op),
        out_specs=spec_v,
        # pallas_call's ShapeDtypeStruct outputs carry no vma annotation
        check_vma=False,
    )(acc, v, *ops)


def eqfold_available(fes: FESpace, ctx: Dict, shape, dtype, a_mode: str,
                     interpret: bool = False) -> bool:
    """True iff equilibrated_schur_matvec will take the fully folded kernel
    chain for per-group flux arrays of this shape/dtype.  All gates are static
    (shapes, ctx keys, env), so the decision is stable across a jit trace."""
    import os

    if a_mode != "exact" or fes.et.k != 0 or fes.m != 0 or len(fes.dirs) != 3:
        return False
    # Default OFF: both fold strategies measured SLOWER than the classic
    # wrapper on the real chip (IAEA-3D 988k, same-process alternating A/B:
    # mode 1 = 7.04, mode 2 = 7.04 vs classic 6.74-6.81 ms/outer median).
    # XLA already fuses the pre/post scalings into adjacent elementwise chains,
    # so the fold's extra y/sdi operand reads are a net bandwidth LOSS.  Kept
    # opt-in + tested for the record, like krylov.pcg_fused.
    mode = os.environ.get("NEUTFEM_EQFOLD", "0")
    if mode not in ("1", "2"):
        return False
    if os.environ.get("NEUTFEM_PALLAS", "1") == "0":
        return False
    if "precond_eq_sdi" not in ctx or "tri_xT_dinvm_d0" not in ctx \
            or "tri_yT_dinvm_d1" not in ctx or "tri_dinvm_d2" not in ctx:
        return False
    nz_, ny_, _ = fes.mesh.shape
    if ctx["tri_xT_dinvm_d0"].shape[-1] != nz_ * ny_:
        # staged x operands are row-padded (the tb == 128 ragged-block fault
        # guard); the eq kernels assume the unpadded layout — decline
        return False
    if any(f"cyc_wt_d{di.d}" in ctx for di in fes.dirs):
        return False  # periodic directions use the Sherman-Morrison path
    from ..shardctx import current_sharding

    if current_sharding() is not None:
        return False
    if not interpret:
        from .pallas_tridiag import pallas_available

        if not pallas_available():
            return False
    from .pallas_fused import eqfold_fits

    return eqfold_fits(shape, dtype, interpret, mode=mode)


def equilibrated_schur_matvec(fes: FESpace, ctx: Dict, y, a_mode: str,
                              interpret: bool = False):
    """sdi * S(sdi * y) with sdi = diag(S)^-1/2, the symmetrically equilibrated
    Schur matvec of group_solve, fully folded into the three direction kernels:

    * x kernel folds the pre-scale u = sdi*y and the C*sdi^2 term (and emits u
      for the later directions),
    * y kernel is the pre-staged kernel on u,
    * z kernel folds the final post-scale sdi*(...).

    21 HBM passes instead of the classic wrapper's 27 (the separate pre-scale,
    C-product and post-scale are 3 passes each; the fold costs 3 extra operand
    reads).  Two kernel-level strategies, selected by NEUTFEM_EQFOLD:

    * "1": the x kernel materializes u = sdi*y as a second output for the y/z
      kernels (dual output; the x kernel loses its input/output alias);
    * "2": every kernel recomputes u = sdi*y in VMEM from the y/sdi
      operands — u never touches HBM, single outputs, aliases kept.

    ADJUDICATED AGAINST (round 3, real chip, IAEA-3D 988k, alternating A/B):
    both modes run 7.04 ms/outer median vs 6.74-6.81 for the classic wrapper —
    XLA fuses the wrapper's pre/post scalings into adjacent elementwise chains,
    so they were never standalone passes, and the fold's extra per-kernel y/sdi
    reads are pure added HBM traffic.  Opt-in via NEUTFEM_EQFOLD for the
    record; default stays the classic wrapper (see eqfold_available).

    Caller must have checked eqfold_available; returns the matvec result."""
    import os

    from .pallas_fused import (
        fused_schur_x_eq,
        fused_schur_x_eq2,
        fused_schur_y_eq2,
        fused_schur_y_pre,
        fused_schur_z_eq,
        fused_schur_z_eq2,
    )

    dis = {di.d: di for di in fes.dirs}
    sdi = ctx["precond_eq_sdi"]
    ce = ctx["precond_eq_csdi"]
    bx = lambda d, i: float(dis[d].BX[i, 0, 0])
    sinv = lambda d: 1.0 / float(dis[d].m_t[0])
    dm_z = jnp.expand_dims(ctx["tri_dinvm_d2"], -4)
    l_z = jnp.expand_dims(ctx["tri_l_d2"], -4)
    mode = os.environ.get("NEUTFEM_EQFOLD", "2")
    if mode == "2":
        acc = fused_schur_x_eq2(
            y, sdi, ce, ctx["tri_xT_dinvm_d0"],
            ctx["tri_xT_l_d0"], bx(0, 0), bx(0, 1), sinv(0), interpret=interpret)
        assert acc is not None, "eqfold x kernel declined after eqfold_available"
        acc = fused_schur_y_eq2(
            acc, y, sdi, ctx["tri_yT_dinvm_d1"],
            ctx["tri_yT_l_d1"], bx(1, 0), bx(1, 1), sinv(1), interpret=interpret)
        assert acc is not None, "eqfold y kernel declined after eqfold_available"
        out = fused_schur_z_eq2(
            acc, y, sdi, dm_z, l_z,
            bx(2, 0), bx(2, 1), sinv(2), interpret=interpret)
        assert out is not None, "eqfold z kernel declined after eqfold_available"
        return out

    acc_u = fused_schur_x_eq(
        y, sdi, ce,
        ctx["tri_xT_dinvm_d0"], ctx["tri_xT_l_d0"],
        bx(0, 0), bx(0, 1), sinv(0), interpret=interpret,
    )
    assert acc_u is not None, "eqfold x kernel declined after eqfold_available"
    acc, u = acc_u
    acc = fused_schur_y_pre(
        acc, u, ctx["tri_yT_dinvm_d1"],
        ctx["tri_yT_l_d1"], bx(1, 0), bx(1, 1), sinv(1), interpret=interpret,
    )
    assert acc is not None, "eqfold y kernel declined after eqfold_available"
    out = fused_schur_z_eq(
        acc, u, dm_z, l_z, sdi,
        bx(2, 0), bx(2, 1), sinv(2), interpret=interpret,
    )
    assert out is not None, "eqfold z kernel declined after eqfold_available"
    return out


def schur_matvec(fes: FESpace, ctx: Dict, v, a_mode: str, fused: bool = True):
    """S v = C v + sum_d B_d A_d^{-1} B_d^T v   (matrix-free Schur complement).

    Mirrors the reference's implicit SchurProduct (solvers.cpp:535-547) but with an
    exact, batched A-solve instead of a global LU backsolve.
    `v` (internal layout) and the ctx arrays must agree in leading batch dims
    (all groups or one group).

    On the RT0-P0 exact path each direction goes through ONE fused Pallas kernel
    (B^T + Thomas + B in VMEM, ops/pallas_fused.py) when a kernel fits; the
    composable unfused ops below are the fallback (CPU, f64, sharding, periodic,
    higher order).  ``fused=False`` forces the unfused ops — used when the matvec
    runs under an outer vmap (ops/direct.dense_schur_group), where the aliased
    pallas_call's batching behavior is not exercised by the CPU suite.
    """
    import os

    out = ctx["C"] * v
    # NEUTFEM_PALLAS_INTERPRET=1 routes the fused dispatch through interpret-mode
    # pallas_call on CPU: the multichip dryrun + CPU tests can then exercise the
    # REAL kernel shard_map paths (incl. _fused_sharded_ho's lane-packed x
    # operands) end-to-end, not just the unfused fallback (round-3 VERDICT Next #4).
    interp = os.environ.get("NEUTFEM_PALLAS_INTERPRET", "0") == "1"
    use_fused = (
        fused
        and a_mode == "exact"
        and fes.et.k == 0
        and fes.m == 0
        and os.environ.get("NEUTFEM_PALLAS", "1") != "0"
    )
    sh = None
    if use_fused:
        from ..shardctx import current_sharding
        from .pallas_tridiag import pallas_available

        use_fused = pallas_available() or interp
        sh = current_sharding()
    # Higher-order (k >= 1) condensed path: the bubble algebra of
    # apply_BT/solve_A/apply_B folds EXACTLY into the constants
    # DirectionInfo.BXc / Qbub (see fespace.py), so each direction costs one
    # face-rhs einsum pair, one masked tridiag solve, one face-out einsum pair
    # and one P x P block product — no bubble intermediates in HBM.  The
    # round-3 RT1 trace showed 68% of device time in the unfused chain's
    # elementwise/stencil fusions; this halves its HBM passes.
    use_condensed = (
        fes.et.nbub > 0 and os.environ.get("NEUTFEM_CONDENSED", "1") != "0"
    )
    use_ho_kernel = (
        use_condensed
        and fused
        and a_mode == "exact"
        and os.environ.get("NEUTFEM_PALLAS", "1") != "0"
    )
    sh_ho = None
    if use_ho_kernel:
        from ..shardctx import current_sharding
        from .pallas_tridiag import pallas_available

        use_ho_kernel = pallas_available() or interp
        sh_ho = current_sharding()
    for di in fes.dirs:
        key = f"d{di.d}"
        if use_condensed:
            if (use_ho_kernel and f"cyc_wt_{key}" not in ctx
                    and f"tri_dinvm_{key}" in ctx):
                from .pallas_fused_ho import fused_ho_dir, ho_coeff_tables

                if sh_ho is not None:
                    # direction orthogonal to every mesh cut: per-shard fused
                    # HO kernel on complete local lines (shard_map); cut
                    # directions (and declines) take the unfused condensed
                    # chain below
                    res = _fused_sharded_ho(sh_ho, fes, di, out, v, ctx,
                                            ho_coeff_tables(fes, di),
                                            interpret=interp)
                else:
                    if di.axis == 1 and f"tri_hoyT_dinvm_{key}" in ctx:
                        ops = (ctx[f"tri_hoyT_dinvm_{key}"],
                               ctx[f"tri_hoyT_l_{key}"],
                               ctx[f"tri_hoyT_alpha_{key}"])
                    elif di.axis == 2 and f"tri_hoxT_dinvm_{key}" in ctx:
                        ops = (ctx[f"tri_hoxT_dinvm_{key}"],
                               ctx[f"tri_hoxT_l_{key}"],
                               ctx[f"tri_hoxT_alpha_{key}"])
                    else:
                        ops = (ctx[f"tri_dinvm_{key}"],
                               ctx[f"tri_l_{key}"], ctx[f"alpha_{key}"])
                    res = fused_ho_dir(fes, di, out, v, *ops,
                                       ho_coeff_tables(fes, di),
                                       interpret=interp)
                if res is not None:
                    out = res
                    continue
            res = _maybe_partitioned_dir(fes, di, v, ctx, key, a_mode, di.BXc)
            if res is not None:
                out = out + res
            else:
                BXc = jnp.asarray(di.BXc, dtype=v.dtype)
                rF = _face_rhs(di, v, BXc)
                F, _ = solve_A_dir(
                    fes, di,
                    ctx_face(ctx, f"tri_dinv_{key}", di.axis),
                    ctx.get(f"tri_l_{key}"),
                    ctx_face(ctx, f"mask_{key}", di.axis),
                    ctx[f"alpha_{key}"],
                    rF, None, a_mode,
                    cyc=cyc_args(ctx, key),
                    part=part_args(ctx, key),
                )
                out = out + _face_out(di, F, BXc)
            alpha_e = jnp.expand_dims(ctx[f"alpha_{key}"], -4)
            Q = jnp.asarray(di.Qbub, dtype=v.dtype)
            if fes.P == 1:
                out = out + v * (Q[0, 0] / alpha_e)
            else:
                out = out + jnp.einsum("...qzyx,pq->...pzyx", v, Q) / alpha_e
            continue
        if use_fused and f"cyc_wt_{key}" not in ctx and f"tri_dinvm_{key}" in ctx:
            from .pallas_fused import (
                fused_schur_dir,
                fused_schur_x_pre,
                fused_schur_y_pre,
            )

            bx0 = float(di.BX[0, 0, 0])
            bx1 = float(di.BX[1, 0, 0])
            si = 1.0 / float(di.m_t[0])  # static rhs scale (mask folded into
            # dm/l at build — see the pallas_fused module docstring)
            prestaged = os.environ.get("NEUTFEM_PRESTAGED", "1") != "0"
            if prestaged and sh is None and f"tri_xT_dinvm_{key}" in ctx:
                # x direction with pre-transposed solve-constant operands: the
                # kernel only transposes v/out (declines to the broadcast kernel
                # for batched group layouts or small meshes)
                res = fused_schur_x_pre(
                    out, v,
                    ctx[f"tri_xT_dinvm_{key}"], ctx[f"tri_xT_l_{key}"],
                    bx0, bx1, si, interpret=interp,
                )
                if res is not None:
                    out = res
                    continue
            if prestaged and sh is None and f"tri_yT_dinvm_{key}" in ctx:
                # y direction with solve-axis-major staged operands
                res = fused_schur_y_pre(
                    out, v,
                    ctx[f"tri_yT_dinvm_{key}"], ctx[f"tri_yT_l_{key}"],
                    bx0, bx1, si, interpret=interp,
                )
                if res is not None:
                    out = res
                    continue
            dm = jnp.expand_dims(ctx[f"tri_dinvm_{key}"], -4)
            lf = jnp.expand_dims(ctx[f"tri_l_{key}"], -4)
            if sh is None:
                res = fused_schur_dir(
                    out, v, dm, lf, di.axis - 3,
                    bx0, bx1, si, interpret=interp,
                )
            else:
                # direction orthogonal to every mesh cut: per-shard fused kernel
                # on complete local lines (shard_map); cut directions take the
                # partitionable unfused path below
                res = _fused_sharded(
                    sh, out, v, dm, lf, di.axis - 3,
                    bx0, bx1, si, interpret=interp,
                )
            if res is not None:
                out = res
                continue
        if fes.et.nbub == 0:
            res = _maybe_partitioned_dir(fes, di, v, ctx, key, a_mode,
                                         di.BX[:2])
            if res is not None:
                out = out + res
                continue
        rF, rW = apply_BT_dir(fes, di, v)
        F, W = solve_A_dir(
            fes,
            di,
            ctx_face(ctx, f"tri_dinv_{key}", di.axis),
            ctx.get(f"tri_l_{key}"),
            ctx_face(ctx, f"mask_{key}", di.axis),
            ctx[f"alpha_{key}"],
            rF,
            rW,
            a_mode,
            cyc=cyc_args(ctx, key),
            part=part_args(ctx, key),
        )
        out = out + apply_B_dir(fes, di, F, W)
    return out


def weighted_mass(fes: FESpace, coeff, detJ, w_mode_col, phi):
    """(coeff-weighted mass) @ phi — diagonal in the tensor-Legendre basis.

    coeff: (..., nz, ny, nx) per-element coefficient (e.g. nu-Sigma_f);
    w_mode_col: (P, 1, 1, 1) per-mode mass weight; phi internal (..., P, sp).
    Returns the exact weighted mass product (reference AssembleWeightedMassMatrix /
    AssembleFissionMatrix, NeutFEM.cpp:1204-1252).
    """
    return jnp.expand_dims(coeff * detJ, -4) * (w_mode_col * phi)

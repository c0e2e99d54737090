"""Partitioned (substructured) tridiagonal solve for the CUT direction under
spatial sharding.

Round-5 motivation (SHARDING_r05.json): the cut-axis A-solve previously ran as
a GSPMD-partitioned ``associative_scan``, whose log-stride cross-shard steps
move ~8x a flux array of collective-permute traffic PER CG ITERATION (z8 cut
at 3.5M cells: 118.7 MB/inner vs the 14.05 MB flux array) — projected ICI time
alone exceeded the whole single-chip solve.  This module replaces it with the
classic partition method (Wang-style substructuring), TPU-shaped:

* Each device owns a contiguous SEGMENT of every mesh line along the cut axis
  and runs the existing Pallas Thomas kernel on its local block — the cut
  direction gets the fast kernel back (it used to be scan-only even locally).
* The removed inter-segment couplings form a rank-2p Woodbury correction
      T = T_hat + U V^T,   x = y - T_hat^{-1} U M^{-1} V^T y,   y = T_hat^{-1} d
  whose ingredients are SOLVE-CONSTANT: the per-segment LDL^T factors, the
  coupling-scaled unit-load solutions T_hat^{-1} e_first / e_last, and the
  inverse of the (2p x 2p per line) interface matrix M = I + V^T T_hat^{-1} U
  are all precomputed ON HOST at ``parallel.shard_context`` time
  (``build_partitioned``) and shipped as context arrays.
* Per application the ONLY communication is one ``all_gather`` of each
  segment's first/last solution planes (2 planes per device, ~20-60x fewer
  bytes than the scan path); the tiny interface solve is computed redundantly
  on every device (replicated-compute beats a second collective).

Face grids have n+1 entries for n cells: the body (faces 0..n-1, evenly
sharded) carries p segments and the replicated seam face n is treated as a
(p+1)-th segment of size 1, so the interface count is p and M is 2p x 2p.

Scope: a_mode="exact", non-PERIODIC directions; on a 2D device mesh each cut
direction partitions over ITS mesh axis (the other cut axis threads through
every spec as a pure batch dim) — the scan path remains the fallback only for
directions whose axis does not divide.  Pinned (MIRROR/Dirichlet-masked)
faces need no special casing: the context factors them with diag 1 / coupling
0, so reconstruction of (a, b) from the global (dinv, l) is exact and a pinned
shard boundary simply yields an inert interface row in M.

Reference lineage: the reference ships a dead serial ThomasSolver
(/root/reference/src/solvers.cpp:940-989) and no parallelism at all (SURVEY
§2.6); this is the TPU-native distributed answer.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["build_partitioned", "tridiag_solve_partitioned",
           "partitioned_schur_dir", "PART_NAMES"]

PART_NAMES = ("dinv", "l", "vrs", "vls", "minv", "seamd", "seamc")


def _segments_solve(rb, rs, dvl, lvl, vrl, vll, sdl, scl, mvl,
                    axis, axis_name, p, s):
    """Shard-local core of the partition method (called INSIDE a shard_map).

    rb: this shard's body segment rhs (s faces along ``axis``); rs: the
    replicated seam face rhs; constants are the shard-local blocks from
    ``build_partitioned``.  Returns (x_body_local, x_seam_replicated).
    Communication: two all_gathers of one plane per device (the segment
    first/last solutions feeding the 2p x 2p interface solve, computed
    redundantly everywhere)."""
    import jax.numpy as jnp
    from jax import lax

    from .tridiag import _local_solve

    k = lax.axis_index(axis_name)
    dv_b = jnp.broadcast_to(dvl, rb.shape)
    lv_b = jnp.broadcast_to(lvl, rb.shape)
    l_b = lax.slice_in_dim(lv_b, 0, s - 1, axis=axis)
    y = _local_solve(rb, dv_b, l_b, axis)
    y_n = rs * sdl                                   # replicated seam solve

    yf = lax.index_in_dim(y, 0, axis=axis, keepdims=False)
    yl = lax.index_in_dim(y, s - 1, axis=axis, keepdims=False)
    g_f = lax.all_gather(yf, axis_name)              # (p, ...)
    g_l = lax.all_gather(yl, axis_name)
    y_n_sq = lax.index_in_dim(y_n, 0, axis=axis, keepdims=False)

    rows = []
    for i in range(p):
        rows.append(g_f[i + 1] if i < p - 1 else y_n_sq)   # V^T y row 2i
        rows.append(g_l[i])                                # row 2i+1
    vty = jnp.stack(rows, axis=0)                    # (2p, ..., ly, lx)

    # alpha_j = sum_i minv[..., j, i] * vty_i ; minv line dims are the
    # trailing spatial dims of the axis-removed arrays
    alpha = jnp.einsum("...ji,i...->j...", mvl, vty)

    a_r = lax.dynamic_index_in_dim(alpha, 2 * k, 0, keepdims=False)
    a_l = lax.dynamic_index_in_dim(alpha, jnp.maximum(2 * k - 1, 0), 0,
                                   keepdims=False)
    x = (y - jnp.expand_dims(a_r, axis) * jnp.broadcast_to(vrl, y.shape)
         - jnp.expand_dims(a_l, axis) * jnp.broadcast_to(vll, y.shape))
    x_seam = y_n - jnp.expand_dims(alpha[2 * p - 1], axis) * scl
    return x, x_seam


def _ldlt_np(a: np.ndarray, b: np.ndarray):
    """Batched LDL^T of SPD tridiagonals along the LAST axis (host, tiny s)."""
    d = [a[..., 0]]
    ls = []
    for i in range(b.shape[-1]):
        li = b[..., i] / d[-1]
        ls.append(li)
        d.append(a[..., i + 1] - b[..., i] * li)
    dinv = 1.0 / np.stack(d, axis=-1)
    l = (np.stack(ls, axis=-1) if ls
         else np.zeros(a.shape[:-1] + (0,), a.dtype))
    return dinv, l


def _solve_np(dinv: np.ndarray, l: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Batched LDL^T solve along the LAST axis (host)."""
    s = r.shape[-1]
    z = [r[..., 0]]
    for i in range(1, s):
        z.append(r[..., i] - l[..., i - 1] * z[-1])
    w = [zi * dinv[..., i] for i, zi in enumerate(z)]
    x = [None] * s
    x[-1] = w[-1]
    for i in range(s - 2, -1, -1):
        x[i] = w[i] - l[..., i] * x[i + 1]
    return np.stack(x, axis=-1)


def build_partitioned(dinv, l, fax: int, p: int) -> Optional[Dict[str, np.ndarray]]:
    """Host-side constants for the partitioned solve of one direction.

    dinv, l: the GLOBAL LDL^T factors from the context (any leading batch dims;
    the face axis is ``fax``), m = n+1 faces with the body n divisible by p.
    Returns {name: array} with the face axis back at ``fax`` for body-shaped
    arrays, or None when the direction does not partition (n % p != 0, or
    fewer than 2 faces per segment).
    """
    dinv = np.asarray(dinv, np.float64)
    l = np.asarray(l, np.float64)
    m = dinv.shape[fax]
    n = m - 1
    if n % p or n // p < 2:
        return None
    s = n // p

    dv = np.moveaxis(dinv, fax, -1)  # (..., m)
    lv = np.moveaxis(l, fax, -1)     # (..., n)

    # reconstruct the original tridiagonal (a, b) — exact: pinned faces are
    # factored with diag 1 / coupling 0 in the context, so no zero pivots
    d = 1.0 / dv
    b = lv * d[..., :-1]
    a = d.copy()
    a[..., 1:] += b * lv

    batch = a.shape[:-1]
    a_seg = a[..., :n].reshape(*batch, p, s)
    b_all = b.reshape(*batch, p, s)          # last entry of each row = interface
    b_int = b_all[..., : s - 1]              # internal couplings
    b_ifc = b_all[..., s - 1]                # (..., p) right-interface coupling

    dinv_loc, l_loc = _ldlt_np(a_seg, b_int)             # (..., p, s) / (..., p, s-1)

    eye0 = np.zeros(a_seg.shape, a.dtype)
    eye0[..., 0] = 1.0
    eyeL = np.zeros(a_seg.shape, a.dtype)
    eyeL[..., -1] = 1.0
    vL = _solve_np(dinv_loc, l_loc, eye0)                # T_k^-1 e_first
    vR = _solve_np(dinv_loc, l_loc, eyeL)                # T_k^-1 e_last

    # coupling-scaled correction vectors (zero left coupling for segment 0)
    vrs = b_ifc[..., None] * vR
    b_left = np.concatenate(
        [np.zeros_like(b_ifc[..., :1]), b_ifc[..., :-1]], axis=-1)
    vls = b_left[..., None] * vL

    a_seam = a[..., n]
    seamd = 1.0 / a_seam                                  # (...,)
    seamc = b[..., n - 1] * seamd                         # b_{n-1} / a_n

    # interface matrix M = I + V^T T_hat^{-1} U  (2p x 2p per line)
    M = np.zeros(batch + (2 * p, 2 * p), a.dtype)
    idx = np.arange(2 * p)
    M[..., idx, idx] = 1.0
    for i in range(p):
        # column 2i: support segment i, vector vrs[..., i, :]
        M[..., 2 * i + 1, 2 * i] += vrs[..., i, s - 1]
        if i >= 1:
            M[..., 2 * (i - 1), 2 * i] += vrs[..., i, 0]
        # column 2i+1: support segment i+1 (or the seam for i = p-1)
        if i < p - 1:
            w0 = vls[..., i + 1, 0]
            wl = vls[..., i + 1, s - 1]
            M[..., 2 * i, 2 * i + 1] += w0
            M[..., 2 * (i + 1) + 1, 2 * i + 1] += wl
        else:
            M[..., 2 * (p - 1), 2 * (p - 1) + 1] += seamc
    minv = np.linalg.inv(M)

    def back(x):  # (..., p, s) -> body layout with face axis at fax
        return np.moveaxis(x.reshape(*batch, n), -1, fax)

    l_pad = np.concatenate(
        [l_loc, np.zeros(batch + (p, 1), a.dtype)], axis=-1)  # dummy 0 per segment

    return {
        "dinv": back(dinv_loc),
        "l": back(l_pad),
        "vrs": back(vrs),
        "vls": back(vls),
        "minv": minv,                  # (batch_without_fax..., 2p, 2p)
        "seamd": np.expand_dims(seamd, fax),
        "seamc": np.expand_dims(seamc, fax),
    }


def tridiag_solve_partitioned(rhs, part: Dict, axis: int, mesh, axis_name: str,
                              other: Optional[Dict[int, str]] = None):
    """Solve T x = rhs along ``axis`` (n+1 faces) with the partitioned
    constants from ``build_partitioned``, under a device mesh whose
    ``axis_name`` axis cuts ``axis``.  rhs may carry leading batch/mode axes;
    part arrays broadcast.  ``other`` maps additional rhs dims to the mesh
    axes that shard them (2D device meshes, round 5): those axes are pure
    batch dims for this solve — every spec places their names so the
    shard_map neither gathers nor resharding-copies along them.

    Layout contract (the round-5 reshard fix): the m = n+1 face array enters
    and leaves in GSPMD's canonical CEIL sharding (sw = ceil(m/p) faces per
    shard), while the partition-method segmentation is body-even (sb = n/p
    cells per shard) + one replicated seam face.  The first implementation
    did the ceil<->even conversion with jnp-level slice/concat OUTSIDE the
    shard_map and GSPMD lowered it as a FULL all-gather of the solution per
    application (+ an equivalent resharding of the rhs) — 6 all-gathers,
    ~31 of 38.4 MB/inner at 3.5M z8, the dominant depth-2 term of the first
    SHARDING_r05 accounting; a with_sharding_constraint on the concat does
    not help (GSPMD still implements the unaligned reshard as all-gather +
    dynamic-slice).  Both conversions are therefore done INSIDE the
    shard_map with bounded ppermute block-hops: each shard receives whole
    local blocks from <= dmax neighbors (dmax = ceil((p-1)/sw) on entry,
    analogous on exit — 1 hop at the benchmark scales), then takes a
    dynamic slice at its statically-bounded offset.  Wire cost per hop is
    one LOCAL block per link (~1/p of the array), vs the full array per
    all-gather.  Entry pad m -> p*sw and exit slice back to m are
    boundary-aligned with the ceil sharding (identical shard windows), so
    GSPMD lowers them collective-free.
    """
    import jax.numpy as jnp
    from jax import lax, shard_map
    from jax.sharding import PartitionSpec as P

    axis = axis % rhs.ndim
    m = rhs.shape[axis]
    n = m - 1
    p = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    s = n // p

    sw = -(-m // p)                      # ceil faces/shard (= s + 1: m = p*s+1)
    m_pad = p * sw
    # static realignment geometry (python ints; k-dependent offsets are traced)
    dmax_in = max(k - (s * k) // sw for k in range(p))
    need_w = max(min(sw * k + sw, n) - s * k
                 for k in range(p) if sw * k < n)
    dmax_out = max(0, -(-need_w // s) - 1)
    j_seam, loc_seam = divmod(n, sw)

    pad_cfg = [(0, 0)] * rhs.ndim
    pad_cfg[axis] = (0, m_pad - m)
    rhs_pad = jnp.pad(rhs, pad_cfg)

    def pad_before(x, extra, keep_last):
        """Insert `extra` unit axes before the last `keep_last` dims — aligns
        the T/mode axes of rhs (which sit just before the spatial dims)."""
        sh_ = x.shape
        return x.reshape(sh_[: len(sh_) - keep_last] + (1,) * extra
                         + sh_[len(sh_) - keep_last:])

    # align part arrays against rhs rank (they lack the T/mode axes, which
    # sit immediately before the trailing 3 spatial dims)
    dv = jnp.asarray(part["dinv"], rhs.dtype)
    lv = jnp.asarray(part["l"], rhs.dtype)
    vrs = jnp.asarray(part["vrs"], rhs.dtype)
    vls = jnp.asarray(part["vls"], rhs.dtype)
    sd = jnp.asarray(part["seamd"], rhs.dtype)
    sc = jnp.asarray(part["seamc"], rhs.dtype)
    minv = jnp.asarray(part["minv"], rhs.dtype)
    extra = rhs.ndim - dv.ndim
    dv, lv, vrs, vls, sd, sc = (pad_before(x, extra, 3)
                                for x in (dv, lv, vrs, vls, sd, sc))
    # minv: (batch..., l1, l2, 2p, 2p) — pad before its last 4 dims
    minv = pad_before(minv, (rhs.ndim + 1) - minv.ndim, 4)

    other = other or {}
    names = [other.get(d) for d in range(rhs.ndim)]
    spec_rep = P(*names)                 # replicated over the CUT axis only
    names[axis] = axis_name
    spec_cut = P(*names)
    # minv line dims (ndim-4, ndim-3) are the rhs spatial dims with the cut
    # axis removed, in order; place the other-axis names there
    mnames = [None] * minv.ndim
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    lines = [d for d in range(rhs.ndim - 3, rhs.ndim) if d != axis]
    for i, d in enumerate(lines):
        nm = other.get(d)
        md = minv.ndim - 4 + i
        if nm is not None and minv.shape[md] % sizes[nm] == 0:
            mnames[md] = nm
    spec_minv = P(*mnames)

    def local(rl, dvl, lvl, vrl, vll, sdl, scl, mvl):
        k = lax.axis_index(axis_name)

        # ceil -> body-even: bounded leftward block hops, then dynamic slice.
        # Shards k < d receive zeros from the partial permute; the slice
        # offset sw*dmax_in - k*(sw-s) never reaches those rows.
        blocks = [lax.ppermute(rl, axis_name, [(j, j + d) for j in range(p - d)])
                  for d in range(dmax_in, 0, -1)]
        blocks.append(rl)
        win = jnp.concatenate(blocks, axis=axis) if len(blocks) > 1 else rl
        off_in = sw * dmax_in + (s - sw) * k
        rb = lax.dynamic_slice_in_dim(win, off_in, s, axis=axis)

        # replicated seam face (global row n, shard j_seam local row loc_seam)
        cand = lax.index_in_dim(rl, loc_seam, axis=axis, keepdims=False)
        rs = jnp.expand_dims(lax.all_gather(cand, axis_name)[j_seam], axis)

        x, x_seam = _segments_solve(rb, rs, dvl, lvl, vrl, vll, sdl, scl,
                                    mvl, axis, axis_name, p, s)

        # body-even -> ceil: bounded rightward block hops + masked assembly.
        # A trailing zero row keeps the window >= sw rows for p = 1; rows at
        # global index n take the replicated seam solution, rows past n (pad)
        # are zeroed, and pure-pad shards' clamped garbage is fully masked.
        oblocks = [x]
        oblocks += [lax.ppermute(x, axis_name, [(j, j - d) for j in range(d, p)])
                    for d in range(1, dmax_out + 1)]
        oblocks.append(jnp.zeros_like(lax.slice_in_dim(x, 0, 1, axis=axis)))
        winx = jnp.concatenate(oblocks, axis=axis)
        xcb = lax.dynamic_slice_in_dim(winx, (sw - s) * k, sw, axis=axis)
        gsh = [1] * rl.ndim
        gsh[axis] = sw
        gidx = sw * k + jnp.arange(sw, dtype=jnp.int32).reshape(gsh)
        return jnp.where(gidx == n, jnp.broadcast_to(x_seam, xcb.shape),
                         jnp.where(gidx > n, jnp.zeros_like(xcb), xcb))

    out_pad = shard_map(
        local, mesh=mesh,
        in_specs=(spec_cut, spec_cut, spec_cut, spec_cut, spec_cut,
                  spec_rep, spec_rep, spec_minv),
        out_specs=spec_cut,
        check_vma=False,
    )(rhs_pad, dv, lv, vrs, vls, sd, sc, minv)
    return lax.slice_in_dim(out_pad, 0, m, axis=axis)


def partitioned_schur_dir(fes, di, v, ctx, key: str, mesh, axis_map, BXt):
    """Whole cut-direction Schur contribution B_d A_d^{-1} B_d^T v in ONE
    shard_map (round 5c) — face arrays NEVER materialize at the jnp level.

    The second round-5 ICI accounting showed the remaining z4y2 depth-2
    all-gathers come from the face-rhs BUILD (slice/concat of cell slices to
    an m = n+1 face array) and the divergence consume (face +/-1 shifts) —
    every uneven concat along a cut axis is a GSPMD reshard, independent of
    the solve.  Fusing build -> partitioned solve -> divergence per shard
    removes them all: per application the only communication is
      * 1 plane leftward (c1 halo for the segment's first face),
      * 1 plane rightward (next segment's first solution for the divergence),
      * the interface/seam gathers of `_segments_solve` (O(p) planes).

    Semantics pinned to the unfused chain (`_face_rhs` -> masked, m_t-scaled
    `solve_A_dir` -> mask -> `_face_out`); exactness is asserted against it in
    tests/test_parttri.py and end-to-end in tests/test_parallel.py.  BXt is a
    host-side (2+, P, T) pairing tensor (BXc for the condensed chain, BX[:2]
    for RT0).  Returns the flux-shaped contribution, or None to decline (no
    bundle / no split mask / indivisible axis).
    """
    import jax.numpy as jnp
    from jax import lax, shard_map
    from jax.sharding import PartitionSpec as P

    part = {nm: ctx.get(f"tri_part_{nm}_{key}") for nm in PART_NAMES}
    if any(val is None for val in part.values()):
        return None
    mb = ctx.get(f"mask_{key}")
    ms = ctx.get(f"mask_{key}__seam")
    if ms is None:
        return None

    ga = di.axis
    rank = v.ndim
    axis = rank - 3 + ga
    axis_name = axis_map[ga]
    other = {rank - 3 + g: nm for g, nm in axis_map.items() if g != ga}
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    p = sizes[axis_name]
    n = v.shape[axis]
    if n % p or n // p < 2:
        return None
    s = n // p

    BXt = np.asarray(BXt)                        # host constant (closure)
    scalar_pair = BXt.shape[1] == 1 and BXt.shape[2] == 1
    m_t = np.asarray(di.m_t).reshape(-1, 1, 1, 1)

    def pad_before(x, keep_last):
        sh_ = x.shape
        extra = rank - x.ndim
        return x.reshape(sh_[: len(sh_) - keep_last] + (1,) * extra
                         + sh_[len(sh_) - keep_last:])

    dv = pad_before(jnp.asarray(part["dinv"], v.dtype), 3)
    lv = pad_before(jnp.asarray(part["l"], v.dtype), 3)
    vrs = pad_before(jnp.asarray(part["vrs"], v.dtype), 3)
    vls = pad_before(jnp.asarray(part["vls"], v.dtype), 3)
    sd = pad_before(jnp.asarray(part["seamd"], v.dtype), 3)
    sc = pad_before(jnp.asarray(part["seamc"], v.dtype), 3)
    minv = jnp.asarray(part["minv"], v.dtype)
    minv = minv.reshape((1,) * (rank + 1 - minv.ndim) + minv.shape)
    mb_a = pad_before(jnp.asarray(mb, v.dtype), 3)
    ms_a = pad_before(jnp.asarray(ms, v.dtype), 3)

    names = [other.get(d) for d in range(rank)]
    spec_rep = P(*names)
    names_cut = list(names)
    names_cut[axis] = axis_name
    spec_cut = P(*names_cut)
    mnames = [None] * minv.ndim
    lines = [d for d in range(rank - 3, rank) if d != axis]
    for i, d in enumerate(lines):
        nm = other.get(d)
        md = minv.ndim - 4 + i
        if nm is not None and minv.shape[md] % sizes[nm] == 0:
            mnames[md] = nm
    spec_minv = P(*mnames)

    def local(vl, mbl, msl, dvl, lvl, vrl, vll, sdl, scl, mvl):
        w = jnp.asarray(BXt, vl.dtype)
        mt = jnp.asarray(m_t, vl.dtype)
        if scalar_pair:
            c0 = vl * w[0, 0, 0]
            c1 = vl * w[1, 0, 0]
        else:
            c0 = jnp.einsum("...pzyx,pt->...tzyx", vl, w[0])
            c1 = jnp.einsum("...pzyx,pt->...tzyx", vl, w[1])
        # face rhs for this segment: rb[j] = c0[j] + c1[j-1]; j = 0 takes the
        # left neighbor's last cell plane (zero-filled on shard 0 = the global
        # first face, which has no c1 term)
        prev = lax.ppermute(lax.slice_in_dim(c1, s - 1, s, axis=axis),
                            axis_name, [(j, j + 1) for j in range(p - 1)])
        c1sh = jnp.concatenate(
            [prev, lax.slice_in_dim(c1, 0, s - 1, axis=axis)], axis=axis)
        rb = c0 + c1sh
        # seam face rhs (global face n = c1 cell n-1): replicated
        rs = jnp.expand_dims(
            lax.all_gather(lax.index_in_dim(c1, s - 1, axis=axis,
                                            keepdims=False),
                           axis_name)[p - 1], axis)
        rb = rb * mbl / mt
        rs = rs * msl / mt
        x, x_seam = _segments_solve(rb, rs, dvl, lvl, vrl, vll, sdl, scl,
                                    mvl, axis, axis_name, p, s)
        x = x * mbl
        x_seam = x_seam * msl
        # divergence: out[i] = F_L[i] pair w0 + F_R[i] pair w1 with
        # F_R[j] = x[j+1]; the segment's last cell takes the next segment's
        # first solution plane (or the seam on the last shard)
        k = lax.axis_index(axis_name)
        nxt = lax.ppermute(lax.slice_in_dim(x, 0, 1, axis=axis),
                           axis_name, [(j, j - 1) for j in range(1, p)])
        xnext = jnp.where(k == p - 1, x_seam, nxt)
        F_R = jnp.concatenate(
            [lax.slice_in_dim(x, 1, s, axis=axis), xnext], axis=axis)
        if scalar_pair:
            return x * w[0, 0, 0] + F_R * w[1, 0, 0]
        return (jnp.einsum("...tzyx,pt->...pzyx", x, w[0])
                + jnp.einsum("...tzyx,pt->...pzyx", F_R, w[1]))

    return shard_map(
        local, mesh=mesh,
        in_specs=(spec_cut, spec_cut, spec_rep, spec_cut, spec_cut, spec_cut,
                  spec_cut, spec_rep, spec_rep, spec_minv),
        out_specs=spec_cut,
        check_vma=False,
    )(v, mb_a, ms_a, dv, lv, vrs, vls, sd, sc, minv)

"""Fused per-direction Schur kernels for the CONDENSED higher-order matvec.

The k >= 1 condensed path (ops/apply.py: BXc face pairing + Qbub block, see
fespace.DirectionInfo) still pays one HBM materialization per XLA op boundary:
face-rhs einsum -> concat -> scale -> Pallas Thomas -> mask -> face-out einsums
-> Q block product (~60 flux-plane passes per direction at RT1-P1).  These
kernels run the whole per-(direction, transverse-mode) chain in VMEM:

    rf_f   = sum_l bxs[1,l] v[l,f-1] + bxs[0,l] v[l,f]     (bxs = BXc/m_t rows)
    z_0    = rf_0;      z_f = rf_f - l_{f-1} z_{f-1}
    F_n    = z_n dm_n;  F_f = z_f dm_f - l_f F_{f+1}           [dm = dinv*mask]
    out[l,e] = acc[l,e] + bxo[0,l] F_e + bxo[1,l] F_{e+1}
               + (sum_l' q[l,l'] v[l',e]) / alpha_e

The rhs used to carry the mask as a streamed face plane (z_f = rf_f s_f).  It
is redundant (round 3, same proof as the RT0 kernels in pallas_fused.py): the
mask pins only boundary faces, and context.py zeroes the adjacent off-diagonal
BEFORE the LDL^T factorization whenever it pins a face, so a pinned face f has
l = 0 on its interior side and dm_f = 0 — every path a wrong z_f could
propagate through is multiplied by an exact 0 and the valid outputs are
BITWISE identical.  Dropping the plane removes one of four streamed face
blocks (traffic) and one double-buffered (n+1)-row block from the VMEM
footprint — which is what lets the y kernel ENGAGE at n = 152/144 (K1 = 2),
shapes the four-block kernel could not compile (see _VMEM_BUDGET_HO).  In the
x kernel's dead pad lanes z now carries garbage instead of 0; it stays
lanewise (the recurrence never crosses lanes), F in those lanes is still
z*0 - 0*F = 0-or-NaN, and the unpack slices only real lanes — nothing escapes.

per transverse mode t, where l runs over the K1 = m+1 longitudinal flux modes
mapped to t.  The (t, f, l) coefficient tables bxs/bxo and the (t, l, l') Qbub
blocks live in SMEM; the flux-mode axis is SPLIT by a free bitcast reshape of
the leading P axis so each grid instance streams exactly its K1 mode planes
(the flux transverse multi-index factors P = K1^3 per direction — see
_mode_split).

Scope: m == k (equal flux/current order — the benchmark configurations),
3D meshes, a_mode == "exact", f32/bf16 on real hardware, no PERIODIC on the
direction.  Under spatial sharding, directions orthogonal to every mesh cut
keep the kernel via apply._fused_sharded_ho (shard_map on complete local
lines; the x kernel needs a pure z cut — its lane-packed operands only slice
along z); cut directions and everything else decline to the condensed ops in
apply.py.

Reference counterpart: the same SchurProduct hot loop as ops/pallas_fused.py
(/root/reference/src/solvers.cpp:535-547), at higher discretization order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tridiag import _pad_up, _round_down

# The HO kernels hold K1 whole mode planes of the solve axis in VMEM, so the
# conservative 8 MiB budget of the RT0 kernels (pallas_tridiag._VMEM_BUDGET)
# underflows the minimum (8, 128) tile at moderate ny (the round-3 RT1 988k
# mesh has ny = 114 -> the y kernel silently declined).  VMEM is ~16 MiB/core;
# tell Mosaic explicitly via vmem_limit_bytes.
#
# Round-3 calibration history: the 4-face-block kernels were gated by a model
# pinned to Mosaic's scoped-vmem report (13.80 MiB at y K1=3 n=114) against a
# 13 MiB vmem limit.  Re-probing for the 3-face-block kernels showed TWO
# things (see the round-3b notes in CLAUDE.md):
#   1. the model UNDER-predicts Mosaic's actual allocation by a shape-
#      dependent ~0.45-0.65 MiB at ~13 MiB scale (measured: y K1=2 n=152
#      model 12.48 MiB vs Mosaic 13.05 MiB) — it is a lower bound, not exact;
#   2. the old "usable stack capacity" was just our own 13 MiB limit: Mosaic
#      accepts vmem_limit_bytes up to at least 15.5 MiB on the v5e and a
#      15.7 MiB-allocation kernel compiles AND executes correctly.
# Gate design: approve shapes whose MODEL footprint fits a 13.0 MiB budget,
# and hand Mosaic a 15.0 MiB limit — the 2 MiB budget->limit gap absorbs the
# model's measured under-prediction with >1.3 MiB to spare.  Hardware-
# validated approved-and-running boundary shapes: y K1=2 n=152 (Mosaic
# 13.05 MiB) and y K1=3 n=114 (runs at a 13.5 MiB limit) — both formerly
# crashing/declining.  A gate that over-approves still kills the whole solve
# at Mosaic compile time, so both directions stay regression-tested at the
# benchmark shapes (tests/test_pallas_fused_ho.py).
_VMEM_BUDGET_HO = 13 * 2**20
_VMEM_LIMIT_HO = 15 * 2**20
# The x kernel's per-slab model (staged faces scale with the lane dim, not the
# sublane dim) is validated at 12 MiB only (tz=8 @ RT1 988k, tz=6 @ RT2 988k,
# both measured working); it keeps the proven budget (the raised limit gives
# its own model error the same safety margin).
_VMEM_BUDGET_HO_X = 12 * 2**20

__all__ = ["fused_ho_dir", "ho_coeff_tables", "ho_fits"]


def ho_coeff_tables(fes, di):
    """(bxs, bxo, qt) numpy coefficient tables for direction `di`, or None when
    the mode structure does not factor (m != k).

    bxs[t, f, l] = BXc[f, p(l,t), t] / m_t[t]   (rhs side, transverse mass folded)
    bxo[t, f, l] = BXc[f, p(l,t), t]            (output side)
    qt[t, l, l'] = Qbub[p(l,t), p(l',t)]        (condensed bubble block per t)
    """
    if fes.m != fes.k or fes.et.nbub == 0:
        return None
    K1 = fes.m + 1
    groups = [[] for _ in range(di.T)]
    for p in range(fes.P):
        groups[int(di.p_to_t[p])].append(p)
    bxs = np.zeros((di.T, 2, K1))
    bxo = np.zeros((di.T, 2, K1))
    qt = np.zeros((di.T, K1, K1))
    for t in range(di.T):
        ps = sorted(groups[t], key=lambda p: int(fes.modes[p, di.d]))
        if len(ps) != K1:
            return None
        for li, p in enumerate(ps):
            bxo[t, :, li] = di.BXc[:, p, t]
            bxs[t, :, li] = di.BXc[:, p, t] / di.m_t[t]
            for lj, p2 in enumerate(ps):
                qt[t, li, lj] = di.Qbub[p, p2]
    return bxs, bxo, qt


def _body_z_ho(acc_ref, v_ref, dm_ref, l_ref, a_ref, bxs_ref, bxo_ref,
               q_ref, out_ref, zf, *, K1):
    """z-direction higher-order body, one transverse mode per instance.

    Blocks: acc/v/out (K1, 1, 1, n, ts, tc); dm (n+1, ts, tc);
    l/a (n, ts, tc); bxs/bxo (1, 2, K1) SMEM; q (1, K1, K1) SMEM;
    scratch zf (n+1, ts, tc).  Recurrence over the solve axis (dim 3)."""
    n = v_ref.shape[3]

    rf0 = bxs_ref[0, 0, 0] * v_ref[0, 0, 0, 0]
    for li in range(1, K1):
        rf0 += bxs_ref[0, 0, li] * v_ref[li, 0, 0, 0]
    zf[0] = rf0

    def fwd(f, z_prev):
        fm = f - 1
        rf = bxs_ref[0, 1, 0] * v_ref[0, 0, 0, fm]
        for li in range(1, K1):
            rf += bxs_ref[0, 1, li] * v_ref[li, 0, 0, fm]
        fc = jnp.minimum(f, n - 1)
        rb = bxs_ref[0, 0, 0] * v_ref[0, 0, 0, fc]
        for li in range(1, K1):
            rb += bxs_ref[0, 0, li] * v_ref[li, 0, 0, fc]
        rf = rf + jnp.where(f < n, 1.0, 0.0) * rb
        z = rf - l_ref[f - 1] * z_prev
        zf[f] = z
        return z

    z_last = jax.lax.fori_loop(1, n + 1, fwd, zf[0])
    f_next = z_last * dm_ref[n]
    zf[n] = f_next

    def bwd(i, f_next):
        e = n - 1 - i
        f_e = zf[e] * dm_ref[e] - l_ref[e] * f_next
        ainv = 1.0 / a_ref[e]
        for li in range(K1):
            qv = q_ref[0, li, 0] * v_ref[0, 0, 0, e]
            for lj in range(1, K1):
                qv += q_ref[0, li, lj] * v_ref[lj, 0, 0, e]
            out_ref[li, 0, 0, e] = (acc_ref[li, 0, 0, e]
                                    + bxo_ref[0, 0, li] * f_e
                                    + bxo_ref[0, 1, li] * f_next
                                    + qv * ainv)
        zf[e] = f_e
        return f_e

    jax.lax.fori_loop(0, n, bwd, f_next)


def _body_y_ho(acc_ref, v_ref, dm_ref, l_ref, a_ref, bxs_ref, bxo_ref,
               q_ref, out_ref, zf, vt, *, K1):
    """y-direction higher-order body (solve axis middle), one transverse mode
    per instance.  Blocks: acc/v/out (1, K1, 1, ts, n, tc); staged
    dm (n+1, ts, tc); l/a (n, ts, tc); coefficient tables in SMEM.
    The K1 mode planes are relayouted to solve-axis-major scratches so each
    recurrence step reads whole (ts, tc) tiles (see _body_yT rationale).
    The backward pass overwrites vt in place once vt[:, e] has fed its last
    q-term read — no separate output scratch (VMEM footprint gates ny)."""
    n = v_ref.shape[4]
    for li in range(K1):
        vt[li] = jnp.swapaxes(v_ref[0, li, 0], 0, 1)

    rf0 = bxs_ref[0, 0, 0] * vt[0, 0]
    for li in range(1, K1):
        rf0 += bxs_ref[0, 0, li] * vt[li, 0]
    zf[0] = rf0

    def fwd(f, z_prev):
        rf = bxs_ref[0, 1, 0] * vt[0, f - 1]
        for li in range(1, K1):
            rf += bxs_ref[0, 1, li] * vt[li, f - 1]
        fc = jnp.minimum(f, n - 1)
        rb = bxs_ref[0, 0, 0] * vt[0, fc]
        for li in range(1, K1):
            rb += bxs_ref[0, 0, li] * vt[li, fc]
        rf = rf + jnp.where(f < n, 1.0, 0.0) * rb
        z = rf - l_ref[f - 1] * z_prev
        zf[f] = z
        return z

    z_last = jax.lax.fori_loop(1, n + 1, fwd, zf[0])
    f_next = z_last * dm_ref[n]
    zf[n] = f_next

    def bwd(i, f_next):
        e = n - 1 - i
        f_e = zf[e] * dm_ref[e] - l_ref[e] * f_next
        ainv = 1.0 / a_ref[e]
        qvs = []
        for li in range(K1):
            qv = q_ref[0, li, 0] * vt[0, e]
            for lj in range(1, K1):
                qv += q_ref[0, li, lj] * vt[lj, e]
            qvs.append(qv)
        for li in range(K1):
            vt[li, e] = (bxo_ref[0, 0, li] * f_e + bxo_ref[0, 1, li] * f_next
                         + qvs[li] * ainv)
        zf[e] = f_e
        return f_e

    jax.lax.fori_loop(0, n, bwd, f_next)
    for li in range(K1):
        out_ref[0, li, 0] = acc_ref[0, li, 0] + jnp.swapaxes(vt[li], 0, 1)


def _body_x_ho(acc_ref, v_ref, dm_ref, l_ref, a_ref, bxs_ref, bxo_ref,
               q_ref, out_ref, vt, zf, *, K1, ny, wy):
    """x-direction higher-order body (solve axis minor): wide transposed form
    over a z-slab, operating on the NATURAL 6D flux layout — no HBM (nz, ny)
    merge (a physical copy whenever ny % 8 != 0; it was ~10% of RT1 device
    time around the old flat-B kernel).

    Blocks: acc/v/out (1, 1, K1, tz, ny, n); staged dm (n+1, tz*wy) and
    l/a (n, tz*wy) in the lane-packed per-z layout of ops/context.py (wy = ny
    padded to a lane tile; dead lanes 0, alpha 1).  Each of the K1 x tz mode
    planes is transposed into the (n, tz*wy) vt scratch at its z-slice's
    128-aligned lane offset; the recurrence then runs down sublanes over the
    whole slab width.  The backward pass overwrites vt in place; dead/garbage
    lanes never cross lanes (the recurrence is lanewise) and are sliced away
    at unpack."""
    n = v_ref.shape[5]
    tz = v_ref.shape[3]
    for li in range(K1):
        for t in range(tz):
            vt[li, :, t * wy:t * wy + ny] = v_ref[0, 0, li, t].T

    rf0 = bxs_ref[0, 0, 0] * vt[0, 0]
    for li in range(1, K1):
        rf0 += bxs_ref[0, 0, li] * vt[li, 0]
    zf[0] = rf0

    def fwd(f, z_prev):
        rf = bxs_ref[0, 1, 0] * vt[0, f - 1]
        for li in range(1, K1):
            rf += bxs_ref[0, 1, li] * vt[li, f - 1]
        fc = jnp.minimum(f, n - 1)
        rb = bxs_ref[0, 0, 0] * vt[0, fc]
        for li in range(1, K1):
            rb += bxs_ref[0, 0, li] * vt[li, fc]
        rf = rf + jnp.where(f < n, 1.0, 0.0) * rb
        z = rf - l_ref[f - 1] * z_prev
        zf[f] = z
        return z

    z_last = jax.lax.fori_loop(1, n + 1, fwd, zf[0])
    f_next = z_last * dm_ref[n]
    zf[n] = f_next

    def bwd(i, f_next):
        e = n - 1 - i
        f_e = zf[e] * dm_ref[e] - l_ref[e] * f_next
        ainv = 1.0 / a_ref[e]
        qvs = []
        for li in range(K1):
            qv = q_ref[0, li, 0] * vt[0, e]
            for lj in range(1, K1):
                qv += q_ref[0, li, lj] * vt[lj, e]
            qvs.append(qv)
        for li in range(K1):
            vt[li, e] = (bxo_ref[0, 0, li] * f_e + bxo_ref[0, 1, li] * f_next
                         + qvs[li] * ainv)
        zf[e] = f_e
        return f_e

    jax.lax.fori_loop(0, n, bwd, f_next)
    for li in range(K1):
        for t in range(tz):
            out_ref[0, 0, li, t] = (acc_ref[0, 0, li, t]
                                    + vt[li, :, t * wy:t * wy + ny].T)


def ho_fits(axis: int, lshape, dtype, K1: int, interpret: bool = False) -> bool:
    """Would the direction kernel engage for (local) spatial shape
    ``lshape = (nz, ny, nx)``?  The numeric gates of ``fused_ho_dir`` (shape
    minima + VMEM tile fit), shared with ``apply._fused_sharded_ho`` so the
    shard_map wrapper can pre-check per-shard shapes OUTSIDE the mapped body
    (a kernel cannot decline to the unfused path from inside shard_map)."""
    if not interpret and dtype not in (jnp.float32, jnp.bfloat16):
        return False
    nz, ny, nx = lshape
    if axis == 0:  # z
        return (nz >= 4 and nx >= 64 and ny * nx >= 512
                and _tiles_ho(nz, (ny, nx), dtype, K1) is not None)
    if axis == 1:  # y
        return (ny >= 4 and nx >= 64 and nz >= 4 and nz * nx >= 512
                and _tiles_ho_y(ny, (nz, nx), dtype, K1) is not None)
    return (nx >= 4 and nz * ny >= 512
            and _tz_ho_x(nx, nz, ny, dtype, K1) is not None)


def _rows_z(n: int, K1: int) -> int:
    """Exact Mosaic VMEM footprint of the z HO kernel per (ts, tc) tile slot,
    in units of (ts, tc) element rows: acc/v/out cell blocks hold K1*n rows
    each and are double-buffered (6*K1*n), the 3 face blocks (dm/l/alpha) hold
    (n+1) + 2*n rows and are double-buffered too, and the zf scratch holds
    n+1 (single-buffered).  The solve axis is a LEADING block dim here — no
    sublane padding.  Footprint bytes = rows * ts * tc * itemsize."""
    return 6 * K1 * n + 2 * ((n + 1) + 2 * n) + (n + 1)


def _rows_y(n: int, K1: int) -> int:
    """Model VMEM footprint of the y HO kernel, in (ts, tc) rows.  The
    cell blocks put the solve axis in the SUBLANE position -> n pads to 8;
    the vt scratch keeps n leading (no pad).  The four-face-block model
    matched Mosaic's scoped-vmem report to the byte at K1=3 n=114 (3533 rows
    = 13.80 MiB); for the 3-face-block kernel Mosaic allocates a measured
    ~0.45-0.65 MiB MORE than this model at ~13 MiB scale (shape-dependent
    overhead the row accounting does not see), which the budget->limit gap
    absorbs — see the _VMEM_BUDGET_HO note."""
    n8 = _pad_up(n, 8)
    return 6 * K1 * n8 + 2 * ((n + 1) + 2 * n) + (n + 1) + K1 * n


def _tiles_ho(n: int, s12, dtype, K1: int):
    """(ts, tc) for the z-direction HO kernel, or None when even the minimum
    (8, 128) tile exceeds the calibrated VMEM budget (see _rows_z)."""
    itemsize = jnp.dtype(dtype).itemsize
    rows = _rows_z(n, K1)
    tc = _round_down(min(256, _VMEM_BUDGET_HO // (rows * 8 * itemsize)), 128)
    if tc == 0:
        return None
    tc = min(tc, _pad_up(s12[1], 128))
    ts = _round_down(min(8, _VMEM_BUDGET_HO // (rows * tc * itemsize)), 8)
    if ts == 0:
        return None
    ts = min(ts, _pad_up(s12[0], 8))
    return ts, tc


def _tiles_ho_y(n: int, s02, dtype, K1: int):
    """(ts, tc) for the y-direction HO kernel, or None when even the minimum
    (8, 128) tile exceeds the VMEM budget (see _rows_y and the budget/limit
    margin design at _VMEM_BUDGET_HO; a round-3 plane-count heuristic once
    over-approved here and the Mosaic compile OOM killed the whole solve)."""
    itemsize = jnp.dtype(dtype).itemsize
    rows = _rows_y(n, K1)
    tc = _round_down(min(256, _VMEM_BUDGET_HO // (rows * 8 * itemsize)), 128)
    if tc == 0:
        return None
    tc = min(tc, _pad_up(s02[1], 128))
    ts = _round_down(min(8, _VMEM_BUDGET_HO // (rows * tc * itemsize)), 8)
    if ts == 0:
        return None
    ts = min(ts, _pad_up(s02[0], 8))
    return ts, tc


def _tz_ho_x(n: int, nz: int, ny: int, dtype, K1: int):
    """z-slab tile for the x-direction HO kernel, or None.  Footprint per unit
    of tz: 3*K1 double-buffered cell planes (ny, n), 3 double-buffered staged
    face panels (rows, wy), and the vt/zf scratches at slab width wy."""
    itemsize = jnp.dtype(dtype).itemsize
    wy = _pad_up(ny, 128)
    nyp = _pad_up(ny, 8)
    npd = _pad_up(n, 128)
    rows = _pad_up(n + 1, 8)
    per_tz = itemsize * (6 * K1 * nyp * npd + 6 * rows * wy
                         + K1 * _pad_up(n, 8) * wy + rows * wy)
    tz = min(8, int(_VMEM_BUDGET_HO_X // per_tz), nz)
    return tz if tz >= 1 else None


@functools.partial(jax.jit, static_argnames=("K1", "ts", "tc", "interpret"))
def _fused_y_ho(acc, v, dmT, lT, aT, bxs, bxo, qt, K1: int, ts: int,
                tc: int, interpret: bool = False):
    # v/acc: (K1[tz], K1[l], K1[tx], nz, n, nx); staged ops solve-axis-major
    # (n+1 / n / n, nz, nx); bxs/bxo (T, 2, K1); qt (T, K1, K1)
    G0, _, G2, S, n, C = v.shape
    cell = pl.BlockSpec((1, K1, 1, ts, n, tc),
                        lambda i0, i2, si, ci: (i0, 0, i2, si, 0, ci),
                        memory_space=pltpu.VMEM)
    face = lambda rows: pl.BlockSpec((rows, ts, tc),
                                     lambda i0, i2, si, ci: (0, si, ci),
                                     memory_space=pltpu.VMEM)
    coef = lambda a, b: pl.BlockSpec((1, a, b),
                                     lambda i0, i2, si, ci: (i2 + G2 * i0, 0, 0),
                                     memory_space=pltpu.SMEM)
    kern = functools.partial(_body_y_ho, K1=K1)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=(G0, G2, pl.cdiv(S, ts), pl.cdiv(C, tc)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 4,
            vmem_limit_bytes=_VMEM_LIMIT_HO),
        in_specs=[cell, cell, face(n + 1), face(n), face(n),
                  coef(2, K1), coef(2, K1), coef(K1, K1)],
        out_specs=cell,
        scratch_shapes=[
            pltpu.VMEM((n + 1, ts, tc), v.dtype),
            pltpu.VMEM((K1, n, ts, tc), v.dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(acc, v, dmT, lT, aT, bxs, bxo, qt)


@functools.partial(jax.jit,
                   static_argnames=("K1", "tz", "wy", "interpret"))
def _fused_x_ho(acc, v, dmT, lT, aT, bxs, bxo, qt, K1: int, tz: int,
                wy: int, interpret: bool = False):
    # v/acc: (K1[t_high], K1[t_low], K1[l], nz, ny, n); staged ops lane-packed
    # (rows, nz*wy) per ops/context.py
    _, G1, _, nz, ny, n = v.shape
    cell = pl.BlockSpec((1, 1, K1, tz, ny, n),
                        lambda i0, i1, zb: (i0, i1, 0, zb, 0, 0),
                        memory_space=pltpu.VMEM)
    face = lambda rows: pl.BlockSpec((rows, tz * wy),
                                     lambda i0, i1, zb: (0, zb),
                                     memory_space=pltpu.VMEM)
    coef = lambda a, b_: pl.BlockSpec((1, a, b_),
                                      lambda i0, i1, zb: (i1 + G1 * i0, 0, 0),
                                      memory_space=pltpu.SMEM)
    kern = functools.partial(_body_x_ho, K1=K1, ny=ny, wy=wy)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=(v.shape[0], G1, pl.cdiv(nz, tz)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3,
            vmem_limit_bytes=_VMEM_LIMIT_HO),
        in_specs=[cell, cell, face(n + 1), face(n), face(n),
                  coef(2, K1), coef(2, K1), coef(K1, K1)],
        out_specs=cell,
        scratch_shapes=[
            pltpu.VMEM((K1, n, tz * wy), v.dtype),
            pltpu.VMEM((n + 1, tz * wy), v.dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(acc, v, dmT, lT, aT, bxs, bxo, qt)


@functools.partial(jax.jit, static_argnames=("K1", "ts", "tc", "interpret"))
def _fused_z_ho(acc, v, dm, l, alpha, bxs, bxo, qt, K1: int, ts: int,
                tc: int, interpret: bool = False):
    # v/acc: (K1[l], K1[ty], K1[tx], n, S, C); face ops (n+1 or n, S, C);
    # alpha (n, S, C); bxs/bxo (T, 2, K1); qt (T, K1, K1)
    _, G1, G2, n, S, C = v.shape
    cell = pl.BlockSpec((K1, 1, 1, n, ts, tc),
                        lambda i1, i2, si, ci: (0, i1, i2, 0, si, ci),
                        memory_space=pltpu.VMEM)
    face = lambda rows: pl.BlockSpec((rows, ts, tc),
                                     lambda i1, i2, si, ci: (0, si, ci),
                                     memory_space=pltpu.VMEM)
    coef = lambda a, b: pl.BlockSpec((1, a, b),
                                     lambda i1, i2, si, ci: (i2 + G2 * i1, 0, 0),
                                     memory_space=pltpu.SMEM)
    kern = functools.partial(_body_z_ho, K1=K1)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=(G1, G2, pl.cdiv(S, ts), pl.cdiv(C, tc)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 4,
            vmem_limit_bytes=_VMEM_LIMIT_HO),
        in_specs=[cell, cell, face(n + 1), face(n), face(n),
                  coef(2, K1), coef(2, K1), coef(K1, K1)],
        out_specs=cell,
        scratch_shapes=[pltpu.VMEM((n + 1, ts, tc), v.dtype)],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(acc, v, dm, l, alpha, bxs, bxo, qt)


def fused_ho_dir(fes, di, acc, v, dinvm, l, alpha, tables,
                 interpret: bool = False) -> Optional[jnp.ndarray]:
    """acc + (condensed B_d A_d^{-1} B_d^T + Qbub/alpha) v for one direction of
    a k >= 1 space, or None if no kernel fits (caller falls back to the unfused
    condensed ops).

    acc, v: internal flux (..., P, nz, ny, nx) with all dims before P of size 1.
    For the z direction pass dinvm/l/alpha in their natural layouts; for
    y/x pass the PRE-STAGED context operands (tri_hoyT_*/tri_hoxT_*,
    ops/context.py).  tables: ho_coeff_tables(fes, di).

    The P axis factors as (K1[pz], K1[py], K1[px]) under a free leading-axis
    reshape (modes enumerated x-fastest), which is exactly each kernel's
    (transverse-grid, longitudinal) block order — no mode permutation is ever
    materialized."""
    if tables is None:
        return None
    if v.ndim < 4 or any(s != 1 for s in v.shape[:-4]):
        return None
    if fes.mesh.dim != 3:
        return None
    K1 = fes.m + 1
    nz, ny, nx = v.shape[-3:]
    if not ho_fits(di.axis, (nz, ny, nx), v.dtype, K1, interpret):
        return None
    bxs, bxo, qt = tables
    dt = v.dtype
    cb = lambda a: jnp.asarray(a, dt)
    v6 = v.reshape(K1, K1, K1, nz, ny, nx)
    acc6 = acc.reshape(K1, K1, K1, nz, ny, nx)

    if di.axis == 0:  # z: solve axis leading
        n = nz
        tiles = _tiles_ho(n, (ny, nx), v.dtype, K1)
        out = _fused_z_ho(
            acc6, v6,
            jnp.broadcast_to(dinvm, (n + 1, ny, nx)).astype(dt),
            jnp.broadcast_to(l, (n, ny, nx)).astype(dt),
            jnp.broadcast_to(alpha, (n, ny, nx)).astype(dt),
            cb(bxs), cb(bxo), cb(qt),
            K1=K1, ts=tiles[0], tc=tiles[1], interpret=interpret,
        )
        return out.reshape(v.shape)

    if di.axis == 1:  # y: staged solve-axis-major operands (ny+1, nz, nx)
        n = ny
        if dinvm.shape != (n + 1, nz, nx):
            return None  # caller passed unstaged operands
        tiles = _tiles_ho_y(n, (nz, nx), v.dtype, K1)
        out = _fused_y_ho(
            acc6, v6, dinvm.astype(dt), l.astype(dt),
            alpha.astype(dt), cb(bxs), cb(bxo), cb(qt),
            K1=K1, ts=tiles[0], tc=tiles[1], interpret=interpret,
        )
        return out.reshape(v.shape)

    # x: wide transposed form per z-slab on the natural 6D layout
    n = nx
    wy = _pad_up(ny, 128)
    if dinvm.shape != (n + 1, nz * wy):
        return None  # caller passed unstaged operands
    tz = _tz_ho_x(n, nz, ny, v.dtype, K1)
    out = _fused_x_ho(
        acc6, v6,
        dinvm.astype(dt), l.astype(dt), alpha.astype(dt),
        cb(bxs), cb(bxo), cb(qt),
        K1=K1, tz=tz, wy=wy, interpret=interpret,
    )
    return out.reshape(v.shape)

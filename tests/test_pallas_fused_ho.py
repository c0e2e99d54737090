"""Higher-order fused Schur kernel (ops/pallas_fused_ho.py) vs the unfused
condensed ops, interpret mode on CPU (the CPU suite never runs Mosaic, so
kernel math MUST be interpret-tested — verify-skill rule)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from neutfem_tpu.bc import BCKind, BCSpec
from neutfem_tpu.fespace import make_fespace
from neutfem_tpu.mesh import CartesianMesh, boundary_attribute
from neutfem_tpu.ops.apply import (
    _face_out,
    _face_rhs,
    phi_to_internal,
    solve_A_dir,
)
from neutfem_tpu.ops.context import build_context
from neutfem_tpu.ops.pallas_fused_ho import fused_ho_dir, ho_coeff_tables
from neutfem_tpu.power import ctx_group

DT = jnp.float32


def _problem(shape_zyx, k, m, bc_kind=BCKind.DIRICHLET, seed=0):
    nz, ny, nx = shape_zyx
    rng = np.random.default_rng(seed)
    mesh = CartesianMesh.from_breaks(
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, nx))]),
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, ny))]),
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, nz))]),
    )
    fes = make_fespace(mesh, k, m)
    ng = 2
    xs = {
        "D": rng.uniform(0.3, 2.0, (ng, *mesh.shape)),
        "SigR": rng.uniform(0.01, 0.2, (ng, *mesh.shape)),
        "NSF": rng.uniform(0.0, 0.2, (ng, *mesh.shape)),
        "Chi": np.zeros((ng, *mesh.shape)),
        "SigS": np.zeros((ng, ng, *mesh.shape)),
        "SRC": np.zeros((ng, *mesh.shape)),
    }
    xs["Chi"][0] = 1.0
    bcs = BCSpec()
    for ax in range(3):
        for upper in (False, True):
            bcs.set(boundary_attribute(3, ax, upper), bc_kind)
    if bc_kind == BCKind.MIRROR:
        bcs.set(boundary_attribute(3, 0, True), BCKind.DIRICHLET)
    ctx = build_context(fes, ng, xs, bcs, a_mode="exact", dtype=DT)
    return mesh, fes, ng, ctx


def _condensed_dir_contribution(fes, di, cg, vg):
    """Unfused condensed contribution of one direction (the apply.py branch)."""
    key = f"d{di.d}"
    BXc = jnp.asarray(di.BXc, dtype=vg.dtype)
    rF = _face_rhs(di, vg, BXc)
    F, _ = solve_A_dir(
        fes, di, cg[f"tri_dinv_{key}"], cg.get(f"tri_l_{key}"),
        cg[f"mask_{key}"], cg[f"alpha_{key}"], rF, None, "exact", cyc=None,
    )
    out = _face_out(di, F, BXc)
    alpha_e = jnp.expand_dims(cg[f"alpha_{key}"], -4)
    Q = jnp.asarray(di.Qbub, dtype=vg.dtype)
    return out + jnp.einsum("...qzyx,pq->...pzyx", vg, Q) / alpha_e


def _kernel_ops(cg, di):
    """The staged operand bundle apply.py hands the kernel for direction di."""
    key = f"d{di.d}"
    if di.axis == 1 and f"tri_hoyT_dinvm_{key}" in cg:
        return (cg[f"tri_hoyT_dinvm_{key}"],
                cg[f"tri_hoyT_l_{key}"], cg[f"tri_hoyT_alpha_{key}"])
    if di.axis == 2 and f"tri_hoxT_dinvm_{key}" in cg:
        return (cg[f"tri_hoxT_dinvm_{key}"],
                cg[f"tri_hoxT_l_{key}"], cg[f"tri_hoxT_alpha_{key}"])
    return (cg[f"tri_dinvm_{key}"], cg[f"tri_l_{key}"], cg[f"alpha_{key}"])


@pytest.mark.parametrize("k,bc", [
    (1, BCKind.DIRICHLET),
    (1, BCKind.MIRROR),
    (2, BCKind.DIRICHLET),
])
@pytest.mark.parametrize("axis", [0, 1, 2])
def test_ho_kernel_matches_condensed(k, bc, axis):
    # sizes chosen so all three kernels pass their engagement gates:
    # x needs nz*ny >= 512; y needs nx >= 64, nz >= 4; z needs ny*nx >= 512
    mesh, fes, ng, ctx = _problem((8, 64, 64), k, k, bc_kind=bc)
    rng = np.random.default_rng(5)
    v = phi_to_internal(
        jnp.asarray(rng.normal(size=(ng, *mesh.shape, fes.P)), DT)
    )

    di = [d for d in fes.dirs if d.axis == axis][0]
    tables = ho_coeff_tables(fes, di)
    assert tables is not None
    for g in range(ng):
        cg = ctx_group(ctx, g)
        vg = v[g][None]
        want = _condensed_dir_contribution(fes, di, cg, vg)
        ops = _kernel_ops(cg, di)

        acc = jnp.zeros_like(vg)
        got = fused_ho_dir(fes, di, acc, vg, *ops, tables, interpret=True)
        assert got is not None
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            rtol=0, atol=5e-5 * float(jnp.abs(want).max()),
        )

        # accumulator aliasing: nonzero acc must add through
        acc2 = jnp.asarray(rng.normal(size=vg.shape), DT)
        got2 = fused_ho_dir(fes, di, acc2, vg, *ops, tables, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got2 - acc2), np.asarray(want),
            rtol=0, atol=1e-4 * float(jnp.abs(want).max()),
        )


def test_ho_kernel_declines_m_lt_k():
    mesh = CartesianMesh.from_breaks(
        np.linspace(0, 8, 9), np.linspace(0, 8, 9), np.linspace(0, 8, 9)
    )
    fes_low = make_fespace(mesh, 1, 0)
    di_z = [d for d in fes_low.dirs if d.axis == 0][0]
    assert ho_coeff_tables(fes_low, di_z) is None


def test_tile_gates_engage_at_benchmark_meshes():
    """Regression: the HO kernels must FIT (not silently decline) at the
    benchmark mesh sizes.  Round 3 found the y kernel declining at ny=114
    (IAEA-3D 6x6x4) because the RT0 8 MiB VMEM budget underflowed the minimum
    (8, 128) tile — a silent 50% RT1 perf loss."""
    import jax.numpy as jnp

    from neutfem_tpu.ops.pallas_fused_ho import _tiles_ho, _tiles_ho_y, _tz_ho_x
    from neutfem_tpu.ops.pallas_fused import _tiles as _tiles_rt0

    # RT1-P1 (K1=2): IAEA-3D 6x6x4 (76,114,114) — hardware-validated engaged
    assert _tiles_ho_y(114, (76, 114), jnp.float32, 2) is not None
    assert _tiles_ho(76, (114, 114), jnp.float32, 2) is not None
    assert _tz_ho_x(114, 76, 114, jnp.float32, 2) is not None
    assert _tz_ho_x(152, 114, 152, jnp.float32, 2) is not None
    # RT2-P2 (K1=3): the 5.9M-DOF validated mesh
    assert _tiles_ho_y(76, (38, 76), jnp.float32, 3) is not None
    # z engages out to n=152 at K1=2
    assert _tiles_ho(152, (114, 152), jnp.float32, 2) is not None
    # dropping the streamed mask plane + raising the Mosaic vmem limit to its
    # measured ceiling (round 3b): the y kernel now fits the 2.6M-class RT1
    # meshes (K1=2, n=152 -> Mosaic 13.05 MiB, runs) and the 26.7M-DOF RT2
    # mesh (K1=3, n=114 -> runs at a 13.5 MiB limit) — both hardware-probed
    assert _tiles_ho_y(152, (114, 152), jnp.float32, 2) is not None
    assert _tiles_ho_y(144, (64, 128), jnp.float32, 2) is not None
    assert _tiles_ho_y(114, (76, 114), jnp.float32, 3) is not None
    assert _tiles_ho_y(114, (76, 114), jnp.bfloat16, 3) is not None
    # RT0: the 2.6M/3.5M meshes have n=152 on every axis
    for rel in (0, 1):
        assert _tiles_rt0((152, 152, 152), jnp.float32, rel) is not None


def test_tile_gates_decline_vmem_oom_shapes():
    """Regression: shapes whose exact Mosaic footprint exceeds the calibrated
    v5e VMEM stack capacity must DECLINE (return None) — the old plane-count
    heuristic approved them and the compile OOM killed the whole solve
    (found by the 26.7M-DOF RT2-P2 probe; both shapes reproduced standalone
    on hardware: 'Ran out of memory in memory space vmem')."""
    import jax.numpy as jnp

    from neutfem_tpu.ops.pallas_fused_ho import (_rows_y, _tiles_ho,
                                                 _tiles_ho_y)

    # the model boundary sits at the 13.0 MiB budget: y @ K1=2 n=160 models
    # 13,774,848 B and must decline (the 15.0 MiB Mosaic limit would fit it,
    # but only hardware-probed shapes move the budget)
    assert _tiles_ho_y(160, (64, 128), jnp.float32, 2) is None
    assert _tiles_ho_y(176, (64, 128), jnp.float32, 2) is None
    # the 4-face-block model matched Mosaic's scoped-vmem report exactly
    # (K1=3 n=114 -> 3533 rows = 13.80 MiB, the measured compile OOM); the
    # 3-face-block kernel drops the 2*(n+1) = 230 mask-plane rows from the
    # model (Mosaic's actual runs ~0.5 MiB above the model — absorbed by the
    # budget->limit gap, see _VMEM_BUDGET_HO)
    assert _rows_y(114, 3) == 3533 - 230
    # z is leaner (no sublane pad, 1 scratch) but must decline eventually too
    assert _tiles_ho(152, (114, 152), jnp.float32, 3) is None


def test_block_precond_storage_tiers():
    """The equilibrated P x P block-Jacobi inverse is stored bfloat16 when the
    solve dtype is float32 (halves its HBM traffic; entries are O(1))."""
    import jax.numpy as jnp

    from neutfem_tpu import BCKind, BCSpec, CartesianMesh, make_fespace
    from neutfem_tpu.mesh import boundary_attribute
    from neutfem_tpu.ops.context import build_context

    mesh = CartesianMesh.from_breaks(
        np.linspace(0, 8, 9), np.linspace(0, 8, 9), np.linspace(0, 8, 9)
    )
    fes = make_fespace(mesh, 1, 1)
    ng = 1
    sp = mesh.shape
    xs = {
        "D": np.full((ng, *sp), 1.2), "SigR": np.full((ng, *sp), 0.1),
        "NSF": np.zeros((ng, *sp)), "Chi": np.ones((ng, *sp)),
        "SigS": np.zeros((ng, ng, *sp)), "SRC": np.zeros((ng, *sp)),
    }
    bcs = BCSpec()
    for ax in range(3):
        for up in (False, True):
            bcs.set(boundary_attribute(3, ax, up), BCKind.DIRICHLET)
    ctx = build_context(fes, ng, xs, bcs, dtype=jnp.float32)
    assert ctx["precond_blk_dev"].dtype == jnp.float8_e4m3fn
    assert "precond_blk_inv" not in ctx
    old = os.environ.get("NEUTFEM_BLKFP8")
    os.environ["NEUTFEM_BLKFP8"] = "0"
    try:
        ctx_bf = build_context(fes, ng, xs, bcs, dtype=jnp.float32)
    finally:
        if old is None:
            os.environ.pop("NEUTFEM_BLKFP8")
        else:
            os.environ["NEUTFEM_BLKFP8"] = old
    assert ctx_bf["precond_blk_inv"].dtype == jnp.bfloat16
    # the fp8 E-form must reconstruct the bf16 inverse to e4m3 resolution
    eyeP = np.eye(fes.P).reshape(1, fes.P, fes.P, 1, 1, 1)
    rec = np.asarray(ctx["precond_blk_dev"].astype(jnp.float32)) + eyeP
    ref = np.asarray(ctx_bf["precond_blk_inv"].astype(jnp.float32))
    denom = np.abs(ref).max()
    assert np.abs(rec - ref).max() / denom < 0.07, "fp8 E-form off"
    ctx64 = build_context(fes, ng, xs, bcs, dtype=jnp.float64)
    assert ctx64["precond_blk_inv"].dtype == jnp.float64


def _internal_group0(mesh, fes, ng, seed=11):
    rng = np.random.default_rng(seed)
    v = phi_to_internal(
        jnp.asarray(rng.normal(size=(ng, *mesh.shape, fes.P)), DT)
    )
    return v[0][None]


@pytest.mark.parametrize("shape,cut_ga,engage_axis", [
    # z cut, 8 devices: y kernel engages (local nz_l=4, nx=128 -> nz_l*nx=512)
    ((32, 8, 128), 0, 1),
    # y cut: z kernel engages (natural operands; ny_l=8, ny_l... nx=64)
    ((8, 64, 64), 1, 0),
    # pure z cut: x kernel engages via the lane-packed hoxT operands
    # (nz_l*ny = 4*128 = 512)
    ((32, 128, 4), 0, 2),
])
def test_ho_fused_sharded_matches_condensed(shape, cut_ga, engage_axis):
    """_fused_sharded_ho (solve axis orthogonal to the cut) must equal the
    unfused condensed contribution — virtual 8-device mesh, interpret mode.
    The direction ON the cut must decline (no local line solve)."""
    import jax

    from neutfem_tpu.ops.apply import _fused_sharded_ho
    from neutfem_tpu.parallel import device_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh, fes, ng, ctx = _problem(shape, 1, 1)
    vg = _internal_group0(mesh, fes, ng)
    cg = ctx_group(ctx, 0)
    dmesh = device_mesh(8)
    amap = {cut_ga: dmesh.axis_names[0]}

    for di in fes.dirs:
        tables = ho_coeff_tables(fes, di)
        acc = jnp.zeros_like(vg)
        res = _fused_sharded_ho((dmesh, amap), fes, di, acc, vg, cg, tables,
                                interpret=True)
        if di.axis == cut_ga:
            assert res is None  # solve axis on the cut: must decline
            continue
        if di.axis != engage_axis:
            continue  # other direction may decline on its local gates
        assert res is not None, f"direction {di.axis} must engage"
        want = _condensed_dir_contribution(fes, di, cg, vg)
        np.testing.assert_allclose(
            np.asarray(res), np.asarray(want),
            rtol=0, atol=5e-5 * float(jnp.abs(want).max()),
        )
        # accumulator aliasing through the shard_map wrapper
        rng = np.random.default_rng(3)
        acc2 = jnp.asarray(rng.normal(size=vg.shape), DT)
        res2 = _fused_sharded_ho((dmesh, amap), fes, di, acc2, vg, cg, tables,
                                 interpret=True)
        np.testing.assert_allclose(
            np.asarray(res2 - acc2), np.asarray(want),
            rtol=0, atol=1e-4 * float(jnp.abs(want).max()),
        )


def test_shard_context_stages_ho_operands():
    """shard_context must DROP the staged HO operands of a cut direction
    (dead weight: the kernel declines there) and shard the uncut directions'
    staged operands along the cut so per-device context memory scales."""
    import jax

    from neutfem_tpu.parallel import device_mesh, shard_context

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh, fes, ng, ctx = _problem((16, 16, 16), 1, 1)
    dmesh = device_mesh(8)

    # z cut (grid axis 0): z-direction fused operands dropped; y staged hoyT
    # (ny+1, nz, nx) sharded on its nz dim; x staged hoxT (rows, nz*wy)
    # sharded on the packed nz-major axis
    sctx = shard_context(ctx, dmesh, fes, grid_axis=0)
    zkey = [f"d{di.d}" for di in fes.dirs if di.axis == 0][0]
    ykey = [f"d{di.d}" for di in fes.dirs if di.axis == 1][0]
    xkey = [f"d{di.d}" for di in fes.dirs if di.axis == 2][0]
    assert f"tri_dinvm_{zkey}" not in sctx
    nm = dmesh.axis_names[0]
    spec_y = sctx[f"tri_hoyT_dinvm_{ykey}"].sharding.spec
    assert spec_y[-2] == nm and spec_y[-1] is None
    spec_x = sctx[f"tri_hoxT_dinvm_{xkey}"].sharding.spec
    assert spec_x[-1] == nm

    # y cut: the y direction's staged operands are dead weight -> dropped;
    # the x kernel's lane-packed operands only slice along a pure z cut, so
    # under a y cut they can never engage either -> also dropped (they would
    # otherwise replicate O(global) bytes per device)
    sctx = shard_context(ctx, dmesh, fes, grid_axis=1)
    assert f"tri_hoyT_dinvm_{ykey}" not in sctx
    assert f"tri_hoyT_alpha_{ykey}" not in sctx
    assert f"tri_hoxT_dinvm_{xkey}" not in sctx
    assert f"tri_hoxT_alpha_{xkey}" not in sctx


def test_ho_fused_sharded_declines_batched_flux():
    """sweep="jacobi" passes the un-group-sliced (ng, P, spatial) flux and 4D
    per-group ctx operands; _fused_sharded_ho must DECLINE (return None, ->
    unfused condensed chain) exactly like fused_ho_dir, not crash at trace
    time on the 3D broadcast/specs (round-3 review finding)."""
    import jax

    from neutfem_tpu.ops.apply import _fused_sharded_ho
    from neutfem_tpu.parallel import device_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh, fes, ng, ctx = _problem((32, 8, 128), 1, 1)
    rng = np.random.default_rng(11)
    v = phi_to_internal(
        jnp.asarray(rng.normal(size=(ng, *mesh.shape, fes.P)), DT)
    )  # full (ng, P, nz, ny, nx) — NOT group-sliced
    dmesh = device_mesh(8)
    amap = {0: dmesh.axis_names[0]}
    for di in fes.dirs:
        tables = ho_coeff_tables(fes, di)
        res = _fused_sharded_ho((dmesh, amap), fes, di, jnp.zeros_like(v), v,
                                ctx, tables, interpret=True)
        assert res is None  # batched flux / un-sliced ctx: must decline

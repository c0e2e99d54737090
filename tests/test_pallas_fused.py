"""Fused per-direction Schur kernels (ops/pallas_fused.py) vs the unfused ops,
interpret mode on CPU.  The fused kernel computes acc + B_d A_d^{-1} B_d^T v in
one pass; the unfused reference path is apply_BT -> solve_A -> apply_B."""

import numpy as np
import pytest

import jax.numpy as jnp

from neutfem_tpu import config
from neutfem_tpu.bc import BCKind, BCSpec
from neutfem_tpu.fespace import make_fespace
from neutfem_tpu.mesh import CartesianMesh, boundary_attribute
from neutfem_tpu.ops.apply import phi_to_internal, schur_matvec
from neutfem_tpu.ops.context import build_context
from neutfem_tpu.ops.pallas_fused import fused_schur_dir

DT = jnp.float32  # the fused kernels serve the f32 TPU path


def _problem(shape_zyx, bc_kind=BCKind.DIRICHLET, seed=0):
    nz, ny, nx = shape_zyx
    rng = np.random.default_rng(seed)
    mesh = CartesianMesh.from_breaks(
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, nx))]),
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, ny))]),
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, nz))]),
    )
    fes = make_fespace(mesh, 0, 0)
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


@pytest.mark.parametrize("bc", [BCKind.DIRICHLET, BCKind.MIRROR])
def test_fused_matches_unfused_all_directions(bc):
    # sizes chosen so all three kernels pass their engagement gates:
    # x needs nz*ny >= 512; y needs nx >= 64; z needs ny*nx >= 512
    mesh, fes, ng, ctx = _problem((16, 32, 64), bc_kind=bc)
    rng = np.random.default_rng(3)
    v = phi_to_internal(
        jnp.asarray(rng.normal(size=(ng, *mesh.shape, fes.P)), DT)
    )

    # unfused reference (CPU: pallas unavailable, so schur_matvec takes it)
    want = schur_matvec(fes, ctx, v, a_mode="exact")

    # fused, direction by direction in interpret mode
    out = ctx["C"] * v
    for di in fes.dirs:
        key = f"d{di.d}"
        dm = jnp.expand_dims(ctx[f"tri_dinvm_{key}"], -4)
        lf = jnp.expand_dims(ctx[f"tri_l_{key}"], -4)
        res = fused_schur_dir(
            out, v, dm, lf, di.axis - 3,
            float(di.BX[0, 0, 0]), float(di.BX[1, 0, 0]),
            1.0 / float(di.m_t[0]), interpret=True,
        )
        assert res is not None, f"fused kernel declined direction {di.d}"
        out = res

    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("d", [0, 1])
def test_fused_pre_staged_matches_broadcast_kernel(d):
    """fused_schur_{x,y}_pre (pre-staged solve-constant operands, single-group
    layout) must equal the broadcast kernel / unfused ops, per group."""
    from neutfem_tpu.ops.pallas_fused import fused_schur_x_pre, fused_schur_y_pre
    from neutfem_tpu.power import ctx_group

    mesh, fes, ng, ctx = _problem((16, 32, 64))
    key = f"d{d}"
    tag = "xT" if d == 0 else "yT"
    fn = fused_schur_x_pre if d == 0 else fused_schur_y_pre
    assert f"tri_{tag}_dinvm_{key}" in ctx
    rng = np.random.default_rng(5)
    di = [x for x in fes.dirs if x.d == d][0]
    si = 1.0 / float(di.m_t[0])
    for g in range(ng):
        ctxg = ctx_group(ctx, g)
        v = jnp.asarray(rng.normal(size=(1, *mesh.shape)), DT)
        acc = jnp.asarray(rng.normal(size=(1, *mesh.shape)), DT)
        res = fn(
            acc, v, ctxg[f"tri_{tag}_dinvm_{key}"],
            ctxg[f"tri_{tag}_l_{key}"], float(di.BX[0, 0, 0]),
            float(di.BX[1, 0, 0]), si,
            interpret=True,
        )
        assert res is not None
        dm = jnp.expand_dims(ctxg[f"tri_dinvm_{key}"], -4)
        lf = jnp.expand_dims(ctxg[f"tri_l_{key}"], -4)
        want = fused_schur_dir(acc, v, dm, lf,
                               di.axis - 3,
                               float(di.BX[0, 0, 0]), float(di.BX[1, 0, 0]),
                               si, interpret=True)
        np.testing.assert_allclose(np.asarray(res), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    # batched (multi-group) layouts must decline to the broadcast kernel
    v_all = jnp.zeros((ng, 1, *mesh.shape), DT)
    res = fn(v_all, v_all,
             ctx[f"tri_{tag}_dinvm_{key}"], ctx[f"tri_{tag}_l_{key}"],
             1.0, -1.0, si, interpret=True)
    assert res is None


@pytest.mark.parametrize("mode", ["1", "2"])
def test_eqfold_matches_classic_wrapper(mode, monkeypatch):
    """The equilibration-folded chain must equal the classic wrapper
    sdi * S(sdi*y) per group, in both kernel strategies: mode 1 (the x kernel
    materializes u = sdi*y as a second output) and mode 2 (every kernel
    recomputes u in VMEM)."""
    from neutfem_tpu.ops.apply import (
        eqfold_available,
        equilibrated_schur_matvec,
    )
    from neutfem_tpu.power import ctx_group

    monkeypatch.setenv("NEUTFEM_EQFOLD", mode)
    mesh, fes, ng, ctx = _problem((16, 32, 64))
    rng = np.random.default_rng(11)
    for g in range(ng):
        ctxg = ctx_group(ctx, g)
        y = jnp.asarray(rng.normal(size=(1, *mesh.shape)), DT)
        assert eqfold_available(fes, ctxg, y.shape, y.dtype, "exact",
                                interpret=True)
        got = equilibrated_schur_matvec(fes, ctxg, y, "exact", interpret=True)
        sdi = jnp.sqrt(ctxg["precond_inv"])
        want = sdi * schur_matvec(fes, ctxg, y * sdi, a_mode="exact")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    # gates: small shapes, wrong order, and batched layouts must decline
    assert not eqfold_available(fes, ctx_group(ctx, 0), (1, 3, 4, 8), DT,
                                "exact", interpret=True)
    assert not eqfold_available(fes, ctx_group(ctx, 0), (ng, 1, *mesh.shape), DT,
                                "exact", interpret=True)
    assert not eqfold_available(fes, ctx_group(ctx, 0), (1, *mesh.shape), DT,
                                "diag", interpret=True)
    # mode "0" disables the fold entirely
    monkeypatch.setenv("NEUTFEM_EQFOLD", "0")
    assert not eqfold_available(fes, ctx_group(ctx, 0), (1, *mesh.shape), DT,
                                "exact", interpret=True)


def test_fused_declines_small_shapes():
    mesh, fes, ng, ctx = _problem((3, 4, 8))
    v = jnp.zeros((ng, 1, *mesh.shape), DT)
    di = fes.dirs[0]
    key = f"d{di.d}"
    dm = jnp.expand_dims(ctx[f"tri_dinvm_{key}"], -4)
    lf = jnp.expand_dims(ctx[f"tri_l_{key}"], -4)
    res = fused_schur_dir(v, v, dm, lf, di.axis - 3,
                          1.0, -1.0, 1.0 / float(di.m_t[0]), interpret=True)
    assert res is None


def test_fused_sharded_matches_unfused():
    """The shard_map-wrapped fused kernel (direction orthogonal to the cut) must
    equal the unfused schur contribution — virtual 8-device mesh, interpret mode."""
    import jax
    from neutfem_tpu.ops.apply import _fused_sharded
    from neutfem_tpu.parallel import device_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    # ny = 64 divides the 8-device mesh; cut axis = y (spatial axis 1); sizes
    # chosen so the PER-SHARD local shapes pass the kernel gates for x and z
    mesh, fes, ng, ctx = _problem((32, 64, 64))
    rng = np.random.default_rng(7)
    v = phi_to_internal(jnp.asarray(rng.normal(size=(ng, *mesh.shape, fes.P)), DT))
    want = schur_matvec(fes, ctx, v, a_mode="exact")

    dmesh = device_mesh(8)
    amap = {1: dmesh.axis_names[0]}
    out = ctx["C"] * v
    n_sharded = 0
    for di in fes.dirs:
        key = f"d{di.d}"
        dm = jnp.expand_dims(ctx[f"tri_dinvm_{key}"], -4)
        lf = jnp.expand_dims(ctx[f"tri_l_{key}"], -4)
        res = _fused_sharded((dmesh, amap), out, v,
                             dm, lf, di.axis - 3,
                             float(di.BX[0, 0, 0]), float(di.BX[1, 0, 0]),
                             1.0 / float(di.m_t[0]), interpret=True)
        if di.axis == 1:
            assert res is None  # solve axis on the cut: must decline
        if res is None:
            from neutfem_tpu.ops.apply import apply_B_dir, apply_BT_dir, solve_A_dir

            rF, rW = apply_BT_dir(fes, di, v)
            F, W = solve_A_dir(fes, di, ctx[f"tri_dinv_{key}"],
                               ctx.get(f"tri_l_{key}"), ctx[f"mask_{key}"],
                               ctx[f"alpha_{key}"], rF, rW, "exact")
            out = out + apply_B_dir(fes, di, F, W)
        else:
            n_sharded += 1
            out = res
    assert n_sharded == 2  # x and z went through the sharded fused kernel
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("k", [0, 1, 2])
@pytest.mark.parametrize("pin_kind", [BCKind.MIRROR, BCKind.NEUMANN])
def test_pinned_face_factors_are_zero(k, pin_kind):
    """The invariant BOTH fused kernel families rely on after dropping the
    streamed rhs scale/mask plane (round 3b): wherever the context pins a face
    (mask == 0), the factored off-diagonal OUT of that face (l_f, f < n) and
    its dinv*mask entry are EXACTLY zero, so an un-masked forward-sweep value
    at a pinned face can never reach a valid output (pallas_fused.py /
    pallas_fused_ho.py module docstrings).  context.py guarantees it by
    zeroing offd BEFORE the LDL^T factorization (context.py:263-265); this
    test pins that ordering so a future BC kind cannot silently break the
    kernel math."""
    mesh = CartesianMesh.from_breaks(
        np.linspace(0.0, 8.0, 9), np.linspace(0.0, 7.0, 8),
        np.linspace(0.0, 6.0, 7),
    )
    fes = make_fespace(mesh, k, k)
    ng = 2
    rng = np.random.default_rng(7)
    xs = {
        "D": rng.uniform(0.3, 2.0, (ng, *mesh.shape)),
        "SigR": rng.uniform(0.01, 0.2, (ng, *mesh.shape)),
        "NSF": np.zeros((ng, *mesh.shape)),
        "Chi": np.ones((ng, *mesh.shape)),
        "SigS": np.zeros((ng, ng, *mesh.shape)),
        "SRC": np.zeros((ng, *mesh.shape)),
    }
    # mix pinning and non-pinning kinds so interior entries stay nonzero
    bcs = BCSpec()
    for ax in range(3):
        bcs.set(boundary_attribute(3, ax, False), pin_kind)
        bcs.set(boundary_attribute(3, ax, True),
                BCKind.DIRICHLET if ax != 1 else pin_kind)
    ctx = build_context(fes, ng, xs, bcs, a_mode="exact", dtype=DT)

    pinned_dirs = 0
    for di in fes.dirs:
        key = f"d{di.d}"
        mask = np.asarray(ctx[f"mask_{key}"])
        dinvm = np.asarray(ctx[f"tri_dinvm_{key}"])
        l = np.asarray(ctx[f"tri_l_{key}"])
        fax = di.axis  # 3D mesh: mask is (nz, ny, nx) with n+1 along fax
        n = mask.shape[fax] - 1  # faces 0..n
        pin = (np.moveaxis(mask, fax, 0) == 0.0)
        if not pin.any():
            continue
        pinned_dirs += 1
        # dinvm carries a leading group axis: move ITS face axis forward
        dm_f = np.moveaxis(dinvm, fax + 1, 0)
        l_f = np.moveaxis(l, fax + 1, 0)
        for f in range(n + 1):
            sel = pin[f]
            if not sel.any():
                continue
            assert (dm_f[f][..., sel] == 0.0).all(), (key, f, "dinvm")
            if f < n:
                assert (l_f[f][..., sel] == 0.0).all(), (key, f, "l_f")
    assert pinned_dirs == 3  # every direction had at least one pinned face


def test_fused_x_declines_long_axis_fault_regime(monkeypatch):
    """Fine 2D core meshes (ZION 48x48 is (1, 912, 912)) put the minor solve
    axis beyond the fused x kernels' hardware-validated envelope: a tb = 128
    tile in that regime FAULTS the v5e at runtime (deterministically for a
    ragged final row block, intermittently in-solve even padded + unaliased),
    and the padded form loses to the unfused chain + thin-ts Thomas kernels
    anyway (2.26 vs 1.79 s full ZION solve).  Pin the decline BOTH ways: the
    gates must return None at these shapes (never re-open the fault regime),
    and the production dispatch must still match the unfused reference through
    the Thomas kernels (round 4)."""
    from neutfem_tpu.ops.pallas_fused import _tiles, fused_fits

    assert _tiles((1, 912, 912), jnp.float32, 2) is None    # ZION 48x48
    assert _tiles((1, 1216, 1216), jnp.float32, 2) is None  # ZION 64x64
    assert not fused_fits((1, 912, 912), jnp.float32, 2, interpret=True)
    assert not fused_fits((1, 912, 912), jnp.float32, 1, interpret=True)
    # the historical envelope stays engaged
    assert _tiles((2, 152, 152, 114), jnp.float32, 2) is not None

    ny, nx = 520, 897
    rng = np.random.default_rng(7)
    mesh = CartesianMesh.from_breaks(
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, nx))]),
        np.concatenate([[0.0], np.cumsum(rng.uniform(0.8, 1.4, ny))]),
    )
    fes = make_fespace(mesh, 0, 0)
    ng = 1
    xs = {
        "D": rng.uniform(0.3, 2.0, (ng, *mesh.shape)),
        "SigR": rng.uniform(0.01, 0.2, (ng, *mesh.shape)),
        "NSF": np.zeros((ng, *mesh.shape)), "Chi": np.ones((ng, *mesh.shape)),
        "SigS": np.zeros((ng, ng, *mesh.shape)), "SRC": np.zeros((ng, *mesh.shape)),
    }
    bcs = BCSpec()
    for ax in (0, 1):
        for upper in (False, True):
            bcs.set(boundary_attribute(2, ax, upper), BCKind.DIRICHLET)
    ctx = build_context(fes, ng, xs, bcs, a_mode="exact", dtype=DT)
    v = phi_to_internal(jnp.asarray(rng.normal(size=(ng, *mesh.shape, fes.P)), DT))

    assert _tiles(v.shape, DT, 2) is None  # dispatch-visible shape declines too
    want = schur_matvec(fes, ctx, v, a_mode="exact", fused=False)
    # production dispatch: fused x/y decline, the thin-ts/transpose Thomas
    # kernels carry both directions through the unfused chain
    monkeypatch.setenv("NEUTFEM_PALLAS_INTERPRET", "1")
    got = schur_matvec(fes, ctx, v, a_mode="exact")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

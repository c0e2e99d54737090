"""Higher-order fused Schur kernel (ops/pallas_fused_ho.py) vs the unfused
condensed ops, interpret mode on CPU (the CPU suite never runs Mosaic, so
kernel math MUST be interpret-tested — verify-skill rule)."""

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
        return (cg[f"hoyT_mask_{key}"], cg[f"tri_hoyT_dinvm_{key}"],
                cg[f"tri_hoyT_l_{key}"], cg[f"tri_hoyT_alpha_{key}"])
    if di.axis == 2 and f"tri_hoxT_dinvm_{key}" in cg:
        return (cg[f"hoxT_mask_{key}"], cg[f"tri_hoxT_dinvm_{key}"],
                cg[f"tri_hoxT_l_{key}"], cg[f"tri_hoxT_alpha_{key}"])
    return (cg[f"mask_{key}"], cg[f"tri_dinvm_{key}"], cg[f"tri_l_{key}"],
            cg[f"alpha_{key}"])


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

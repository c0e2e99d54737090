"""Multi-chip SPMD correctness on the virtual 8-device CPU mesh (conftest):
the sharded solve must reproduce the single-device eigenvalue and flux."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neutfem_tpu import config
from neutfem_tpu.parallel import (
    device_mesh,
    shard_context,
    shard_state,
    sharded_power_iteration,
)
from neutfem_tpu.ops.context import build_context
from neutfem_tpu.power import SolveOptions, power_iteration
from neutfem_tpu.fespace import make_fespace

from test_cmfd_coarse import build_het_problem

DT = config.real_dtype


@pytest.fixture(scope="module")
def problem():
    # ny = 16 divides the 8-device mesh
    mesh, fes, ng, xs, bcs = build_het_problem(nx=12, ny=16)
    ctx = build_context(fes, ng, xs, bcs, a_mode="exact", dtype=DT)
    phi0 = jnp.ones((ng, *mesh.shape, fes.P), dtype=DT)
    return mesh, fes, ng, ctx, phi0


def test_sharded_solve_matches_single_device(problem):
    mesh, fes, ng, ctx, phi0 = problem
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    opts = SolveOptions(tol_keff=1e-9, tol_flux=1e-8, inner_tol=1e-11)

    res_single = power_iteration(fes, ng, opts, ctx, phi0, 1.0)

    dmesh = device_mesh(8)
    ctx_sh = shard_context(ctx, dmesh, fes, grid_axis=1)
    phi_sh = shard_state(phi0, dmesh, grid_axis=1)
    run, _ = sharded_power_iteration(fes, ng, opts, dmesh, grid_axis=1)
    res_sh = run(ctx_sh, phi_sh, 1.0)

    assert float(res_sh["keff"]) == pytest.approx(float(res_single["keff"]), abs=1e-10)
    np.testing.assert_allclose(np.asarray(res_sh["phi"]), np.asarray(res_single["phi"]),
                               rtol=1e-8, atol=1e-12)
    # the flux really lives distributed over all 8 devices
    assert len(res_sh["phi"].devices()) == 8


def test_sharded_adjoint_and_orders(problem):
    """Sharding must also hold for RT1-P1 (bubble grids) — compile + one step."""
    mesh, _, ng, _, _ = problem
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from neutfem_tpu.bc import BCKind, BCSpec
    from neutfem_tpu.mesh import boundary_attribute

    _, fes1, ng, xs, bcs = build_het_problem(nx=8, ny=16, k=1, m=1)
    ctx = build_context(fes1, ng, xs, bcs, a_mode="exact", dtype=DT)
    phi0 = jnp.ones((ng, *fes1.mesh.shape, fes1.P), dtype=DT)
    opts = SolveOptions(tol_keff=1e-6, tol_flux=1e-5, inner_tol=1e-8, max_outer=3,
                        max_inner=40)

    dmesh = device_mesh(8)
    ctx_sh = shard_context(ctx, dmesh, fes1, grid_axis=1)
    phi_sh = shard_state(phi0, dmesh, grid_axis=1)
    run, _ = sharded_power_iteration(fes1, ng, opts, dmesh, grid_axis=1)
    res = run(ctx_sh, phi_sh, 1.0)
    assert np.isfinite(float(res["keff"]))
    assert len(res["phi"].devices()) == 8

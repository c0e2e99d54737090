"""Checkpoint/resume + health-guard tests for the compat layer."""

import warnings

import numpy as np
import pytest

from neutfem import BCType, NeutFEM, VerbosityLevel

from test_compat_api import fill_uniform_xs, make_solver_2d


def test_save_load_roundtrip(tmp_path):
    n = 6
    s = make_solver_2d(n)
    for bid in (1, 2, 3, 4):
        s.set_bc(bid, BCType.DIRICHLET)
    fill_uniform_xs(s, n)
    s.BuildMatrices()
    s.set_tol(1e-7, 1e-6, 1e-8)
    k = s.SolveKeff()
    s.SolveAdjoint()
    path = str(tmp_path / "state.npz")
    s.save_state(path)

    s2 = make_solver_2d(n)
    for bid in (1, 2, 3, 4):
        s2.set_bc(bid, BCType.DIRICHLET)
    fill_uniform_xs(s2, n)
    s2.BuildMatrices()
    s2.load_state(path)
    assert s2.GetLastKeff() == pytest.approx(k)
    np.testing.assert_allclose(s2.get_flux(), s.get_flux(), rtol=1e-12)
    np.testing.assert_allclose(s2.get_flux_adj(), s.get_flux_adj(), rtol=1e-12)

    # warm restart from the checkpoint converges immediately
    s2.set_tol(1e-7, 1e-6, 1e-8)
    k2 = s2.SolveKeff()
    assert k2 == pytest.approx(k, abs=1e-7)
    assert s2._last_outers <= 5


def test_supercritical_source_warns():
    """The health guard must flag the ill-posed supercritical fixed-source case
    (previously it silently returned ~1e17 flux)."""
    n = 6
    s = make_solver_2d(n)
    for bid in (1, 2, 3, 4):
        s.set_bc(bid, BCType.DIRICHLET)
    fill_uniform_xs(s, n)
    s.get_NSF()[:] = 4.0 * s.get_NSF()  # push well supercritical
    s.get_SRC()[0, 3, 3] = 1.0
    s.BuildMatrices()
    s.set_tol(1e-6, 1e-7, 1e-9, 120)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s.SolveSubcritical()
    assert any(issubclass(x.category, RuntimeWarning) for x in w), [str(x.message) for x in w]

"""Pallas Thomas kernel vs the associative_scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neutfem_tpu import config
from neutfem_tpu.ops.pallas_tridiag import thomas_solve
from neutfem_tpu.ops.tridiag import tridiag_factor, tridiag_solve

DT = config.real_dtype


@pytest.mark.parametrize("n,batch,axis", [(13, (7, 90), 0), (33, (4, 3, 50), 1)])
def test_thomas_matches_scan(n, batch, axis):
    rng = np.random.default_rng(3)
    shape = list(batch)
    shape.insert(axis, n)
    diag = jnp.asarray(rng.uniform(2.0, 3.0, shape), DT)
    off_shape = list(shape)
    off_shape[axis] = n - 1
    off = jnp.asarray(rng.uniform(-0.5, 0.5, off_shape), DT)
    rhs = jnp.asarray(rng.normal(size=shape), DT)

    dinv, l = tridiag_factor(diag, off, axis=axis)
    want = tridiag_solve(rhs, dinv, l, axis=axis)
    got = thomas_solve(rhs, dinv, l, axis=axis, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-12, atol=5e-13)


def test_thomas_broadcast_trailing_mode():
    """solve_A_dir broadcasts dinv/l over a trailing transverse-mode axis."""
    rng = np.random.default_rng(4)
    n, ny, T = 17, 40, 3
    diag = jnp.asarray(rng.uniform(2.0, 3.0, (ny, n)), DT)
    off = jnp.asarray(rng.uniform(-0.4, 0.4, (ny, n - 1)), DT)
    rhs = jnp.asarray(rng.normal(size=(ny, n, T)), DT)
    dinv, l = tridiag_factor(diag, off, axis=-1)
    want = tridiag_solve(rhs, dinv[..., None], l[..., None], axis=1)
    got = thomas_solve(rhs, dinv[..., None], l[..., None], axis=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-12, atol=5e-13)

"""Fused block-Jacobi apply + CG reductions (ops/pallas_blockjac.py).

Interpret-mode equality vs the XLA einsum + separate dots (the CPU suite never
runs Mosaic — kernel math must be pinned here), engagement-gate declines, and
the krylov plumbing (pcg with precond_dots == pcg with precond).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from neutfem_tpu.ops.pallas_blockjac import blockjac_dots, blockjac_fits

DT = jnp.float32


def _ref(bi, r):
    z = jnp.einsum("pqabc,...qabc->...pabc", bi.astype(DT), r)
    return z, jnp.vdot(r, z).real, jnp.vdot(r, r).real


@pytest.mark.parametrize("P,shape", [(8, (6, 89, 114)), (4, (1, 520, 64)),
                                     (27, (2, 256, 70))])
@pytest.mark.parametrize("bi_dtype", [jnp.float32, jnp.bfloat16])
def test_blockjac_matches_einsum(P, shape, bi_dtype):
    rng = np.random.default_rng(7)
    bi = jnp.asarray(rng.normal(size=(P, P, *shape)), bi_dtype)
    r = jnp.asarray(rng.normal(size=(1, P, *shape)), DT)
    assert blockjac_fits(P, shape, DT, bi_dtype, interpret=True)
    out = blockjac_dots(bi, r, interpret=True)
    assert out is not None
    z, rz, rr = out
    zr, rzr, rrr = _ref(bi, r)
    tol = 2e-2 if bi_dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(z), np.asarray(zr), rtol=tol, atol=tol)
    # the reductions are masked against tile padding garbage; tolerance is
    # f32 reassociation noise on a near-cancelling ~500k-term sum (a masking
    # bug would show up orders of magnitude larger via padding garbage)
    np.testing.assert_allclose(float(rz), float(rzr), rtol=2e-3)
    np.testing.assert_allclose(float(rr), float(rrr), rtol=2e-3)


def test_blockjac_gates():
    assert not blockjac_fits(1, (6, 11, 114), DT, DT)            # P < 2
    assert not blockjac_fits(8, (2, 4, 114), DT, DT)             # rows < 512
    assert not blockjac_fits(8, (6, 11, 32), DT, DT)             # nx < 64
    assert not blockjac_fits(8, (6, 11, 114), jnp.float64, DT)   # f64 r
    rng = np.random.default_rng(3)
    bi = jnp.asarray(rng.normal(size=(8, 8, 2, 4, 114)), DT)
    r = jnp.asarray(rng.normal(size=(1, 8, 2, 4, 114)), DT)
    assert blockjac_dots(bi, r) is None                          # declines
    # batched leading dims decline (the kernel handles exactly one group)
    r2 = jnp.asarray(rng.normal(size=(2, 8, 6, 11, 114)), DT)
    bi2 = jnp.asarray(rng.normal(size=(8, 8, 6, 11, 114)), DT)
    assert blockjac_dots(bi2, r2, interpret=True) is None


def test_pcg_precond_dots_plumbing():
    """pcg(precond_dots=...) must equal pcg(precond=...) exactly in structure:
    same iterates when the fused callable returns the same (z, rz, rr)."""
    from neutfem_tpu.krylov import pcg

    rng = np.random.default_rng(11)
    n = 64
    A = rng.normal(size=(n, n))
    A = jnp.asarray(A @ A.T + n * np.eye(n), jnp.float64)
    b = jnp.asarray(rng.normal(size=n), jnp.float64)
    Minv = jnp.asarray(np.diag(1.0 / np.diag(A)), jnp.float64)
    mv = lambda x: A @ x
    pc = lambda r: Minv @ r

    def pc_dots(r):
        z = Minv @ r
        return z, jnp.vdot(r, z).real, jnp.vdot(r, r).real

    a = pcg(mv, b, jnp.zeros(n, jnp.float64), precond=pc, tol=1e-12, maxiter=300)
    c = pcg(mv, b, jnp.zeros(n, jnp.float64), precond_dots=pc_dots, tol=1e-12,
            maxiter=300)
    assert int(a.iterations) == int(c.iterations)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(c.x), rtol=1e-12)

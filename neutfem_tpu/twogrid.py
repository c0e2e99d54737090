"""Additive two-grid preconditioner for the Schur CG group solves.

Motivation (round-3 VERDICT Next #3): the equilibrated Schur CG's iteration
count grows ~h^-1 under mesh refinement (inners/outer 31 -> 43 -> 39(line)
across 988k/2.6M/3.5M IAEA-3D cells); Jacobi equilibration and the line
preconditioner only damp the growth.  A coarse-grid correction targets the
smooth error components CG resolves slowly.  The reference's answers to the
same problem are CMFD and coarse-grid *initialization*
(/root/reference/src/NeutFEM.cpp:662-1017, 2380-2611) — both outer-level
devices; this is an inner-level preconditioner, built TPU-native from the
machinery that already exists (``coarse.coarsen_xs`` + the RT0-P0 Schur
matvec, fused Pallas kernels included when the coarse shapes pass the gates).

Design — chosen so plain CG remains valid (the preconditioner must be a FIXED
SPD linear operator):

    M^-1 = B_fine  +  E_f P E_c p_k(S_c_eq) E_c P^T E_f

* ``B_fine``: the existing fine-level preconditioner (identity on the
  equilibrated RT0 system; the P x P block-Jacobi for higher orders) —
  the *additive* two-level form costs ZERO extra fine matvecs per CG
  iteration, unlike a multiplicative V-cycle (2 extra fine matvecs each).
* ``P``: piecewise-constant prolongation into the fine P_0 mode (higher modes
  untouched — the coarse space only needs the smooth components); ``P^T`` is
  the exact transpose (sum over child cells of the mode-0 residual), so the
  correction term is E^T p_k E with p_k SPD => SPD.
* ``E_f = diag(S_fine)^{1/2}`` / ``E_c = diag(S_c)^{-1/2}``: the solves run on
  symmetrically equilibrated systems (power.group_solve), so the correction
  maps equilibrated-fine residual -> unscaled -> coarse-equilibrated and back.
* ``p_k(S_c_eq)``: degree-k Chebyshev polynomial approximation of the coarse
  equilibrated Schur inverse on [lmax/kappa, lmax] — a fixed-degree polynomial
  in an SPD operator is itself SPD (1 - lambda p(lambda) = q(lambda) with
  q(lambda) < 1 for all lambda > 0), unlike a nested CG solve which would make
  the preconditioner nonlinear and break CG.  lmax is estimated per group by
  power iteration at build time; each application costs k coarse Schur matvecs
  (= k / (fz*fy*fx) fine-matvec equivalents).
* The coarse operator is the REDISCRETIZED RT0-P0 Schur on volume-averaged XS
  (coarsen_xs), not a Galerkin triple product: for piecewise-constant coarse
  spaces on tensor meshes the two agree to the usual mixed-FEM averaging error,
  and rediscretization reuses build_context verbatim (factors built once).

Under spatial sharding the correction declines (group_solve falls back to the
fine preconditioner alone — same fixed point, only iteration counts change).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fespace import FESpace, make_fespace
from .mesh import CartesianMesh

__all__ = ["attach_twogrid", "coarse_fespace", "twogrid_correction",
           "default_tg_factors"]


def default_tg_factors(mesh: CartesianMesh, max_factor: int = 4) -> Tuple[int, int, int]:
    """Largest factor <= max_factor dividing each active axis (same convention as
    coarse.default_coarse_factors; factor 4 keeps the coarse matvec at ~1/64 of
    the fine cost in 3D so a degree-8 Chebyshev costs ~1/8 fine matvec)."""
    from .coarse import default_coarse_factors

    return default_coarse_factors(mesh, max_factor)


def coarse_fespace(fes: FESpace, factors: Tuple[int, int, int]) -> FESpace:
    """The RT0-P0 space on the subsampled mesh (static / trace-time)."""
    mesh = fes.mesh
    fx, fy, fz = factors
    xb = mesh.x_breaks[::fx]
    yb = mesh.y_breaks[::fy] if mesh.dim >= 2 else None
    zb = mesh.z_breaks[::fz] if mesh.dim == 3 else None
    return make_fespace(CartesianMesh.from_breaks(xb, yb, zb), 0, 0)


def _estimate_lmax(cfes: FESpace, cctx: Dict, ng: int, dtype, iters: int = 30):
    """Per-group largest eigenvalue of the equilibrated coarse Schur, by power
    iteration (build-time, one jit).  Returned with a 5% safety margin so the
    Chebyshev interval upper end bounds the true spectrum."""
    from .ops.apply import schur_matvec

    sdi = jnp.sqrt(cctx["precond_inv"])  # (ng, 1, nz, ny, nx)

    def matvec(v):
        return sdi * schur_matvec(cfes, cctx, v * sdi, a_mode="exact")

    def step(v, _):
        w = matvec(v)
        nrm = jnp.sqrt(jnp.sum(w * w, axis=(-4, -3, -2, -1), keepdims=True))
        return w / jnp.maximum(nrm, jnp.finfo(dtype).tiny), nrm

    @jax.jit
    def run(v0):
        v, nrms = jax.lax.scan(step, v0, None, length=iters)
        return nrms[-1].reshape(ng)

    key_free = jnp.arange(np.prod(sdi.shape), dtype=dtype).reshape(sdi.shape)
    v0 = jnp.ones(sdi.shape, dtype) + 0.01 * jnp.sin(key_free)  # deterministic, non-smooth
    return run(v0) * 1.05


def attach_twogrid(
    fes: FESpace,
    ng: int,
    xs: Dict[str, np.ndarray],
    bcs,
    ctx: Dict,
    factors: Tuple[int, int, int] = None,
    dtype=None,
    marshak_d_factor: bool = False,
) -> Dict:
    """Build the coarse context + spectral bounds and attach them as ctx["tg"].

    The nested dict holds a full build_context output (so power.ctx_group can
    recurse into it with the same key-prefix rules) plus "schur_lmax" (ng,).
    """
    from .coarse import coarsen_xs
    from .ops.context import build_context

    mesh = fes.mesh
    if factors is None:
        factors = default_tg_factors(mesh)
    if all(f == 1 for f in factors):
        return ctx  # no coarsening possible — leave ctx untouched (declines)
    cmesh, cxs = coarsen_xs(mesh, xs, factors)
    cfes = make_fespace(cmesh, 0, 0)
    cctx = build_context(cfes, ng, cxs, bcs, a_mode="exact", dtype=dtype,
                         marshak_d_factor=marshak_d_factor)
    lmax = _estimate_lmax(cfes, cctx, ng, dtype or ctx["C"].dtype)
    ctx["tg"] = {**cctx, "schur_lmax": lmax}
    return ctx


def tg_factors_of(fes: FESpace, ctx_tg: Dict) -> Tuple[int, int, int]:
    """(fx, fy, fz) recovered statically from the coarse array shapes."""
    nzc, nyc, nxc = ctx_tg["C"].shape[-3:]
    nz, ny, nx = fes.mesh.shape
    return nx // nxc, ny // nyc, nz // nzc


def twogrid_correction(fes: FESpace, ctxg: Dict, opts, r):
    """The coarse-correction term  E_f P E_c p_k(S_c_eq) E_c P^T E_f r.

    ``r`` is the equilibrated fine residual, internal layout
    (..., P, nz, ny, nx); ``ctxg`` may be group-sliced (GS sweep) or carry a
    leading group axis (batched Jacobi sweep) — every step broadcasts.
    Returns the correction in the same shape (caller adds the fine-level part).
    """
    tg = ctxg["tg"]
    factors = tg_factors_of(fes, tg)
    fx, fy, fz = factors
    cfes = coarse_fespace(fes, factors)

    inv_sdi_f = 1.0 / jnp.sqrt(ctxg["precond_inv"])     # E_f = diag(S_f)^{1/2}
    sdi_c = jnp.sqrt(tg["precond_inv"])                  # E_c = diag(S_c)^{-1/2}

    # restrict: mode-0 plane, unscale, sum over (fz, fy, fx) children
    r0 = (r * inv_sdi_f)[..., 0, :, :, :]
    s = r0.shape
    rc = r0.reshape(*s[:-3], s[-3] // fz, fz, s[-2] // fy, fy, s[-1] // fx, fx)
    rc = rc.sum(axis=(-5, -3, -1))[..., None, :, :, :]   # (..., 1, nzc, nyc, nxc)
    rc = rc * sdi_c

    # degree-k Chebyshev approximate inverse of the equilibrated coarse Schur on
    # [lmax/kappa, lmax] (classical three-term recurrence; z0 = 0, k matvecs)
    from .ops.apply import schur_matvec

    lmax = tg["schur_lmax"]
    if lmax.ndim == 1:  # batched (leading ng): broadcast over (1, nz, ny, nx)
        lmax = lmax.reshape(-1, 1, 1, 1, 1)
    lmin = lmax / opts.tg_kappa
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def matvec(v):
        return sdi_c * schur_matvec(cfes, tg, v * sdi_c, a_mode="exact")

    d = rc / theta
    zc = d
    res = rc - matvec(d)
    rho = 1.0 / sigma
    for _ in range(max(opts.tg_degree - 1, 0)):
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * res
        zc = zc + d
        res = res - matvec(d)
        rho = rho_new

    # prolong: coarse-equilibrate back, replicate into the fine P_0 mode, rescale
    zc = (zc * sdi_c)[..., 0, :, :, :]
    z0 = jnp.repeat(jnp.repeat(jnp.repeat(zc, fz, axis=-3), fy, axis=-2), fx, axis=-1)
    out = jnp.zeros_like(r)
    out = out.at[..., 0, :, :, :].set(z0)
    return out * inv_sdi_f

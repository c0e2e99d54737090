"""Coarse-mesh finite-difference (CMFD) nonlinear acceleration, fully on-device.

TPU-native rebuild of the reference CMFD (``/root/reference/src/NeutFEM.cpp:662-1017``)
with two documented improvements (SURVEY §7.4):

* D-hat is computed for ALL active directions (the reference only implements X faces —
  NeutFEM.cpp:866-867 leaves Y/Z zero);
* the low-order rhs includes the scattering source (the reference's comment promises
  "fission + scattering" but the code only adds fission, NeutFEM.cpp:988-990).  With
  both fixes the fine mixed-FEM solution is an *exact* fixed point of the CMFD system,
  so the multiplicative correction ratio tends to 1 at convergence.

Shared conventions with the reference:

* Dtilde per face: interior ``2 D_L D_R / (D_L h_R + D_R h_L)``; boundary ``2D/h``
  (NeutFEM.cpp:714-809) — precomputed in ``ops.context.build_context``.
* Dhat = J_face / (phi_L - phi_R) - Dtilde, zero-guarded at |dphi| < 1e-14, with
  phi = 0 outside the domain (NeutFEM.cpp:836-860).  At a MIRROR boundary the fine
  J is 0 so Dhat = -Dtilde and the effective coupling vanishes — no special-casing.
* Low-order 7-point operator: diag ``Sigr V + sum_f (Dtilde+Dhat) A_f``, off-diagonal
  ``-(Dtilde+Dhat) A_f`` (NeutFEM.cpp:897-975), solved by CG (tol 1e-8, 100 iters).
* Correction: elementwise ratio clipped to [0.5, 2.0], relaxed by omega, applied to
  every local mode of the element (NeutFEM.cpp:994-1016).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from jax import lax

from .fespace import FESpace
from .krylov import pcg

__all__ = ["cmfd_correction"]


def _face_currents(fes: FESpace, ctx: Dict, J) -> Dict[str, jnp.ndarray]:
    """Physical cell-average normal current density per face and direction (all groups):
    the t=0 transverse mode of the face DOF grid times the Piola scale jac_d/detJ."""
    out = {}
    for di in fes.dirs:
        key = f"d{di.d}"
        out[key] = J[key]["face"][..., 0] * ctx[f"jscale_{key}"]
    return out


def _neighbor_pad(ctx, key, x, ax):
    """Pad x with its out-of-domain neighbors along ax: zeros for a bounded
    direction, wrap-around for a PERIODIC one (cyc_* context data present)."""
    if f"cyc_wt_{key}" in ctx:
        n = x.shape[ax]
        lo = lax.slice_in_dim(x, n - 1, n, axis=ax)
        hi = lax.slice_in_dim(x, 0, 1, axis=ax)
        return jnp.concatenate([lo, x, hi], axis=ax)
    zero = jnp.zeros_like(lax.slice_in_dim(x, 0, 1, axis=ax))
    return jnp.concatenate([zero, x, zero], axis=ax)


def _deff(fes: FESpace, ctx: Dict, phi_bar, j_phys) -> Dict[str, jnp.ndarray]:
    """Dtilde + Dhat per face per group.  phi_bar: (ng, nz, ny, nx) cell averages."""
    out = {}
    for di in fes.dirs:
        key = f"d{di.d}"
        ax = di.axis + 1  # group axis in front
        padded = _neighbor_pad(ctx, key, phi_bar, ax)
        n = padded.shape[ax]
        # dphi at face f = phi_L - phi_R with phi outside = 0 (NeutFEM.cpp:840-855)
        dphi = lax.slice_in_dim(padded, 0, n - 1, axis=ax) - lax.slice_in_dim(
            padded, 1, n, axis=ax
        )
        dtilde = ctx[f"dtilde_{key}"]
        small = jnp.abs(dphi) <= 1e-14
        dhat = jnp.where(small, 0.0, j_phys[key] / jnp.where(small, 1.0, dphi) - dtilde)
        out[key] = dtilde + dhat
    return out


def _lo_matvec(fes: FESpace, ctx: Dict, deff: Dict, x):
    """Low-order CMFD operator on (ng, nz, ny, nx) cell grids (all groups batched)."""
    out = ctx["sigr"] * ctx["vol"] * x
    for di in fes.dirs:
        key = f"d{di.d}"
        ax = di.axis + 1
        xp = _neighbor_pad(ctx, key, x, ax)
        n = xp.shape[ax]
        x_left = lax.slice_in_dim(xp, 0, n - 2, axis=ax)
        x_right = lax.slice_in_dim(xp, 2, n, axis=ax)
        nf = deff[key].shape[ax]
        d_left = lax.slice_in_dim(deff[key], 0, nf - 1, axis=ax)
        d_right = lax.slice_in_dim(deff[key], 1, nf, axis=ax)
        out = out + ctx[f"area_{key}"] * (d_left * (x - x_left) + d_right * (x - x_right))
    return out


def cmfd_correction(
    fes: FESpace,
    ctx: Dict,
    phi,
    J,
    keff,
    omega: float = 1.0,
    tol: float = 1e-8,
    maxiter: int = 100,
):
    """One CMFD correction: solve the low-order system at the current (phi, J, keff)
    and return the per-element multiplicative correction factor (ng, nz, ny, nx).

    phi: (ng, nz, ny, nx, P) fine flux after the group sweep; J: current dict.
    """
    ng = phi.shape[0]
    phi_bar = phi[..., 0]  # P_0 mode = cell average (Legendre normalization)
    j_phys = _face_currents(fes, ctx, J)
    deff = _deff(fes, ctx, phi_bar, j_phys)

    # low-order rhs: chi_g/k * total fission + in-scatter, volume-weighted
    fiss = jnp.sum(ctx["nsf"] * phi_bar, axis=0) * ctx["vol"]  # (nz, ny, nx)
    rhs = ctx["chi"] * fiss[None] / keff
    scat = jnp.einsum("gh...,h...->g...", ctx["sigs"], phi_bar) - jnp.einsum(
        "gg...,g...->g...", ctx["sigs"], phi_bar
    )
    rhs = rhs + scat * ctx["vol"]

    res = pcg(
        lambda v: _lo_matvec(fes, ctx, deff, v),
        rhs,
        phi_bar,
        precond=lambda r: r / (ctx["sigr"] * ctx["vol"] + 1e-30),
        tol=tol,
        maxiter=maxiter,
    )
    phi_lo = res.x

    safe = jnp.abs(phi_bar) > 1e-14
    ratio = jnp.where(safe, phi_lo / jnp.where(safe, phi_bar, 1.0), 1.0)
    ratio = jnp.clip(ratio, 0.5, 2.0)
    return omega * ratio + (1.0 - omega)

"""Krylov solvers in ``lax.while_loop`` form (fully on-device, no host round-trips).

TPU-native replacement for the reference's Eigen solver zoo and its hand-written
unpreconditioned implicit-Schur CG (``/root/reference/src/solvers.cpp:577-636``).  The
Schur complement is SPD, so preconditioned CG is the workhorse; BiCGSTAB is provided for
API parity with ``LinearSolverType`` (solvers.hpp:176-190) and for non-symmetric
operators.

Stopping rule matches the reference: ``||r||^2 < tol^2 ||b||^2`` (solvers.cpp:592, 620).
Operands can be arbitrary pytrees; dot products reduce over everything.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pcg", "bicgstab", "KrylovResult"]


def _dot(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def _axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: yi + alpha * xi, x, y)


class KrylovResult(NamedTuple):
    x: object
    iterations: jnp.ndarray
    residual: jnp.ndarray  # ||r|| / ||b||


def pcg(
    matvec: Callable,
    rhs,
    x0,
    precond: Optional[Callable] = None,
    tol: float = 1e-10,
    maxiter: int = 1000,
) -> KrylovResult:
    """Preconditioned conjugate gradient on an SPD operator."""
    if precond is None:
        precond = lambda r: r

    b_norm_sq = _dot(rhs, rhs).real
    tol_sq = tol * tol * b_norm_sq
    # b = 0 has the unique solution x = 0, but a nonzero warm start makes the
    # relative stopping rule ||r||^2 < tol^2 ||b||^2 = 0 unreachable (runs to
    # maxiter; NaNs under TPU-emulated f64).  The reference never hits this
    # (it cold-starts from zero, solvers.cpp:585); we warm-start, so guard.
    zero_rhs = b_norm_sq == 0.0

    r0 = jax.tree_util.tree_map(lambda b, ax: b - ax, rhs, matvec(x0))
    z0 = precond(r0)
    rz0 = _dot(r0, z0).real
    rr0 = _dot(r0, r0).real

    def cond(state):
        _, _, _, _, rr, _, it = state
        return jnp.logical_and(jnp.logical_and(it < maxiter, rr > tol_sq),
                               jnp.logical_not(zero_rhs))

    def body(state):
        x, r, z, p, rr, rz, it = state
        q = matvec(p)
        pq = _dot(p, q).real
        alpha = rz / jnp.where(jnp.abs(pq) < 1e-300, 1.0, pq)
        alpha = jnp.where(jnp.abs(pq) < 1e-300, 0.0, alpha)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, q, r)
        z = precond(r)
        rz_new = _dot(r, z).real
        rr_new = _dot(r, r).real
        beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
        p = _axpy(beta, p, z)
        return (x, r, z, p, rr_new, rz_new, it + 1)

    x, r, _, _, rr, _, it = lax.while_loop(
        cond, body, (x0, r0, z0, z0, rr0, rz0, jnp.asarray(0, dtype=jnp.int32))
    )
    x = jax.tree_util.tree_map(lambda xi: jnp.where(zero_rhs, 0.0, xi), x)
    rr = jnp.where(zero_rhs, 0.0, rr)
    denom = jnp.sqrt(jnp.where(b_norm_sq == 0.0, 1.0, b_norm_sq))
    return KrylovResult(x=x, iterations=it, residual=jnp.sqrt(rr) / denom)


def bicgstab(
    matvec: Callable,
    rhs,
    x0,
    precond: Optional[Callable] = None,
    tol: float = 1e-10,
    maxiter: int = 1000,
) -> KrylovResult:
    """Right-preconditioned BiCGSTAB (works for non-symmetric operators)."""
    if precond is None:
        precond = lambda r: r

    b_norm_sq = _dot(rhs, rhs).real
    tol_sq = tol * tol * b_norm_sq
    zero_rhs = b_norm_sq == 0.0  # see pcg: warm start + zero rhs never converges

    r0 = jax.tree_util.tree_map(lambda b, ax: b - ax, rhs, matvec(x0))
    rhat = r0
    rr0 = _dot(r0, r0).real

    def cond(state):
        _, _, _, _, _, _, _, rr, it, brk = state
        return (it < maxiter) & (rr > tol_sq) & (~brk) & (~zero_rhs)

    def body(state):
        x, r, p, v, rho, alpha, omega, rr, it, brk = state
        rho_new = _dot(rhat, r)
        safe_rho = jnp.where(rho == 0, 1.0, rho)
        safe_omega = jnp.where(omega == 0, 1.0, omega)
        beta = (rho_new / safe_rho) * (alpha / safe_omega)
        p = jax.tree_util.tree_map(lambda ri, pi, vi: ri + beta * (pi - omega * vi), r, p, v)
        phat = precond(p)
        v = matvec(phat)
        rv = _dot(rhat, v)
        alpha_new = rho_new / jnp.where(rv == 0, 1.0, rv)
        s = _axpy(-alpha_new, v, r)
        shat = precond(s)
        t = matvec(shat)
        tt = _dot(t, t).real
        omega_new = _dot(t, s).real / jnp.where(tt == 0, 1.0, tt)
        x = _axpy(alpha_new, phat, _axpy(omega_new, shat, x))
        r = _axpy(-omega_new, t, s)
        rr_new = _dot(r, r).real
        breakdown = (jnp.abs(rho_new) < 1e-300) | (tt == 0)
        return (x, r, p, v, rho_new, alpha_new, omega_new, rr_new, it + 1, breakdown)

    one = jnp.asarray(1.0, dtype=jnp.result_type(rr0))
    x, r, _, _, _, _, _, rr, it, _ = lax.while_loop(
        cond,
        body,
        (x0, r0, r0, jax.tree_util.tree_map(jnp.zeros_like, r0), one, one, one, rr0,
         jnp.asarray(0, dtype=jnp.int32), jnp.asarray(False)),
    )
    x = jax.tree_util.tree_map(lambda xi: jnp.where(zero_rhs, 0.0, xi), x)
    rr = jnp.where(zero_rhs, 0.0, rr)
    denom = jnp.sqrt(jnp.where(b_norm_sq == 0.0, 1.0, b_norm_sq))
    return KrylovResult(x=x, iterations=it, residual=jnp.sqrt(rr) / denom)

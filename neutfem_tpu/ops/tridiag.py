"""Batched symmetric tridiagonal solves, TPU-style.

The reference solves its per-direction RT mass systems implicitly inside Eigen's sparse
LU (``/root/reference/src/solvers.cpp:157-167``), re-factorizing every group solve.  Here
the per-direction A blocks are *exactly* tridiagonal along mesh lines (after bubble
condensation), so we:

* factorize once per (group, direction) with a sequential ``lax.scan`` (cheap, amortized
  over the whole power iteration), and
* apply forward/backward substitution with ``lax.associative_scan`` — both substitutions
  are first-order affine recurrences, so they run in O(log n) depth, fully parallel over
  the (groups x lines x transverse-modes) batch.  This is the TPU-native replacement for
  the unused serial ``ThomasSolver`` of the reference (solvers.cpp:940-989).

All functions operate along a caller-chosen axis; every other axis is batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["tridiag_factor", "tridiag_solve", "affine_scan"]


def tridiag_factor(diag, off, axis: int = -1):
    """LDL^T factorization of SPD tridiagonal systems along `axis`.

    diag: (..., n, ...) main diagonal; off: (..., n-1, ...) sub/super diagonal.
    Returns (dinv, l): 1/pivots (..., n, ...) and multipliers (..., n-1, ...).

    Recurrence: d_0 = a_0;  l_i = b_i / d_i;  d_{i+1} = a_{i+1} - b_i * l_i.
    """
    a = jnp.moveaxis(diag, axis, 0)
    b = jnp.moveaxis(off, axis, 0)

    def step(d_prev, ab):
        a_i, b_prev = ab
        l = b_prev / d_prev
        d = a_i - b_prev * l
        return d, (d, l)

    d0 = a[0]
    _, (d_rest, l) = lax.scan(step, d0, (a[1:], b))
    d = jnp.concatenate([d0[None], d_rest], axis=0)
    return jnp.moveaxis(1.0 / d, 0, axis), jnp.moveaxis(l, 0, axis)


def affine_scan(a, b, axis: int, reverse: bool = False):
    """Solve z_i = a_i * z_{i-1} + b_i (inclusive, z_{-1}=0) along `axis`.

    With reverse=True solves z_i = a_i * z_{i+1} + b_i (z_{n}=0).
    `a` and `b` must have the same shape.  O(log n) depth via associative_scan.
    """
    if reverse:
        a = jnp.flip(a, axis)
        b = jnp.flip(b, axis)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    _, z = lax.associative_scan(combine, (a, b), axis=axis % a.ndim)
    if reverse:
        z = jnp.flip(z, axis)
    return z


def _scan_solve(rhs, dinv_b, lb, axis: int):
    """Portable path: forward/backward affine recurrences via associative_scan.
    dinv_b / lb must already have rhs-compatible shapes."""
    zero = jnp.zeros_like(lax.slice_in_dim(rhs, 0, 1, axis=axis))
    # a for forward: [0, -l_0, ..., -l_{n-2}]
    a_fwd = jnp.concatenate([zero, -lb], axis=axis)
    z = affine_scan(a_fwd, rhs, axis=axis)
    w = z * dinv_b
    # a for backward: [-l_0, ..., -l_{n-2}, 0]
    a_bwd = jnp.concatenate([-lb, zero], axis=axis)
    return affine_scan(a_bwd, w, axis=axis, reverse=True)


def _local_solve(rhs, dinv_b, lb, axis: int):
    """Best single-device solve: Pallas Thomas kernel when one fits, else scan."""
    import os

    if (
        os.environ.get("NEUTFEM_PALLAS", "1") != "0"
        and rhs.shape[axis] >= 4
        and rhs.size // rhs.shape[axis] >= 512
    ):
        from .pallas_tridiag import pallas_available, thomas_solve

        if pallas_available():
            out = thomas_solve(rhs, dinv_b, lb, axis)
            if out is not None:  # None: no kernel fits this shape/dtype
                return out
    return _scan_solve(rhs, dinv_b, lb, axis)


def tridiag_solve(rhs, dinv, l, axis: int, shard=None):
    """Solve T x = rhs with precomputed (dinv, l) from tridiag_factor, along `axis`.

    rhs may have extra trailing/leading batch axes: dinv/l are broadcast against it.
    Forward:  z_i = r_i - l_{i-1} z_{i-1}
    Diagonal: w = z * dinv
    Backward: x_i = w_i - l_i x_{i+1}

    On TPU with enough batch, dispatches to the layout-aware Pallas Thomas kernels
    (one read + one write instead of the associative_scan's ~2 log2(n) passes); the
    portable associative_scan path serves CPU and small problems.  Disable with
    NEUTFEM_PALLAS=0.

    shard: optional ``(mesh, {array_dim: mesh_axis_name})`` from the caller when the
    operands are sharded over a device mesh along batch dims (never along `axis`):
    the solve is wrapped in ``jax.shard_map`` so each shard runs the Pallas kernel
    on its complete local lines instead of GSPMD all-gathering the pallas_call.
    """
    axis = axis % rhs.ndim
    n = rhs.shape[axis]
    dinv_b = jnp.broadcast_to(dinv, rhs.shape)
    lb = jnp.broadcast_to(l, rhs.shape[:axis] + (n - 1,) + rhs.shape[axis + 1:])

    if shard is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        mesh, dim_names = shard
        assert axis not in dim_names, "cannot shard_map along the solve axis"
        spec = P(*[dim_names.get(d) for d in range(rhs.ndim)])
        return shard_map(
            lambda r, d, lo: _local_solve(r, d, lo, axis),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            # pallas_call's ShapeDtypeStruct outputs carry no vma annotation
            check_vma=False,
        )(rhs, dinv_b, lb)

    return _local_solve(rhs, dinv_b, lb, axis)

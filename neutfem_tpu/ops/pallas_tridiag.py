"""Pallas TPU kernel: batched Thomas solve for the per-direction RT mass systems.

The portable path (ops/tridiag.py) uses ``lax.associative_scan`` — O(log n) depth but
~2·log2(n) full-array memory passes per substitution.  On TPU the arithmetic is
trivially cheap and the solve is HBM-bound, so the classic Thomas algorithm wins: one
kernel reads rhs/dinv/l once and writes the solution once, with the sequential
recurrence running down the sublane (line) axis while the batch fills the lanes.

Layout contract: operands are 2D ``(n, B)`` — line index major, batch minor — so each
``fori_loop`` step is a full-width VPU op on a ``(TB,)`` lane vector.  The wrapper
``thomas_solve`` handles axis movement, batch flattening and lane padding.

See /opt/skills/guides/pallas_guide.md (grid/BlockSpec, fori_loop inside kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["thomas_solve", "pallas_available"]

#: lanes per batch tile (multiple of 128; 512 keeps VMEM use ~n*8KB per operand)
_TILE_B = 512


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _thomas_kernel(r_ref, dinv_ref, l_ref, out_ref):
    n = r_ref.shape[0]

    # forward substitution: z_0 = r_0; z_i = r_i - l_{i-1} z_{i-1}
    out_ref[0, :] = r_ref[0, :]

    def fwd(i, z_prev):
        z = r_ref[i, :] - l_ref[i - 1, :] * z_prev
        out_ref[i, :] = z
        return z

    z_last = jax.lax.fori_loop(1, n, fwd, out_ref[0, :])

    # diagonal + backward: x_{n-1} = z_{n-1} d^-1_{n-1}; x_i = z_i d^-1_i - l_i x_{i+1}
    x_last = z_last * dinv_ref[n - 1, :]
    out_ref[n - 1, :] = x_last

    def bwd(i, x_next):
        j = n - 2 - i
        x = out_ref[j, :] * dinv_ref[j, :] - l_ref[j, :] * x_next
        out_ref[j, :] = x
        return x

    jax.lax.fori_loop(0, n - 1, bwd, x_last)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _thomas_2d(r2, d2, l2, interpret: bool = False):
    """Solve along axis 0 of (n, B) operands; B must be a multiple of _TILE_B."""
    n, B = r2.shape
    grid = (B // _TILE_B,)
    spec = lambda rows: pl.BlockSpec((rows, _TILE_B), lambda b: (0, b))
    return pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((n, B), r2.dtype),
        grid=grid,
        in_specs=[spec(n), spec(n), spec(n - 1)],
        out_specs=spec(n),
        interpret=interpret,
    )(r2, d2, l2)


def thomas_solve(rhs, dinv, l, axis: int, interpret: bool = False):
    """Tridiagonal solve along ``axis`` with precomputed LDL^T factors (same
    semantics as ops.tridiag.tridiag_solve).  dinv/l must be broadcastable to rhs."""
    axis = axis % rhs.ndim
    n = rhs.shape[axis]
    dinv_b = jnp.broadcast_to(dinv, rhs.shape)
    l_b = jnp.broadcast_to(l, rhs.shape[:axis] + (n - 1,) + rhs.shape[axis + 1:])

    def to2d(a):
        return jnp.moveaxis(a, axis, 0).reshape(a.shape[axis], -1)

    r2, d2, l2 = to2d(rhs), to2d(dinv_b), to2d(l_b)
    B = r2.shape[1]
    pad = (-B) % _TILE_B
    if pad:
        r2 = jnp.pad(r2, ((0, 0), (0, pad)))
        d2 = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=1.0)
        l2 = jnp.pad(l2, ((0, 0), (0, pad)))

    out = _thomas_2d(r2, d2, l2, interpret=interpret)

    if pad:
        out = out[:, :B]
    moved_shape = (n,) + rhs.shape[:axis] + rhs.shape[axis + 1:]
    return jnp.moveaxis(out.reshape(moved_shape), 0, axis)

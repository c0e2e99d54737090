"""Pallas TPU kernels: batched Thomas solve for the per-direction RT mass systems.

The portable path (ops/tridiag.py) uses ``lax.associative_scan`` — O(log n) depth but
~2·log2(n) full-array memory passes.  On TPU the arithmetic is trivially cheap and the
solve is HBM-bound, so the classic Thomas algorithm wins: read each operand once,
write the solution once, with the sequential recurrence running across the solve axis
while other axes fill the vector lanes.

Round-2 redesign (kills the 1M->3.5M scaling cliff): the kernels consume the arrays
in their NATURAL (nz, ny, nx)-ordered layout — no host-level moveaxis/reshape/pad,
which previously cost ~half the device time in XLA transpose/copy ops around the
kernel.  Three kernels, chosen by where the solve axis sits relative to the minor
(lane) axis:

* ``_lanes_kernel``  — solve axis followed by a LARGE trailing block (z direction:
  M = ny*nx).  Blocks ``(1, n, TM)``: lanes stream straight from the contiguous
  trailing axes.  Measured 3.2x the old transpose+kernel path at 3.5M cells.
* ``_rows_kernel``   — solve axis followed by one SHORT trailing axis (y direction:
  M = nx).  Blocks ``(TZ, n, M)``: each block is TZ fully-contiguous (n*M) slabs, the
  recurrence operates on (TZ, M) tiles.  2.0x.
* ``_transpose_kernel`` — solve axis IS the minor axis (x direction).  Blocks
  ``(TB, n)`` are DMA'd in natural layout and transposed INSIDE the kernel
  (VMEM-local, VREG shuffles) so the recurrence runs down sublanes.  2.3x.

All kernels tolerate ragged grids (Pallas masks partial blocks; garbage in dead
lanes never crosses lanes — each lane is an independent tridiagonal system).

Reference counterpart: the unused serial ``ThomasSolver``
(/root/reference/src/solvers.cpp:940-989) and the per-CG-iteration implicit A-solve
inside SchurProduct (solvers.cpp:535-547).
See /opt/skills/guides/pallas_guide.md (grid/BlockSpec, fori_loop, scratch memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["thomas_solve", "pallas_available"]

#: rough VMEM budget per pallas_call (bytes) used to size tiles (chip has ~16MB less
#: double-buffering overheads; stay comfortably below)
_VMEM_BUDGET = 10 * 2**20


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _round_down(x: int, m: int) -> int:
    return max((x // m) * m, m)


# ---------------------------------------------------------------------------
# kernel bodies (shared recurrence, different block slicing)
#   forward:  z_0 = r_0;              z_i = r_i - l_{i-1} z_{i-1}
#   diag:     x_{n-1} = z_{n-1} d^-1_{n-1}
#   backward: x_i = z_i d^-1_i - l_i x_{i+1}
# ---------------------------------------------------------------------------

def _lanes_kernel(r_ref, d_ref, l_ref, out_ref):
    """Blocks (1, n, TM): recurrence over axis 1, TM lanes."""
    n = r_ref.shape[1]
    out_ref[0, 0, :] = r_ref[0, 0, :]

    def fwd(i, z_prev):
        z = r_ref[0, i, :] - l_ref[0, i - 1, :] * z_prev
        out_ref[0, i, :] = z
        return z

    z_last = jax.lax.fori_loop(1, n, fwd, out_ref[0, 0, :])
    x_last = z_last * d_ref[0, n - 1, :]
    out_ref[0, n - 1, :] = x_last

    def bwd(i, x_next):
        j = n - 2 - i
        x = out_ref[0, j, :] * d_ref[0, j, :] - l_ref[0, j, :] * x_next
        out_ref[0, j, :] = x
        return x

    jax.lax.fori_loop(0, n - 1, bwd, x_last)


def _rows_kernel(r_ref, d_ref, l_ref, out_ref):
    """Blocks (TZ, n, M): recurrence over axis 1 on (TZ, M) tiles."""
    n = r_ref.shape[1]
    out_ref[:, 0, :] = r_ref[:, 0, :]

    def fwd(i, z_prev):
        z = r_ref[:, i, :] - l_ref[:, i - 1, :] * z_prev
        out_ref[:, i, :] = z
        return z

    z_last = jax.lax.fori_loop(1, n, fwd, out_ref[:, 0, :])
    x_last = z_last * d_ref[:, n - 1, :]
    out_ref[:, n - 1, :] = x_last

    def bwd(i, x_next):
        j = n - 2 - i
        x = out_ref[:, j, :] * d_ref[:, j, :] - l_ref[:, j, :] * x_next
        out_ref[:, j, :] = x
        return x

    jax.lax.fori_loop(0, n - 1, bwd, x_last)


def _transpose_kernel(r_ref, d_ref, l_ref, out_ref, rt, dt_, lt):
    """Blocks (TB, n) in natural layout; transpose to (n, TB) in VMEM scratch so the
    recurrence runs down sublanes, transpose back on write."""
    n = r_ref.shape[1]
    rt[:] = r_ref[:].T
    dt_[:] = d_ref[:].T
    lt[:] = l_ref[:].T

    def fwd(i, z_prev):
        z = rt[i, :] - lt[i - 1, :] * z_prev
        rt[i, :] = z
        return z

    z_last = jax.lax.fori_loop(1, n, fwd, rt[0, :])
    x_last = z_last * dt_[n - 1, :]
    rt[n - 1, :] = x_last

    def bwd(i, x_next):
        j = n - 2 - i
        x = rt[j, :] * dt_[j, :] - lt[j, :] * x_next
        rt[j, :] = x
        return x

    jax.lax.fori_loop(0, n - 1, bwd, x_last)
    out_ref[:] = rt[:].T


# ---------------------------------------------------------------------------
# pallas_call wrappers (jitted per static shape)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def _solve_lanes(r3, d3, l3, tm: int, interpret: bool = False):
    B, n, M = r3.shape
    spec = lambda rows: pl.BlockSpec((1, rows, tm), lambda b, m: (b, 0, m),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lanes_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n, M), r3.dtype),
        grid=(B, pl.cdiv(M, tm)),
        in_specs=[spec(n), spec(n), spec(n - 1)],
        out_specs=spec(n),
        interpret=interpret,
    )(r3, d3, l3)


@functools.partial(jax.jit, static_argnames=("tz", "interpret"))
def _solve_rows(r3, d3, l3, tz: int, interpret: bool = False):
    B, n, M = r3.shape
    spec = lambda rows: pl.BlockSpec((tz, rows, M), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _rows_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n, M), r3.dtype),
        grid=(pl.cdiv(B, tz),),
        in_specs=[spec(n), spec(n), spec(n - 1)],
        out_specs=spec(n),
        interpret=interpret,
    )(r3, d3, l3)


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def _solve_transpose(r2, d2, l2, tb: int, interpret: bool = False):
    B, n = r2.shape
    spec = lambda cols: pl.BlockSpec((tb, cols), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _transpose_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n), r2.dtype),
        grid=(pl.cdiv(B, tb),),
        in_specs=[spec(n), spec(n), spec(n - 1)],
        out_specs=spec(n),
        scratch_shapes=[
            pltpu.VMEM((n, tb), r2.dtype),
            pltpu.VMEM((n, tb), r2.dtype),
            pltpu.VMEM((n - 1, tb), r2.dtype),
        ],
        interpret=interpret,
    )(r2, d2, l2)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def thomas_solve(rhs, dinv, l, axis: int, interpret: bool = False):
    """Tridiagonal solve along ``axis`` with precomputed LDL^T factors (same
    semantics as ops.tridiag.tridiag_solve).  dinv/l must be broadcastable to rhs.

    Returns None if no kernel fits this shape/dtype (caller falls back to the
    associative_scan path)."""
    if not interpret and rhs.dtype not in (jnp.float32, jnp.bfloat16):
        return None  # emulated f64 does not lower through Mosaic (interpret is fine)
    axis = axis % rhs.ndim
    n = rhs.shape[axis]
    shape = rhs.shape
    itemsize = rhs.dtype.itemsize
    B = 1
    for s in shape[:axis]:
        B *= s
    M = 1
    for s in shape[axis + 1:]:
        M *= s

    dinv_b = jnp.broadcast_to(dinv, shape)
    l_b = jnp.broadcast_to(l, shape[:axis] + (n - 1,) + shape[axis + 1:])

    if M == 1:
        # solve axis is minor: in-kernel transpose, lanes from the batch axes.
        # VMEM: 4 blocks + 3 scratch, double-buffered blocks => ~11 n*TB footprints
        tb = _round_down(min(2048, _VMEM_BUDGET // (11 * n * itemsize)), 256)
        r2 = rhs.reshape(B, n)
        out = _solve_transpose(r2, dinv_b.reshape(B, n), l_b.reshape(B, n - 1),
                               tb=tb, interpret=interpret)
        return out.reshape(shape)

    r3 = rhs.reshape(B, n, M)
    d3 = dinv_b.reshape(B, n, M)
    l3 = l_b.reshape(B, n - 1, M)
    if M >= 512:
        # big contiguous trailing block: stream lanes directly (z direction)
        tm = _round_down(min(2048, _VMEM_BUDGET // (8 * n * itemsize)), 512)
        out = _solve_lanes(r3, d3, l3, tm=tm, interpret=interpret)
    elif M >= 64:
        # short trailing axis (y direction): contiguous (n, M) slabs per batch row
        tz = _round_down(min(16, _VMEM_BUDGET // (8 * n * M * itemsize)), 4)
        out = _solve_rows(r3, d3, l3, tz=tz, interpret=interpret)
    else:
        return None  # tiny lanes (e.g. higher-order T in the middle): scan path wins
    return out.reshape(shape)

"""Fused block-Jacobi preconditioner apply + CG reductions (one Pallas pass).

The higher-order Schur CG applies a per-cell P x P block-Jacobi inverse each
iteration (``z = M^-1 r``, power.py group_solve) and immediately reduces
``rz = <r, z>`` and ``rr = <r, r>``.  This kernel streams the (P, P, cells)
block tensor once and emits z plus per-tile partial sums for both dots.

ADJUDICATED AGAINST (round 3, real chip, RT1-P1 988k cells, alternating A/B):
87.3 vs 61.5 ms/outer — opt-in via NEUTFEM_BLOCKJAC=1, default stays the XLA
einsum.  The round-3 trace read the XLA path as "three kernels at 50-60% of
bandwidth", but the step is COMPUTE-comparable, not bandwidth-starved: P^2
bf16 convert + multiply-add per cell is ~200 vector ops/element, XLA fuses the
einsum with the neighboring CG axpys and MSA-stages operands in VMEM, and the
pallas_call is a fusion BARRIER that forces r/z round-trips the fused chain
never materializes.  A standalone A/B (kernel vs einsum alone, same operands,
jitted loop) measured 754 vs 714 us — no kernel-level win exists.  Third
instance of the round-3 law: XLA-op-boundary traffic accounting overcounts;
only measured wall time adjudicates (see CLAUDE.md "Fused-reduction CG
adjudication" and the eqfold corollary).

Replaces nothing in the reference — its CG is unpreconditioned
(/root/reference/src/solvers.cpp:577-636); the block-Jacobi preconditioner and
this fusion are TPU-native new scope.

Engagement mirrors ops/pallas_fused.py: static shape/dtype gates, decline (->
None) on CPU/f64/small shapes; interpret mode for CPU tests.  The spatial dims
are flattened to (rows, nx) — a free bitcast (leading-dim merge) — and tiled
(ts, tc) with edge masking on the reductions (out-of-range lanes would
otherwise pollute the partial sums with padding garbage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blockjac_dots", "blockjac_fits"]

_VMEM_BUDGET = 10 * 2**20
_VMEM_LIMIT = 13 * 2**20


def _pad_up(v: int, t: int) -> int:
    return -(-v // t) * t


def _tiles(P: int, rows: int, nx: int, bi_itemsize: int):
    """(ts, tc) or None.  Per-tile VMEM footprint (double-buffered operands):
    bi (P,P,ts,tc)*isz*2 + (r,z)*(P,ts,tc)*4*2 each -> ts*tc*(2*P*P*isz + 16*P)."""
    tc = min(_pad_up(nx, 128), 512)
    per = 2 * P * P * bi_itemsize + 16 * P
    ts = (_VMEM_BUDGET // (per * tc)) // 8 * 8
    if ts < 8:
        return None
    return (min(ts, _pad_up(rows, 8)), tc)


def blockjac_fits(P: int, shape, r_dtype, bi_dtype, interpret: bool = False) -> bool:
    """True iff blockjac_dots engages for per-group flux arrays of this shape."""
    if not interpret and r_dtype != jnp.float32:
        return False
    if not interpret and bi_dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if P < 2 or len(shape) < 3:
        return False
    nx = shape[-1]
    rows = 1
    for s in shape[-3:-1]:
        rows *= s
    if nx < 64 or rows < 512:
        return False
    return _tiles(P, rows, nx, jnp.dtype(bi_dtype).itemsize) is not None


def _body(bi_ref, r_ref, z_ref, prz_ref, prr_ref, *, P, rows, nx, ts, tc):
    """Blocks: bi (P, P, ts, tc); r/z (P, ts, tc); prz/prr (1, 1, 8, 128) VMEM
    per-tile partial sums (each grid step owns its own block, so the grid dims
    stay "parallel" and the DMA pipeline is unbroken — a revisited whole-array
    SMEM scalar block forced "arbitrary" semantics and measured 42% SLOWER end
    to end).  Edge tiles are masked in the reductions; their z lanes are
    written but dropped by the out-of-range store."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = i * ts
    col0 = j * tc
    riota = jax.lax.broadcasted_iota(jnp.int32, (ts, tc), 0) + row0
    ciota = jax.lax.broadcasted_iota(jnp.int32, (ts, tc), 1) + col0
    mask = (riota < rows) & (ciota < nx)

    rz = jnp.zeros((ts, tc), jnp.float32)
    rr = jnp.zeros((ts, tc), jnp.float32)
    for p in range(P):
        z = bi_ref[p, 0].astype(jnp.float32) * r_ref[0]
        for q in range(1, P):
            z += bi_ref[p, q].astype(jnp.float32) * r_ref[q]
        z_ref[p] = z
        rp = r_ref[p]
        rz += rp * z
        rr += rp * rp
    # SELECT, don't multiply: edge-tile padding lanes hold garbage (NaN on
    # real HBM) and NaN * 0 is still NaN.  Partial-reduce to one (8, 128)
    # vregister per tile; the host-side jnp.sum finishes the reduction.
    rz = jnp.where(mask, rz, 0.0).reshape(ts // 8, 8, tc // 128, 128)
    rr = jnp.where(mask, rr, 0.0).reshape(ts // 8, 8, tc // 128, 128)
    prz_ref[0, 0] = rz.sum((0, 2))
    prr_ref[0, 0] = rr.sum((0, 2))


@functools.partial(jax.jit, static_argnames=("ts", "tc", "interpret"))
def _call(bi3, r3, ts: int, tc: int, interpret: bool = False):
    P, _, rows = bi3.shape[0], bi3.shape[1], bi3.shape[2]
    nx = bi3.shape[3]
    gi, gj = pl.cdiv(rows, ts), pl.cdiv(nx, tc)
    kern = functools.partial(_body, P=P, rows=rows, nx=nx, ts=ts, tc=tc)
    cell = pl.BlockSpec((P, ts, tc), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    part = pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    z, prz, prr = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((P, rows, nx), r3.dtype),
                   jax.ShapeDtypeStruct((gi, gj, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((gi, gj, 8, 128), jnp.float32)),
        grid=(gi, gj),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 2,
            vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec((P, P, ts, tc), lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
                  cell],
        out_specs=(cell, part, part),
        interpret=interpret,
    )(bi3, r3)
    return z, jnp.sum(prz), jnp.sum(prr)


def blockjac_dots(bi, r, interpret: bool = False):
    """(z, rz, rr) with z = einsum('pqabc,...qabc->...pabc', bi, r),
    rz = <r, z>, rr = <r, r> — or None if the kernel does not engage.

    ``bi`` is (P, P, *spatial) (f32 or bf16, see build_context); ``r`` is
    (..., P, *spatial) with all leading batch dims of size 1."""
    P = bi.shape[0]
    spatial = bi.shape[2:]
    if r.shape[-len(spatial) - 1:] != (P, *spatial):
        return None
    if any(s != 1 for s in r.shape[:-len(spatial) - 1]):
        return None
    if not blockjac_fits(P, spatial, r.dtype, bi.dtype, interpret):
        return None
    nx = spatial[-1]
    rows = 1
    for s in spatial[:-1]:
        rows *= s
    ts, tc = _tiles(P, rows, nx, jnp.dtype(bi.dtype).itemsize)
    z, rz, rr = _call(bi.reshape(P, P, rows, nx), r.reshape(P, rows, nx),
                      ts=ts, tc=tc, interpret=interpret)
    return z.reshape(r.shape), rz, rr

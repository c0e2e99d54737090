"""Pallas Thomas kernels vs the associative_scan reference (interpret mode on CPU).

Covers all three layout-aware kernels (round-2 redesign):
* lanes kernel   — solve axis followed by a large trailing block (z direction),
* rows kernel    — solve axis followed by one short trailing axis (y direction),
* transpose kernel — solve axis is the minor axis (x direction),
plus ragged (non-divisible) grids, trailing-mode broadcasting, and the None
fallback for shapes no kernel fits.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neutfem_tpu import config
from neutfem_tpu.ops.pallas_tridiag import thomas_solve
from neutfem_tpu.ops.tridiag import tridiag_factor, tridiag_solve

DT = config.real_dtype


def _problem(shape, axis, seed=3):
    rng = np.random.default_rng(seed)
    off_shape = list(shape)
    off_shape[axis] = shape[axis] - 1
    diag = jnp.asarray(rng.uniform(2.0, 3.0, shape), DT)
    off = jnp.asarray(rng.uniform(-0.5, 0.5, off_shape), DT)
    rhs = jnp.asarray(rng.normal(size=shape), DT)
    dinv, l = tridiag_factor(diag, off, axis=axis)
    return rhs, dinv, l


@pytest.mark.parametrize(
    "shape,axis,kernel",
    [
        ((2, 13, 7, 90), 1, "lanes"),       # M = 630 >= 512, ragged vs TM
        ((2, 33, 3, 512), 1, "lanes"),      # M exactly tiled
        ((4, 33, 150), 1, "rows"),          # 64 <= M < 512, B < TZ (masked batch)
        ((40, 33, 128), 1, "rows"),         # ragged batch vs TZ
        ((7, 90, 13), 2, "transpose"),      # M = 1: minor-axis solve
        ((3, 101, 257), 2, "transpose"),    # ragged B vs TB
        ((2, 250, 700), 1, "y4"),           # rows too wide for VMEM: 4D fallback
        ((2, 700, 700), 1, "y4"),           # wide rows, s0 < 8: thin-ts 4D (round 4)
        ((1, 913, 912), 1, "y4-thin"),      # fine 2D core mesh (ZION 48x48), y dir
        ((1, 912, 913), 2, "transpose"),    # fine 2D core mesh, x dir: tb = 128
        ((2, 40, 1, 640), 1, "z-thin"),     # thin middle axis on the z kernel
    ],
)
def test_thomas_matches_scan(shape, axis, kernel):
    rhs, dinv, l = _problem(list(shape), axis)
    want = tridiag_solve(rhs, dinv, l, axis=axis)
    got = thomas_solve(rhs, dinv, l, axis=axis, interpret=True)
    assert got is not None, f"expected the {kernel} kernel to engage"
    tol = dict(rtol=5e-12, atol=5e-13) if DT == jnp.float64 else dict(rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)


def test_thomas_declines_overlong_solve_axis():
    """A solve axis so long that even the minimum tile busts the VMEM budget must
    DECLINE (None -> scan path), not clamp to the floor and fail at Mosaic
    compile (round-2 ADVICE #1).  ((2, 700, 700) used to sit here: the round-4
    thin-ts rule makes it engage efficiently — see test_thomas_matches_scan.)"""
    # y: even (ts=1, tc=128) busts the 8 MiB budget once n > ~2000
    rhs, dinv, l = _problem([1, 2300, 700], 1)
    assert thomas_solve(rhs, dinv, l, axis=1, interpret=True) is None
    # x: minor solve axis beyond the tb=128 floor's reach (pad128(n) > ~1490)
    rhs, dinv, l = _problem([1, 640, 1520], 2)
    assert thomas_solve(rhs, dinv, l, axis=2, interpret=True) is None
    # the dispatcher must still produce the right answer via the scan path
    got = tridiag_solve(rhs, dinv, l, axis=2)
    assert got.shape == rhs.shape


def test_thomas_broadcast_trailing_mode():
    """solve_A_dir broadcasts dinv/l over a trailing transverse-mode axis.  With a
    tiny trailing T the kernels decline (None) and the dispatcher must fall back to
    the associative_scan path transparently."""
    rng = np.random.default_rng(4)
    n, ny, T = 17, 40, 3
    diag = jnp.asarray(rng.uniform(2.0, 3.0, (ny, n)), DT)
    off = jnp.asarray(rng.uniform(-0.4, 0.4, (ny, n - 1)), DT)
    rhs = jnp.asarray(rng.normal(size=(ny, n, T)), DT)
    dinv, l = tridiag_factor(diag, off, axis=-1)
    got = thomas_solve(rhs, dinv[..., None], l[..., None], axis=1, interpret=True)
    assert got is None  # M = 3 < 64: no kernel fits
    # the public dispatcher still solves it (scan path)
    want = tridiag_solve(rhs, dinv[..., None], l[..., None], axis=1)
    dense = np.zeros((n, n))
    i = np.arange(n)
    # spot-verify one batch line against a dense solve
    dnp = np.asarray(diag[0])
    onp = np.asarray(off[0])
    dense[i, i] = dnp
    dense[i[:-1], i[:-1] + 1] = onp
    dense[i[:-1] + 1, i[:-1]] = onp
    x = np.linalg.solve(dense, np.asarray(rhs[0, :, 0]))
    np.testing.assert_allclose(np.asarray(want[0, :, 0]), x, rtol=1e-8, atol=1e-10)


def test_thomas_mode_axis_broadcast_on_kernel_path():
    """Trailing mode axis large enough for the rows kernel: broadcast factors."""
    rng = np.random.default_rng(5)
    n, ny, T = 17, 40, 64
    diag = jnp.asarray(rng.uniform(2.0, 3.0, (ny, n)), DT)
    off = jnp.asarray(rng.uniform(-0.4, 0.4, (ny, n - 1)), DT)
    rhs = jnp.asarray(rng.normal(size=(ny, n, T)), DT)
    dinv, l = tridiag_factor(diag, off, axis=-1)
    want = tridiag_solve(rhs, dinv[..., None], l[..., None], axis=1)
    got = thomas_solve(rhs, dinv[..., None], l[..., None], axis=1, interpret=True)
    assert got is not None
    tol = dict(rtol=5e-12, atol=5e-13) if DT == jnp.float64 else dict(rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)

"""Partitioned cut-axis tridiagonal solve (ops/parttri.py): exactness vs the
global solve, pinned-face handling, decline paths, and collective footprint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neutfem_tpu.ops.parttri import build_partitioned, tridiag_solve_partitioned
from neutfem_tpu.ops.tridiag import tridiag_factor, _scan_solve

P_DEV = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:P_DEV]), ("s",))


def _system(rng, batch, m, fax):
    """Random SPD tridiagonal batch with the face axis at ``fax``."""
    a = rng.uniform(2.5, 4.0, size=batch[:fax] + (m,) + batch[fax:])
    b = rng.uniform(-1.0, -0.2, size=batch[:fax] + (m - 1,) + batch[fax:])
    return a, b


def _global_solve(rhs, dinv, l, axis):
    dinv_e = jnp.expand_dims(dinv, -4)
    l_e = jnp.expand_dims(l, -4)
    n = rhs.shape[axis]
    dinv_b = jnp.broadcast_to(dinv_e, rhs.shape)
    l_b = jnp.broadcast_to(l_e, rhs.shape[:axis] + (n - 1,) + rhs.shape[axis + 1:])
    return _scan_solve(rhs, dinv_b, l_b, axis)


@pytest.mark.parametrize("pinned", [False, True])
def test_partitioned_matches_global(pinned):
    rng = np.random.default_rng(7)
    m = 2 * P_DEV + 1                    # 17 faces = 16 body (s=2) + seam
    a, b = _system(rng, (2, 5, 8), m, fax=1)   # (ng, m, ly, lx)
    if pinned:
        # pin a face AT a shard boundary and one interior face, the way the
        # context does (diag 1, couplings 0) — MIRROR/Dirichlet-masked faces
        for f in (P_DEV, 3):
            a[:, f] = 1.0
            b[:, f - 1] = 0.0
            if f < m - 1:
                b[:, f] = 0.0
    dinv, l = tridiag_factor(jnp.asarray(a), jnp.asarray(b), axis=1)

    part = build_partitioned(np.asarray(dinv), np.asarray(l), 1, P_DEV)
    assert part is not None
    assert part["minv"].shape[-2:] == (2 * P_DEV, 2 * P_DEV)

    rhs = jnp.asarray(rng.normal(size=(2, 3, m, 5, 8)))  # extra T axis
    x_ref = _global_solve(rhs, dinv, l, axis=2)
    with _mesh() as mesh:
        x = tridiag_solve_partitioned(rhs, part, 2, mesh, "s")
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=5e-11, atol=5e-11)


def test_partitioned_group_batched_layout():
    """Leading-group batched layout (jacobi sweep): factors carry ng, rhs
    carries (ng, T, ...) — the rank alignment must pad BEFORE the spatial
    dims, not in front."""
    rng = np.random.default_rng(3)
    m = 3 * P_DEV + 1                    # s=3
    a, b = _system(rng, (2, 4, 8), m, fax=1)
    dinv, l = tridiag_factor(jnp.asarray(a), jnp.asarray(b), axis=1)
    part = build_partitioned(np.asarray(dinv), np.asarray(l), 1, P_DEV)
    rhs = jnp.asarray(rng.normal(size=(2, 2, m, 4, 8)))
    x_ref = _global_solve(rhs, dinv, l, axis=2)
    with _mesh() as mesh:
        x = tridiag_solve_partitioned(rhs, part, 2, mesh, "s")
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=5e-11, atol=5e-11)


def test_build_declines_on_indivisible_or_thin():
    rng = np.random.default_rng(1)
    a, b = _system(rng, (1, 4, 4), 14, fax=1)   # body 13 % 8 != 0
    dinv, l = tridiag_factor(jnp.asarray(a), jnp.asarray(b), axis=1)
    assert build_partitioned(np.asarray(dinv), np.asarray(l), 1, P_DEV) is None
    a, b = _system(rng, (1, 4, 4), P_DEV + 1, fax=1)  # s=1 < 2
    dinv, l = tridiag_factor(jnp.asarray(a), jnp.asarray(b), axis=1)
    assert build_partitioned(np.asarray(dinv), np.asarray(l), 1, P_DEV) is None


def test_collective_bytes_shrink_vs_scan():
    """The whole point: the partitioned solve's per-application collective
    traffic must be far below the partitioned-scan path's."""
    from benchmarks.ici_accounting import collective_inventory

    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(5)
    m = 16 * P_DEV + 1
    a, b = _system(rng, (2, 8, 16), m, fax=1)
    dinv, l = tridiag_factor(jnp.asarray(a), jnp.asarray(b), axis=1)
    part = build_partitioned(np.asarray(dinv), np.asarray(l), 1, P_DEV)
    rhs = np.asarray(rng.normal(size=(2, 1, m, 8, 16)))

    def bytes_of(fn, rhs_sharded):
        txt = jax.jit(fn).lower(rhs_sharded).compile().as_text()
        inv = collective_inventory(txt)
        return sum(c["bytes"] for c in inv)

    with _mesh() as mesh:
        sh_body = NamedSharding(mesh, P(None, None, "s", None, None))
        # like-for-like: body-sharded in, body-sharded out (as in the solver,
        # where up/downstream ops keep the flux sharded along the cut)
        rhs_b = jax.device_put(jnp.asarray(rhs[:, :, : m - 1]), sh_body)
        scan_bytes = bytes_of(
            lambda r: jax.lax.with_sharding_constraint(
                _global_solve(
                    r,
                    jnp.asarray(dinv)[:, : m - 1],
                    jnp.asarray(l)[:, : m - 2],
                    2,
                ), sh_body),
            rhs_b,
        )

        def pfn(r_body):
            r_full = jnp.concatenate(
                [r_body, jnp.asarray(rhs[:, :, m - 1:])], axis=2)
            x = tridiag_solve_partitioned(r_full, part, 2, mesh, "s")
            return jax.lax.with_sharding_constraint(x[:, :, : m - 1], sh_body)

        part_bytes = bytes_of(pfn, rhs_b)
    assert part_bytes < scan_bytes / 5, (part_bytes, scan_bytes)

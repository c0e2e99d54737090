"""Cold-start story: time-to-first-solve vs the persistent compilation cache.

The reference compiles once (g++ -O3, /root/reference/Makefile:20-24) and every
subsequent solve starts instantly; here the first jit of a new mesh shape pays
an axon remote XLA compile (100-300 s), amortized by JAX's persistent
compilation cache (neutfem_tpu/config.py wires jax_compilation_cache_dir to
~/.cache/neutfem_jax, override NEUTFEM_COMP_CACHE).  This tool measures what a
user actually experiences (round-4 VERDICT Missing #3 / Next #5):

  cold          first solve, empty cache (fresh process, fresh cache dir)
  warm-cache    first solve, NEW process, cache populated by the cold run
  same-process  second solve in the cold process (compiled executable in memory)

plus one cache-key probe: a PERMUTED user mesh (same cell counts, axes
relabeled).  The axis-relabeling layer (_choose_axis_perm) maps both user
orientations to the SAME internal solve shape, so if the cache keys on the
jitted computation the permuted mesh should be a HIT; this is measured, not
assumed (the answer feeds the README cache-coverage table).

Each phase runs in a subprocess so the cache config binds at import; phases run
strictly sequentially (the TPU is single-tenant).  Run:

    python -m benchmarks.coldstart [--json COLDSTART_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

__all__ = ["main"]

# Child payload: build + first solve + second solve for one benchmark config,
# printing one JSON line.  Runs under a controlled NEUTFEM_COMP_CACHE.
_CHILD = r"""
import json, os, sys, time
os.environ.setdefault("NEUTFEM_X64", "0")
name, mesh_n, mesh_nz, rt_order = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
from benchmarks.runner import BenchmarkRun
from benchmarks.data import BENCHMARKS
spec = BENCHMARKS[name]
kw = dict(mesh_n=mesh_n, rt_order=rt_order, verbose=False)
if mesh_nz:
    kw["mesh_nz"] = mesh_nz
t_build0 = time.time()
run = BenchmarkRun(spec, **kw)
t_build = time.time() - t_build0
t0 = time.time()
run.solve(tol=(1e-5, 1e-4, 1e-4, 200, 1000))
first = time.time() - t0
run.solver.reset_flux()
t0 = time.time()
run.solver.SolveKeff()
second = time.time() - t0
print(json.dumps({"build_s": round(t_build, 2),
                  "first_solve_s": round(first, 2),
                  "second_solve_s": round(second, 3),
                  "keff": round(run.solver.GetLastKeff(), 7)}))
"""

# Cache-key probe: uniform-XS box solved at user orientation (nx,ny,nz) given
# on argv.  A permuted orientation maps to the SAME internal shape via
# _choose_axis_perm, so the second orientation's first solve tells whether the
# persistent cache keys survive user-axis relabeling.
_CHILD_BOX = r"""
import json, os, sys, time
os.environ.setdefault("NEUTFEM_X64", "0")
nx, ny, nz = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
import numpy as np
from neutfem import NeutFEM, BCType
from neutfem_tpu.mesh import boundary_attribute
s = NeutFEM(0, 0, 1, np.linspace(0, 5.0 * nx, nx + 1),
            np.linspace(0, 5.0 * ny, ny + 1), np.linspace(0, 5.0 * nz, nz + 1))
for ax in range(3):
    for up in (False, True):
        s.set_bc(boundary_attribute(3, ax, up), BCType.DIRICHLET, 0.0)
s.get_D()[:] = 1.3
s.get_SigR()[:] = 0.04
s.get_NSF()[:] = 0.05
s.get_Chi()[:] = 1.0
s.BuildMatrices()
t0 = time.time()
k = s.SolveKeff()
first = time.time() - t0
print(json.dumps({"first_solve_s": round(first, 2), "keff": round(k, 7),
                  "internal_shape": [int(v) for v in s._imesh.shape]}))
"""

CONFIGS = [
    # (label, benchmark, mesh_n, mesh_nz, rt_order) — the headline config and
    # one higher-order config (bigger jaxprs, the worst compile case).
    ("iaea3d_988k_rt0", "iaea3d", 6, 4, 0),
    ("iaea3d_rt1p1", "iaea3d", 4, 2, 1),
]


def _spawn(cache_dir, payload, argv):
    env = dict(os.environ)
    env["NEUTFEM_COMP_CACHE"] = cache_dir
    env.setdefault("NEUTFEM_X64", "0")
    out = subprocess.run(
        [sys.executable, "-c", payload, *map(str, argv)],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    if out.returncode != 0:
        raise RuntimeError(f"child failed:\n{out.stdout}\n{out.stderr}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _run_child(cache_dir, name, mesh_n, mesh_nz, rt_order):
    return _spawn(cache_dir, _CHILD, [name, mesh_n, mesh_nz, rt_order])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default=None, help="write rows to this file")
    p.add_argument("--keep-cache", default=None,
                   help="use/keep this cache dir instead of a temp one")
    p.add_argument("--configs", default=None,
                   help="comma-separated config labels (+'axisperm' for the "
                        "probe); default all.  Lets a phase be retried alone "
                        "after a hung axon compile (sporadic; CLAUDE.md traps)")
    args = p.parse_args(argv)
    want = args.configs.split(",") if args.configs else None

    cache = args.keep_cache or tempfile.mkdtemp(prefix="neutfem_coldcache_")
    rows = []
    for label, name, n, nz, order in CONFIGS:
        if want is not None and label not in want:
            continue
        cold = _run_child(cache, name, n, nz, order)
        warm = _run_child(cache, name, n, nz, order)
        row = {
            "config": label,
            "cold_first_solve_s": cold["first_solve_s"],
            "warm_cache_first_solve_s": warm["first_solve_s"],
            "same_process_resolve_s": cold["second_solve_s"],
            "build_s": cold["build_s"],
            "cache_speedup": round(cold["first_solve_s"]
                                   / max(warm["first_solve_s"], 1e-9), 1),
            "keff_agree": cold["keff"] == warm["keff"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Axis-relabel cache-key probe: same box, two user orientations.  Both
    # relabel to one internal shape; if orientation B's first solve reads warm,
    # the cache covers user-axis permutations (it keys on the traced internal
    # computation, which is orientation-invariant).
    if want is not None and "axisperm" not in want:
        if args.json:
            with open(args.json, "w") as f:
                json.dump(rows, f, indent=1)
        return rows
    a = _spawn(cache, _CHILD_BOX, [96, 64, 48])
    b = _spawn(cache, _CHILD_BOX, [48, 64, 96])
    row = {
        "config": "axisperm_cache_probe_96x64x48_box",
        "orientA_cold_first_solve_s": a["first_solve_s"],
        "orientB_permuted_first_solve_s": b["first_solve_s"],
        "same_internal_shape": a["internal_shape"] == b["internal_shape"],
        "internal_shape": a["internal_shape"],
        "permuted_hits_cache": b["first_solve_s"] < 0.5 * a["first_solve_s"],
        "keff_agree": abs(a["keff"] - b["keff"]) < 5e-6,
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    if not args.keep_cache:
        shutil.rmtree(cache, ignore_errors=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main()

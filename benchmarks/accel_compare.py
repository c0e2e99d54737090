"""Anderson vs Chebyshev vs unaccelerated power iteration, measured.

The reference *advertises* Anderson acceleration (/root/reference/README.md:89)
but ships it dead (never wired into SolveKeff); this rebuild made it first-class
— and this tool provides the missing guidance on when it is worth using
(round-3 VERDICT Next #8): same fixed point asserted, outers + wall per
accelerator across three configurations including the KOEBERG 4-group
upscatter sweep.

    python -m benchmarks.accel_compare [--json accel.json]

Each (config, accelerator) cell re-solves from a cold flux after a compile
warm-up, so wall times are pure execution.
"""

from __future__ import annotations

import argparse
import json
import time

from .data import BENCHMARKS
from .runner import BenchmarkRun

__all__ = ["run_matrix", "main"]

CONFIGS = (
    ("iaea2d", dict(mesh_n=8), (1e-6, 1e-5, 1e-5, 600, 1000)),
    ("koeberg2d", dict(mesh_n=8), (1e-6, 1e-5, 1e-5, 600, 1000)),
    ("iaea3d", dict(mesh_n=6, mesh_nz=4), (1e-5, 1e-4, 1e-4, 600, 1000)),
)
ACCELS = ("none", "chebyshev", "anderson")


def run_matrix(configs=CONFIGS, accels=ACCELS):
    rows = []
    for name, kwargs, tol in configs:
        spec = BENCHMARKS[name]
        run = BenchmarkRun(spec, verbose=False, **kwargs)
        run.solver.set_tol(*tol)
        keffs = {}
        for accel in accels:
            run.solver.set_acceleration(accel)
            run.solver.reset_flux()
            run.solver.SolveKeff()          # compile + converge once
            run.solver.reset_flux()
            t0 = time.time()
            keff = run.solver.SolveKeff()
            wall = time.time() - t0
            keffs[accel] = keff
            rows.append({
                "core": name, "mesh": "x".join(str(v) for v in kwargs.values()),
                "n_cells": run.solver.GetNumElements(), "accel": accel,
                "keff": round(keff, 7),
                "outer_iterations": run.solver._last_outers,
                "inner_iterations": run.solver._last_inners,
                "wall_s": round(wall, 3),
            })
            print(json.dumps(rows[-1]), flush=True)
        spread = max(keffs.values()) - min(keffs.values())
        # each accelerator stops when |dk| < tol_keff, so two converged solves
        # may legitimately sit up to a few tol_keff apart around the fixed point
        assert spread < 3.0 * tol[0], \
            f"{name}: accelerators disagree by {spread} (tol_keff {tol[0]})"
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)
    rows = run_matrix()
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    print("\n| core | cells | accel | outers | inners | wall s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['core']} | {r['n_cells']} | {r['accel']} | "
              f"{r['outer_iterations']} | {r['inner_iterations']} | {r['wall_s']} |")
    return rows


if __name__ == "__main__":
    main()

"""Measure the CPU cost of the reference algorithm (scipy transcription) — the
provenance of bench.py's CPU_SECONDS_PER_CELL_PER_OUTER.

Runs the replica's exact-Schur CG power iteration (tests/ref_replica.py, a faithful
transcription of NeutFEM.cpp:1694-1802 + solvers.cpp:577-636) on IAEA-3D at 2x2
(x2 axial) = 54,872 cells and prints the mean seconds/outer.  Two Schur tolerances:

* 1e-4 — what the benchmark drivers actually run (set_tol wires tol_flux into the
  Schur CG, NeutFEM.cpp:334): the like-for-like baseline.  Measured 2026-08-16 on
  this image's CPU: 0.485 s/outer = 8.84 us/cell/outer.
* 1e-10 — the SchurSolver's constructor default (solvers.cpp:70): 48.7 us/cell/outer.

Usage:  python tests/measure_cpu_baseline.py [--tol 1e-4] [--mesh 2] [--mesh-z 2]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(mesh_n=2, mesh_nz=2, tol=1e-4, outers=12):
    from benchmarks.data import BENCHMARKS
    from benchmarks.runner import BenchmarkRun

    import ref_replica as rr

    run = BenchmarkRun(BENCHMARKS["iaea3d"], mesh_n=mesh_n, mesh_nz=mesh_nz)
    prob = rr.replica_from_benchmark(run)
    n_cells = run.solver.GetNumElements()
    print(f"cells: {n_cells}, Schur CG tol: {tol}")

    ng, nP = prob.ng, prob.space.n_Phi
    t0 = time.time()
    A_lu = [spla.splu(A) for A in prob.A]
    print(f"splu factorization: {time.time() - t0:.1f}s")

    phi = np.ones(ng * nP)
    keff = 1.0
    accel = rr._Chebyshev(15, 0.98)
    times = []
    for it in range(outers):
        t0 = time.time()
        phi_old = phi.copy()
        total_fiss = np.zeros(nP)
        for g in range(ng):
            total_fiss += prob.M_fiss[g] @ phi[g * nP:(g + 1) * nP]
        prod_old = total_fiss.sum()
        for g in range(ng):
            rhs = (1.0 / keff) * (prob.chi_dof[g] * total_fiss)
            for gp in range(ng):
                if gp == g or (g, gp) not in prob.M_scatter:
                    continue
                rhs = rhs + prob.M_scatter[(g, gp)] @ phi[gp * nP:(gp + 1) * nP]
            phi[g * nP:(g + 1) * nP] = rr._schur_cg(
                A_lu[g], prob.B, prob.BT, prob.C[g], rhs, tol=tol, maxiter=5000
            )
        prod_new = sum((prob.M_fiss[g] @ phi[g * nP:(g + 1) * nP]).sum()
                       for g in range(ng))
        keff_new = keff * prod_new / prod_old
        if it >= 1:
            keff = keff_new
        phi /= np.linalg.norm(phi)
        if it >= 2:
            phi = accel(phi)
        dt = time.time() - t0
        times.append(dt)
        print(f"outer {it}: {dt:.2f}s  k={keff:.6f}", flush=True)

    arr = np.array(times[2:])  # drop warm-up outers
    print(f"MEASURED: {arr.mean():.3f} s/outer at {n_cells} cells "
          f"= {arr.mean() / n_cells * 1e6:.3f} us/cell/outer")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", type=int, default=2)
    p.add_argument("--mesh-z", type=int, default=2)
    p.add_argument("--tol", type=float, default=1e-4)
    p.add_argument("--outers", type=int, default=12)
    a = p.parse_args()
    main(a.mesh, a.mesh_z, a.tol, a.outers)

"""IAEA-2D convergence study: mesh refinement (RT0) vs order refinement (RT1/RT2).

Run: python examples/convergence_study.py
"""
from benchmarks.data import BENCHMARKS
from benchmarks.runner import BenchmarkRun

TOL = (1e-6, 1e-5, 1e-5, 300, 2000)
print(f"{'config':>16} {'k-eff':>10} {'pcm':>9} {'outers':>7}")
for label, n, rt in [("RT0 1x1", 1, 0), ("RT0 2x2", 2, 0), ("RT0 4x4", 4, 0),
                     ("RT1 1x1", 1, 1), ("RT1 2x2", 2, 1), ("RT2 1x1", 1, 2)]:
    run = BenchmarkRun(BENCHMARKS["iaea2d"], mesh_n=n, rt_order=rt)
    run.solve(tol=TOL)
    print(f"{label:>16} {run.keff:10.6f} {run.pcm:+9.2f} {run.solver._last_outers:7d}")

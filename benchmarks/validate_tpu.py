"""Hardware validation sweep: all five reference benchmarks on the real chip.

The CPU suite (tests/test_benchmarks.py) asserts these eigenvalues on the
virtual 8-device mesh; this sweep proves the same parity on the flagship
platform (float32 path).  Mirrors the reference's own validation procedure —
its five driver scripts print pcm vs the literature k_ref
(/root/reference/tests/iaea2d/iaea2d.py:389-394 and siblings) — but asserts.

Run: python -m benchmarks.validate_tpu

Round 5 lifts the 2D cores to their LADDER-FINE meshes (round-4 VERDICT Weak
#5): the coarse 4x4 pins could not see a regression of the fine-2D Pallas
engagement fix (128-lane tb floor / thin-ts, round 4), because the Thomas
kernels only engage at the fine shapes.  Bounds sit just above the measured
ladder values (PARITY_r04/r05: biblis 32x32 +0.3, koeberg 32x32 +1.2/+1.5,
zion 48x48 +4.2 pcm) with margin for f32/worker noise; iaea2d is pinned at its
8x8 reference config (see CASES comment).
"""
import json
import os
import time

os.environ.setdefault("NEUTFEM_X64", "0")

CASES = [
    # (name, kwargs, |pcm| bound just above the measured ladder value + noise)
    # iaea2d stays at 8x8: its fine meshes converge to the RT0 discretization's
    # own continuum limit (+6.2 pcm @32x32 vs the nodal-consensus k_ref —
    # PARITY_r05, same story as IAEA-3D's +8.5 at 3.5M); 8x8 sits near zero by
    # coarse-mesh error cancellation and is the reference's own config.
    ("iaea2d", dict(mesh_n=8), 2.0),
    ("biblis2d", dict(mesh_n=32), 2.0),
    ("koeberg2d", dict(mesh_n=32), 3.0),
    ("zion2d", dict(mesh_n=48), 6.0),
    ("iaea3d", dict(mesh_n=6, mesh_nz=4), 2.0),
]


def main() -> list:
    from benchmarks.runner import BenchmarkRun
    from benchmarks.data import BENCHMARKS

    rows = []
    for name, kw, bound in CASES:
        t0 = time.time()
        run = BenchmarkRun(BENCHMARKS[name], **kw)
        run.solve()
        wall = time.time() - t0
        ok = abs(run.pcm) < bound
        rows.append(dict(name=name, **kw, keff=round(run.keff, 7),
                         kref=run.spec.kref, pcm=round(run.pcm, 2),
                         bound=bound, ok=bool(ok), wall_s=round(wall, 1)))
        print(f"{name:10s} {kw}: k={run.keff:.6f} kref={run.spec.kref} "
              f"pcm={run.pcm:+.2f} (|bound| {bound}) "
              f"{'OK' if ok else 'FAIL'} [{wall:.1f}s]", flush=True)
    print(json.dumps(rows))
    if not all(r["ok"] for r in rows):
        raise SystemExit("SOME FAILED")
    print("ALL OK")
    return rows


if __name__ == "__main__":
    main()

"""Hardware validation sweep: all five reference benchmarks on the real chip.

The CPU suite (tests/test_benchmarks.py) asserts these eigenvalues on the
virtual 8-device mesh; this sweep proves the same parity on the flagship
platform (float32 path).  Mirrors the reference's own validation procedure —
its five driver scripts print pcm vs the literature k_ref
(/root/reference/tests/iaea2d/iaea2d.py:389-394 and siblings) — but asserts.

Run: python -m benchmarks.validate_tpu
Last recorded run (TPU v5e, 2026-08-18, adaptive inner tolerance default):
  iaea2d    8x8     k=1.029572  -1.20 pcm   (sub-2-pcm, literature 1.029585)
  biblis2d  8x8     k=1.025121  +1.05 pcm
  koeberg2d 4x4     k=1.008170  +21.2 pcm   (4-group upscatter; 4x4 disc. level)
  zion2d    4x4     k=1.275511  +38.0 pcm   (baffle geometry; 4x4 disc. level)
  iaea3d    6x6x4   k=1.029104  +0.80 pcm   (988k cells; re-run standalone after
                                             a transient worker fault ended the
                                             5-config sweep — probe + re-run per
                                             the measurement-hygiene notes)
The 2D pcm values sit on each mesh's own discretization ladder (see
tests/test_benchmarks.py for the measured refinement sequences); the bounds
below are the test-suite bounds for the same configs.
"""
import json
import os
import time

os.environ.setdefault("NEUTFEM_X64", "0")

CASES = [
    # (name, kwargs, |pcm| bound consistent with tests/test_benchmarks.py)
    ("iaea2d", dict(mesh_n=8), 2.0),
    ("biblis2d", dict(mesh_n=8), 4.0),
    ("koeberg2d", dict(mesh_n=4), 40.0),
    ("zion2d", dict(mesh_n=4), 130.0),
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

"""ICI collective-traffic accounting from the compiled 8-device sharded HLO.

Round-4 VERDICT Next #1b: "sharding is the intended path past ~3M cells/chip"
(README scaling guidance) was a design claim with no arithmetic behind it.
This tool turns it into numbers: it compiles the FULL sharded power iteration
(parallel.sharded_power_iteration — the exact artifact path dryrun_multichip
validates) for the IAEA-3D benchmark scales over an 8-device mesh, parses the
SPMD-partitioned optimized HLO, and accounts every collective byte by loop
depth:

  depth 0  once per solve          (setup / final norms)
  depth 1  once per OUTER iteration (fission psum, flux norm, halo of the
                                     face-rhs build, CMFD off)
  depth 2  once per inner CG iteration PER GROUP (Schur-matvec halo exchange,
                                     cut-axis associative-scan permutes, CG
                                     dot-product all-reduces)

The virtual CPU mesh is a faithful proxy for the per-device collective SHAPES:
GSPMD partitioning is platform-independent (the same sharded computation the
TPU would run), and every collective's output shape in the partitioned module
is already the per-device buffer.  What the CPU proxy does NOT model is which
A-solve kernel runs per shard (on TPU the Pallas Thomas kernels engage on
uncut directions via shard_map — zero collectives inside, so the collective
inventory is unaffected; the cut direction uses the associative-scan path on
BOTH platforms).

Projection model (documented assumptions, stated in the output):
  * v5e ICI one-way bandwidth per link: 4.5e10 B/s (public scaling-book
    number); a 1D-ring cut exchanges with 2 neighbors over independent links,
    we conservatively serialize all bytes onto ONE link.
  * scalar all-reduce latency floor: ``--ar-latency-us`` (default 2.0 us) per
    all-reduce — CG dot products are latency- not bandwidth-bound (the
    round-3 host-transfer law's on-device analogue).  This term DOMINATES the
    bandwidth term at every scale measured.

Per-inner bytes are reported per CG-body execution; the module contains one
structurally identical CG while per group, so module-level depth-2 sums are
divided by ng before multiplying by the measured total inners/outer
(BENCH_extra.json rows).

    python -m benchmarks.ici_accounting                  # all scales
    python -m benchmarks.ici_accounting --scales 3.5M --json SHARDING_r05.json
"""

from __future__ import annotations

import argparse
import json
import math
import re
from typing import Dict, List, Optional

__all__ = ["collective_inventory", "accounting_for", "main"]

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%[\w.\-]+\s*=\s*(?P<type>\(.*?\)|\S+)\s+"
    r"(?P<op>collective-permute|all-reduce|all-gather|reduce-scatter|"
    r"all-to-all)(?P<start>-start)?\(")
_SHAPE_RE = re.compile(r"(?P<dt>[a-z0-9]+)\[(?P<dims>[\d,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _shape_bytes(type_str: str) -> int:
    """Bytes of the FIRST array shape in an HLO type (tuple types: the send
    buffer of an async start op; counting one side avoids double counting)."""
    m = _SHAPE_RE.search(type_str)
    if not m:
        return 0
    dt = _DTYPE_BYTES.get(m.group("dt"), 4)
    dims = [int(d) for d in m.group("dims").split(",") if d]
    return dt * int(math.prod(dims)) if dims else dt


def collective_inventory(hlo_text: str) -> List[Dict]:
    """[{op, bytes, depth, op_name}] for every collective instruction.

    depth = number of ``while/body`` scopes in the op_name metadata path
    (0 = per solve, 1 = per outer iteration, 2 = per inner CG iteration).
    ``-done`` halves of async pairs carry no '=' collective opcode of their
    own shape here because only ``-start`` matches the opcode regex.
    """
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.match(line)
        if not m:
            continue
        nm = _OPNAME_RE.search(line)
        op_name = nm.group(1) if nm else ""
        out.append({
            "op": m.group("op"),
            "bytes": _shape_bytes(m.group("type")),
            "depth": op_name.count("while/body"),
            "op_name": op_name,
        })
    return out


def summarize(inv: List[Dict]) -> Dict:
    """{depth: {op: {count, bytes}}} + totals per depth."""
    by: Dict[int, Dict] = {}
    for c in inv:
        d = by.setdefault(c["depth"], {"bytes": 0, "count": 0, "ops": {}})
        d["bytes"] += c["bytes"]
        d["count"] += 1
        o = d["ops"].setdefault(c["op"], {"count": 0, "bytes": 0})
        o["count"] += 1
        o["bytes"] += c["bytes"]
    return {str(k): v for k, v in sorted(by.items())}


ICI_BW = 4.5e10  # v5e one-way ICI bytes/s per link (public scaling-book value)


def accounting_for(summary: Dict, ng: int, inners_per_outer: float,
                   ar_latency_us: float = 2.0) -> Dict:
    """Assemble per-outer ICI traffic + a projected ICI time from the
    depth-binned summary and the MEASURED inners/outer of the same config."""
    d1 = summary.get("1", {"bytes": 0, "count": 0, "ops": {}})
    d2 = summary.get("2", {"bytes": 0, "count": 0, "ops": {}})
    # depth-2 sums span the ng structurally identical per-group CG loops
    per_inner_bytes = d2["bytes"] / max(ng, 1)
    per_inner_ar = d2["ops"].get("all-reduce", {"count": 0})["count"] / max(ng, 1)
    bytes_per_outer = d1["bytes"] + per_inner_bytes * inners_per_outer
    ar_per_outer = (d1["ops"].get("all-reduce", {"count": 0})["count"]
                    + per_inner_ar * inners_per_outer)
    bw_ms = 1e3 * bytes_per_outer / ICI_BW
    lat_ms = 1e3 * ar_per_outer * ar_latency_us * 1e-6
    return {
        "bytes_per_outer": int(bytes_per_outer),
        "MB_per_outer": round(bytes_per_outer / 1e6, 3),
        "per_inner_bytes": int(per_inner_bytes),
        "allreduces_per_outer": round(ar_per_outer, 1),
        "ici_bandwidth_ms_per_outer": round(bw_ms, 4),
        "allreduce_latency_ms_per_outer": round(lat_ms, 4),
        "projected_ici_ms_per_outer": round(bw_ms + lat_ms, 4),
        "assumptions": {
            "ici_oneway_bytes_per_s": ICI_BW,
            "allreduce_latency_us": ar_latency_us,
            "inners_per_outer": inners_per_outer,
        },
    }


# (mesh_n, mesh_nz) per scale; measured inners/outer + single-chip ms/outer
# from BENCH_extra.json when present (fallback: round-4 measured constants)
SCALES = {
    "988k": dict(mesh_n=6, mesh_nz=4, metric="iaea3d_seconds_per_outer_iteration"),
    "2.6M": dict(mesh_n=8, mesh_nz=6, metric="iaea3d_2p6M_seconds_per_outer_iteration"),
    "3.5M": dict(mesh_n=8, mesh_nz=8, metric="iaea3d_3p5M_seconds_per_outer_iteration"),
}
_FALLBACK = {"988k": (31.4, 5.41), "2.6M": (43.0, 14.11), "3.5M": (39.4, 37.21)}

# candidate 8-device topologies: (label, mesh shape or None for 1D, grid axes)
TOPOLOGIES = [
    ("z8", None, 0),
    ("y8", None, 1),
    ("z4y2", (4, 2), (0, 1)),
    ("z2y4", (2, 4), (0, 1)),
]


def _measured(scale: str):
    try:
        rows = json.load(open("BENCH_extra.json"))
        for r in rows:
            if r["metric"] == SCALES[scale]["metric"]:
                d = r["detail"]
                return (d["inner_iterations"] / d["outer_iterations"],
                        1e3 * r["value"])
    except Exception:
        pass
    return _FALLBACK[scale]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scales", default="988k,2.6M,3.5M")
    p.add_argument("--n-devices", type=int, default=8)
    p.add_argument("--ar-latency-us", type=float, default=2.0)
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.n_devices}"
        ).strip()
    os.environ.setdefault("NEUTFEM_X64", "0")

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= args.n_devices

    import jax.numpy as jnp

    from neutfem_tpu import config
    from neutfem_tpu.parallel import (device_mesh, shard_context, shard_state,
                                      sharded_power_iteration)

    from .data import BENCHMARKS
    from .runner import BenchmarkRun

    rows = []
    for scale in args.scales.split(","):
        cfg = SCALES[scale]
        inners, ms_single = _measured(scale)
        run = BenchmarkRun(BENCHMARKS["iaea3d"], mesh_n=cfg["mesh_n"],
                           mesh_nz=cfg["mesh_nz"], verbose=False)
        s = run.solver
        s.set_tol(1e-5, 1e-4, 1e-4, 200, 1000)
        fes, ng = s._fes, s._ng
        ctx = s._ctx("exact")
        opts = s._opts("exact")
        shape = fes.mesh.shape
        phi0 = jnp.ones((ng, *shape, fes.P), dtype=config.real_dtype)
        for label, mshape, gaxes in TOPOLOGIES:
            ndv = args.n_devices
            ax_list = [gaxes] if isinstance(gaxes, int) else list(gaxes)
            sizes = [ndv] if mshape is None else list(mshape)
            if any(shape[a] % n for a, n in zip(ax_list, sizes)):
                continue  # this topology does not divide this mesh
            mesh = device_mesh(ndv, shape=mshape)
            ctx_sh = shard_context(ctx, mesh, fes, grid_axis=gaxes)
            phi_sh = shard_state(phi0, mesh, grid_axis=gaxes)
            runf, _ = sharded_power_iteration(fes, ng, opts, mesh,
                                              grid_axis=gaxes)
            lowered = runf.lower(ctx_sh, phi_sh, 1.0)
            txt = lowered.compile().as_text()
            summ = summarize(collective_inventory(txt))
            acct = accounting_for(summ, ng, inners, args.ar_latency_us)
            row = {
                "scale": scale, "mesh": f"{shape}", "topology": label,
                "n_devices": ndv, "ng": ng,
                "single_chip_ms_per_outer": ms_single,
                "per_depth": summ, "accounting": acct,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            del ctx_sh, phi_sh
        del ctx, run, s
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main()

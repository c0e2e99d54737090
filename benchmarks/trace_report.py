"""Per-kernel device-time accounting from a ``NEUTFEM_PROFILE`` trace.

TPU-native analogue of the reference's per-phase chrono report
(/root/reference/src/NeutFEM.cpp:1688-1700): where the reference times whole
solver phases on the host, XLA's profiler gives per-fusion device time and the
bytes each op touched — the numbers every round-2/3 optimization law in
CLAUDE.md was adjudicated with (conv-rewrite trap, lane-padding diagnosis,
fusion-barrier law).  This tool makes that parsing reproducible instead of a
/tmp one-off.

    NEUTFEM_PROFILE=/tmp/tr python -m benchmarks.iaea3d --mesh 4x4x2 --order 2
    python -m benchmarks.trace_report /tmp/tr [--top 25] [--json out.json]

Aggregates every XLA device event under the trace dir (the profiler writes
``plugins/profile/<ts>/*.trace.json.gz``), groups by op name, and reports
device time, occurrences, bytes accessed, and effective HBM bandwidth
(bytes_accessed / device_time — XLA's cost-model bytes, i.e. logical traffic;
Pallas kernels report only their I/O buffers).  Rows whose GB/s column sits
near the chip's HBM peak are at the DMA bound; a "regression" there is a NEW
top row, not a slower kernel (measurement law, CLAUDE.md round 3).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
from typing import Dict, List

__all__ = ["load_device_events", "aggregate", "main"]


def _trace_files(trace_dir: str) -> List[str]:
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    files: List[str] = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    return sorted(files)


def load_device_events(trace_dir: str) -> List[Dict]:
    """All complete ('ph'=='X') events on device (TPU/accelerator) lanes.

    Host lanes (python threads, runtime) are excluded by process name so the
    report is device time, not wall time.  On a CPU-only trace (no accelerator
    lanes — XLA:CPU ops land on ``/host:CPU``) every complete event is kept,
    so the tool stays usable for interpret-mode sanity runs.
    """
    events: List[Dict] = []
    fallback: List[Dict] = []
    for path in _trace_files(trace_dir):
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt") as f:
            data = json.load(f)
        raw = data.get("traceEvents", data if isinstance(data, list) else [])
        pid_name: Dict[int, str] = {}
        for ev in raw:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_name[ev.get("pid")] = ev.get("args", {}).get("name", "")
        for ev in raw:
            if ev.get("ph") != "X":
                continue
            pname = pid_name.get(ev.get("pid"), "")
            if "TensorFlow Name Scope" in pname or "Steps" in pname:
                continue
            if any(t in pname for t in ("TPU", "Device", "/device:", "XLA Op")):
                events.append(ev)
            else:
                fallback.append(ev)
    return events if events else fallback


def aggregate(events: List[Dict]) -> List[Dict]:
    """Group device events by op name; sum duration, keep bytes/category."""
    agg: Dict[str, Dict] = collections.defaultdict(
        lambda: {"us": 0.0, "count": 0, "bytes": 0, "category": ""})
    for ev in events:
        name = ev.get("name", "?")
        a = ev.get("args", {}) or {}
        row = agg[name]
        row["us"] += float(ev.get("dur", 0.0))
        row["count"] += 1
        for k in ("bytes_accessed", "bytes accessed"):
            if k in a:
                try:
                    row["bytes"] += int(float(a[k]))
                except (TypeError, ValueError):
                    pass
                break
        cat = a.get("hlo_category") or a.get("category") or ""
        if cat:
            row["category"] = cat
    rows = []
    for name, r in agg.items():
        us = r["us"]
        rows.append({
            "op": name, "device_us": round(us, 1), "count": r["count"],
            "us_per_call": round(us / max(r["count"], 1), 2),
            "bytes": r["bytes"], "category": r["category"],
            "gbps": round(r["bytes"] / us / 1e3, 1) if us > 0 and r["bytes"] else None,
        })
    rows.sort(key=lambda r: -r["device_us"])
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    events = load_device_events(args.trace_dir)
    rows = aggregate(events)
    total = sum(r["device_us"] for r in rows)
    print(f"# {len(events)} device events, {total/1e3:.2f} ms total device time")
    print("| op | ms | % | calls | us/call | MB | GB/s | category |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows[: args.top]:
        pct = 100.0 * r["device_us"] / total if total else 0.0
        mb = r["bytes"] / 1e6 if r["bytes"] else 0.0
        print(f"| {r['op'][:60]} | {r['device_us']/1e3:.2f} | {pct:.1f} "
              f"| {r['count']} | {r['us_per_call']} | {mb:.1f} "
              f"| {r['gbps'] if r['gbps'] is not None else ''} | {r['category']} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"total_device_us": total, "rows": rows}, f, indent=1)
    return rows


if __name__ == "__main__":
    main()

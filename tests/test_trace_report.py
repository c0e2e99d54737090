"""Smoke test for the trace accounting tool (benchmarks/trace_report.py)."""

import json

import jax
import jax.numpy as jnp

from benchmarks.trace_report import aggregate, load_device_events, main


def test_trace_report_roundtrip(tmp_path):
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((128, 128))
    f(x).block_until_ready()  # compile outside the trace
    with jax.profiler.trace(str(tmp_path / "tr")):
        f(x).block_until_ready()

    events = load_device_events(str(tmp_path / "tr"))
    assert events, "profiler produced no device events"
    rows = aggregate(events)
    assert rows and rows[0]["device_us"] > 0
    names = {r["op"] for r in rows}
    assert any("dot" in n or "fusion" in n or "jit" in n.lower() for n in names)

    out = tmp_path / "report.json"
    main([str(tmp_path / "tr"), "--top", "5", "--json", str(out)])
    data = json.loads(out.read_text())
    assert data["total_device_us"] > 0 and data["rows"]

"""Per-op roofline sweep over a profiler trace.

trace_top.py answers "where does device time go"; this tool answers "which
ops are far from their roofline" — it aggregates device events by op name,
derives effective TF/s from the HLO's own model_flops, and flags the
low-efficiency tail. This is the analysis that found the round-3 levers
(VGG conv1_1 dX at 21.7 TF/s, the to_rgb 1x1s at 1.3-3.7 TF/s, the 5-D
noise-broadcast relayout copies) from saved traces while the TPU relay was
down.

Usage:
  python -m face_mask_inpaint_tpu.tools.trace_sweep TRACE_DIR
      [--max-tfs 60] [--min-ms 0.3] [--top 25]

Notes: model_flops is XLA's count for the EXECUTED HLO (packed forms show
their inflated count); Pallas kernels carry no model_flops and print as
flops=0 — read their cost from trace_top.py instead.
"""

from __future__ import annotations

import argparse
import collections

from face_mask_inpaint_tpu.tools.trace_top import load_trace_events


def sweep(root: str):
    """Aggregate per-op: (total_ms, calls, model_flops, source, tf_op)."""
    events, path = load_trace_events(root)
    if events is None:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    agg: dict = collections.defaultdict(
        lambda: {"ms": 0.0, "calls": 0, "flops": 0.0, "src": "", "op": ""})
    seen = set()  # the same device event is mirrored on several trace pids
    for e in events:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        if "device_duration_ps" not in a:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name == "Steps" or name.isdigit():
            continue
        key = (name, a.get("device_offset_ps"))
        if key in seen:
            continue
        seen.add(key)
        r = agg[name]
        r["ms"] += float(a["device_duration_ps"]) / 1e9
        r["calls"] += 1
        r["flops"] = max(r["flops"], float(a.get("model_flops", 0) or 0))
        if a.get("source"):
            r["src"] = str(a["source"])
        if a.get("tf_op"):
            r["op"] = str(a["tf_op"])
    return agg, path


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir")
    ap.add_argument("--max-tfs", type=float, default=60.0,
                    help="only show ops below this effective TF/s")
    ap.add_argument("--min-ms", type=float, default=0.3,
                    help="only show ops with at least this much ms/call")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    agg, path = sweep(args.trace_dir)
    print(f"trace: {path}")
    rows = []
    for name, r in agg.items():
        per = r["ms"] / max(r["calls"], 1)
        # TF/s = flops / (per_ms * 1e-3 s) / 1e12 = flops / per_ms / 1e9
        tfs = r["flops"] / per / 1e9 if per > 0 else 0.0
        if per >= args.min_ms and tfs <= args.max_tfs:
            rows.append((r["ms"], per, tfs, name, r))
    rows.sort(reverse=True)
    for ms, per, tfs, name, r in rows[: args.top]:
        print(f"{ms:8.2f} ms total  {per:6.2f} ms/call  {tfs:6.1f} TF/s  "
              f"{r['flops'] / 1e9:8.1f} GF  {name}")
        if r["src"] or r["op"]:
            print(f"          {r['src']}  |  {r['op'][:90]}")


if __name__ == "__main__":
    main()

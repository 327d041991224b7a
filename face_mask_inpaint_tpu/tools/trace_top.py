"""Sum TPU op durations from a jax.profiler perfetto/chrome trace.

Companion to utils/profiling.py (--profile_dir on every CLI): attributes
device time to XLA ops across the trace window.
Usage: python -m face_mask_inpaint_tpu.tools.trace_top <trace_dir> [n_top]
Reads the newest *.trace.json.gz under the dir; prints top ops by total time
on device-side tracks, merged across repeated step executions.
"""

import collections
import glob
import gzip
import json
import os
import sys


def main():
    root = sys.argv[1]
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz under", root)
        return
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find device-side process ids (names contain TPU/device or XLA Ops)
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    tot = collections.Counter()
    cnt = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        tname = tid_name.get((pid, e.get("tid")), "")
        if pid in dev_pids or "XLA Op" in tname or "Steps" in tname:
            name = e.get("name", "?")
            if name.startswith("jit_") or name in ("Steps",):
                continue
            dur = e.get("dur", 0)
            tot[name] += dur
            cnt[name] += 1
            wall += dur
    print(f"trace: {path}")
    print(f"total device op time: {wall/1e3:.2f} ms (all steps summed)")
    for name, us in tot.most_common(n_top):
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()

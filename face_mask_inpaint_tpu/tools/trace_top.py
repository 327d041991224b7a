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


def load_trace_events(root):
    """Events of the newest *.trace.json.gz under root (None if absent)."""
    paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return None, None
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"], paths[-1]


def device_op_time_s(root) -> float:
    """Summed device-side op time (seconds) across the trace window.

    The throughput ground truth on this box: wall-clock through the remote
    relay cannot be fenced reliably (block_until_ready returns before the
    intermediate executables of a multi-program chain have run), but the
    per-op device durations are hardware-derived."""
    return device_op_stats(root)[0]


def device_op_stats(root) -> tuple[float, int]:
    """(summed device-op seconds, executions-per-op median) for the window.

    The second value self-normalizes a profiled window to per-execution
    time: most compiled-program ops run exactly once per step, so the
    median event count across op names IS the number of step executions
    the window actually captured — robust both to extra executions
    spilling into the window (unfenced dispatch) and to trace formats that
    record an op on more than one track (each inflates counts and totals
    by the same factor). Ops contributing <0.5% of the max per-op total
    are ignored for the median (tiny glue ops have odd counts)."""
    events, _ = load_trace_events(root)
    if events is None:
        return 0.0, 0
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    # Per-op durations live on the "XLA Ops" thread. Device pids can carry
    # sibling threads spanning the SAME time ("XLA Modules" with jit_*
    # names, and — in some trace variants — a "Steps" thread whose events
    # are NAMED with step numbers); summing those double-counts (round 5
    # caught the gan_train window reporting 2x its true device time).
    have_threads = any("XLA Op" in n for n in tid_name.values())
    tot = collections.Counter()
    cnt = collections.Counter()
    n_steps_thread = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_name.get((e.get("pid"), e.get("tid")), "")
        on_dev = e.get("pid") in dev_pids
        if on_dev and "Steps" in tname:
            n_steps_thread += 1
            continue
        if ("XLA Op" in tname) if have_threads else on_dev:
            name = e.get("name", "?")
            if name.startswith("jit_") or name == "Steps":
                continue
            tot[name] += e.get("dur", 0)
            cnt[name] += 1
    wall = sum(tot.values())
    if not tot:
        return 0.0, 0
    if n_steps_thread:
        # the Steps thread literally counts the executions in the window
        return wall / 1e6, n_steps_thread
    floor = 0.005 * max(tot.values())
    counts = sorted(cnt[n] for n, us in tot.items() if us >= floor)
    n_exec = counts[len(counts) // 2] if counts else 0
    return wall / 1e6, n_exec


def main():
    root = sys.argv[1]
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    events, path = load_trace_events(root)
    if events is None:
        print("no trace.json.gz under", root)
        return
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

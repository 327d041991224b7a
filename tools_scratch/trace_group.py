"""Group device op time in a perfetto trace by model component (tf_op).

Usage: python tools_scratch/trace_group.py <trace_dir> [n_steps]
Prints ms/step per component group and the top ungrouped ops.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

root = sys.argv[1]
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                         recursive=True), key=os.path.getmtime)
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)

pid_name, tid_name = {}, {}
for e in data["traceEvents"]:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_name.items()
            if "TPU" in n or "/device" in n.lower() or "Device" in n}

RULES = [
    ("detector", r"MaskDetector"),
    ("enc/stem", r"encoder/input_layer|encoder/encoder\.backbone_taps/input_layer"),
    ("enc/se", r"encoder.*/body_\d+/se/"),
    ("enc/body0-2", r"encoder.*/body_[0-2]/"),
    ("enc/body3-6", r"encoder.*/body_[3-6]/"),
    ("enc/body7-20", r"encoder.*/body_(?:[7-9]|1\d|20)/"),
    ("enc/body21-23", r"encoder.*/body_2[1-3]/"),
    ("enc/attn", r"encoder/attention"),
    ("enc/fpn", r"encoder/latlayer|resize|encoder.*fuse"),
    ("enc/styles", r"encoder/styles|scan|encoder.*_stacked"),
    ("dec/style-mlp", r"decoder/style"),
    ("dec/1024 (convs_14/15+torgb7)",
     r"decoder/(convs_1[45]|to_rgbs_7|noises?_1[67])"),
    ("dec/512 (convs_12/13+torgb6)",
     r"decoder/(convs_1[23]|to_rgbs_6|noises?_1[45])"),
    ("dec/256 (convs_10/11+torgb5)",
     r"decoder/(convs_1[01]|to_rgbs_5)"),
    ("dec/128 (convs_8/9+torgb4)", r"decoder/(convs_[89]|to_rgbs_4)"),
    ("dec/<=64", r"decoder/(convs_[0-7]\b|to_rgbs_[0-3]|conv1|input)"),
    ("probe-harness (clip/crop/salt)", r"probe_psp_fused|jit\(clip\)|/gather|"
                                       r"nan_to_num|fwd_salted/(add|mul)"),
]


def classify(tf_op, src):
    for name, pat in RULES:
        if re.search(pat, tf_op) or re.search(pat, src or ""):
            return name
    return None


groups = collections.Counter()
ungrouped = collections.Counter()
samples = {}
tot = 0.0
for e in data["traceEvents"]:
    if e.get("ph") != "X":
        continue
    tname = tid_name.get((e.get("pid"), e.get("tid")), "")
    if not (e.get("pid") in dev_pids or "XLA Op" in tname):
        continue
    name = e.get("name", "?")
    if name.startswith("jit_") or name == "Steps":
        continue
    dur = e.get("dur", 0)
    a = e.get("args") or {}
    tf_op = a.get("tf_op", "")
    src = a.get("source", "")
    g = classify(tf_op, src)
    tot += dur
    if g:
        groups[g] += dur
    else:
        groups["OTHER"] += dur
        ungrouped[name] += dur
        if name not in samples:
            samples[name] = tf_op[:120]

print(f"total {tot / 1e3 / n_steps:.2f} ms/step over {n_steps} steps")
for g, us in groups.most_common():
    print(f"{us / 1e3 / n_steps:8.2f} ms  {g}")
print("\ntop OTHER ops:")
for name, us in ungrouped.most_common(25):
    print(f"{us / 1e3 / n_steps:8.3f} ms  {name[:40]:40s} {samples[name]}")

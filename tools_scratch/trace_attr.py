"""Dump args (tf_op/long_name/source) for named ops in a perfetto trace."""
import collections, glob, gzip, json, os, sys

root = sys.argv[1]
want = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)
seen = {}
for e in data["traceEvents"]:
    if e.get("ph") != "X":
        continue
    name = e.get("name", "")
    if want and name not in want:
        continue
    a = e.get("args") or {}
    key = name
    if key not in seen and a:
        seen[key] = a
for k, a in sorted(seen.items()):
    print(k)
    for kk in ("tf_op", "long_name", "source", "hlo_category", "shape"):
        if kk in a:
            print("   ", kk, "=", str(a[kk])[:300])

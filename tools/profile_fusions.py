"""Aggregate the profiler trace by fusion source location / long name."""

import glob
import gzip
import json
import sys
from collections import defaultdict

files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
agg = defaultdict(float)
cnt = defaultdict(int)
sample = {}
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if not (name.startswith("fusion") or name.startswith("while")
                or name.startswith("copy") or name.startswith("sort")
                or "wide_" in name or "reduce" in name):
            continue
        dur = ev.get("dur", 0) / 1e3
        args = ev.get("args", {})
        key = args.get("tf_op", "") or args.get("long_name", "") or name
        # source info
        src = args.get("source_info", "")
        k = (name.split(".")[0], key[:140], src[:80])
        agg[k] += dur
        cnt[k] += 1
        if k not in sample:
            sample[k] = {kk: str(vv)[:200] for kk, vv in args.items()}

rows = sorted(agg.items(), key=lambda kv: -kv[1])
tot = sum(v for _, v in rows)
print(f"total listed: {tot:.1f} ms (2 chunks)")
for (nm, key, src), v in rows[:40]:
    print(f"{v:9.2f} ms x{cnt[(nm,key,src)]:4d}  {nm:14s} {key}")
    if src:
        print(f"            src: {src}")
if rows and "-v" in sys.argv:
    print(json.dumps(sample[rows[0][0]], indent=1))

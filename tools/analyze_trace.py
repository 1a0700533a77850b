"""Aggregate a vm.trace.json.gz device trace by op family: ms/step, TF/s, GB/s.

Usage: python .prof_analyze.py /tmp/vitef_trace [n_steps] [--raw]
"""
import collections
import glob
import gzip
import json
import re
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vitef_trace"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
raw = "--raw" in sys.argv
path = sorted(glob.glob(f"{root}/plugins/profile/*/vm.trace.json.gz"))[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

SKIP = re.compile(r"^(jit_|\d+$)")
by_op = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # us, flops, bytes, count
for e in events:
    if e.get("ph") != "X":
        continue
    if device_pids and e.get("pid") not in device_pids:
        continue
    name = e.get("name", "")
    if SKIP.match(name):
        continue
    args = e.get("args", {}) or {}
    dur = float(e.get("dur", 0.0))
    flops = float(args.get("model_flops", args.get("flops", 0)) or 0)
    byts = float(args.get("bytes_accessed", 0) or 0)
    key = name if raw else re.sub(r"[._]\d+$", "", name)
    rec = by_op[key]
    rec[0] += dur
    rec[1] += flops
    rec[2] += byts
    rec[3] += 1

rows = sorted(by_op.items(), key=lambda kv: -kv[1][0])
total_us = sum(r[1][0] for r in rows)
print(f"total leaf device time: {total_us/1000/n_steps:.1f} ms/step over {n_steps} steps")
print(f"{'ms/step':>8} {'%':>5} {'TF/s':>6} {'GB/s':>6} {'count':>6}  op family")
for name, (us, fl, by, cnt) in rows[:40]:
    ms = us / 1000 / n_steps
    tf = fl / (us * 1e-6) / 1e12 if us else 0
    gb = by / (us * 1e-6) / 1e9 if us else 0
    print(f"{ms:8.2f} {100*us/total_us:5.1f} {tf:6.1f} {gb:6.0f} {cnt:6d}  {name[:110]}")

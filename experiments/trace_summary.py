"""Summarize a jax.profiler trace dir: total device-lane time per op name
(grouped by fusion/op prefix), descending. Usage:
  python experiments/trace_summary.py /tmp/det_trace [n_steps]
"""
import collections
import glob
import gzip
import json
import sys

root = sys.argv[1]
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
path = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
# identify device lanes: pid whose name mentions TPU/device XLA ops
pid_name = {}
tid_name = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_name[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

by_op = collections.Counter()
by_cat = collections.Counter()
by_src = collections.Counter()
by_lane = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_name.get(e["pid"], "")
    tname = tid_name.get((e["pid"], e["tid"]), "")
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    lane = tname or pname
    if "xla op" not in lane.lower():
        continue  # the op-level lane only (module/step lanes double-count)
    dur = e.get("dur", 0) / 1000.0  # us -> ms
    args = e.get("args", {})
    by_op[e["name"][:90]] += dur
    by_cat[args.get("hlo_category", "?")] += dur
    src = args.get("source", "?")
    src = src.replace("/opt/venv/lib/python3.12/site-packages/", "")
    src = src.replace("/root/repo/planar_optical_flow_tpu/", "")
    by_src[src] += dur
    by_lane[lane] += dur
    total += dur

print(f"trace: {path}")
print(f"lanes: {dict(by_lane)}")
print(f"total device time: {total:.2f} ms over {n_steps} steps "
      f"= {total / n_steps:.2f} ms/step")
print("\n-- by hlo_category --")
for name, dur in by_cat.most_common(15):
    print(f"{dur / n_steps:8.3f} ms/step  {name}")
print("\n-- by source line --")
for name, dur in by_src.most_common(25):
    print(f"{dur / n_steps:8.3f} ms/step  {name}")
print("\n-- by op --")
for name, dur in by_op.most_common(30):
    print(f"{dur / n_steps:8.3f} ms/step  {name}")

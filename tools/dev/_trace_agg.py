"""Aggregate a saved jax.profiler device trace with self-time accounting.

Nested HLO events (while ops contain their body's fusions) are handled by
subtracting child durations from parents via interval containment per tid.

Usage: python tools/dev/_trace_agg.py /tmp/gshell_trace [top_n] [n_steps]
"""
import collections
import glob
import gzip
import json
import sys

tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gshell_trace"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

(path,) = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
with gzip.open(path) as f:
    d = json.load(f)
ev = d["traceEvents"]
dev_pid = None
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name" and "TPU" in str(
        e.get("args", {}).get("name", "")
    ):
        dev_pid = e["pid"]

# collect per-tid event list with (start, dur) in ps
by_tid = collections.defaultdict(list)
for e in ev:
    if e.get("ph") != "X" or e.get("pid") != dev_pid:
        continue
    a = e.get("args", {})
    if "device_duration_ps" not in a:
        continue
    start = int(a.get("device_offset_ps", 0))
    dur = int(a["device_duration_ps"])
    by_tid[e["tid"]].append((start, dur, e.get("name", "?"), a))

by_key = collections.Counter()
by_cat = collections.Counter()
by_src = collections.Counter()
total = 0.0
for tid, lst in by_tid.items():
    # sort by start asc, dur desc so parents precede children
    lst.sort(key=lambda t: (t[0], -t[1]))
    stack = []  # (end, child_accum_ref) — use list for mutability
    # compute self time with a stack sweep
    for start, dur, name, a in lst:
        end = start + dur
        while stack and stack[-1][0] <= start:
            stack.pop()
        if stack:
            stack[-1][1][0] += dur  # add to parent's child-accum
        stack.append([end, [0], (name, a, dur)])
        # we need child accums resolved only after sweep; store refs
    # second pass: rebuild with proper parent tracking
    stack = []
    recs = []
    for start, dur, name, a in lst:
        end = start + dur
        while stack and stack[-1][0] <= start:
            recs.append(stack.pop())
        node = [end, 0, name, a, dur]  # [end, child_sum, ...]
        if stack:
            stack[-1][1] += dur
        stack.append(node)
    recs.extend(stack)
    for end, child_sum, name, a, dur in recs:
        self_us = max(dur - child_sum, 0) / 1e6
        if name.startswith("jit_"):  # outermost program span
            continue
        cat = a.get("hlo_category", "?")
        if cat in ("copy-start", "copy-done"):
            continue
        total += self_us
        src = a.get("source", "")
        tf_op = a.get("tf_op", "")
        base = name.rstrip("0123456789.")
        bwd = "transpose" in tf_op
        by_key[(cat, base, src, ("bwd" if bwd else "fwd"))] += self_us
        by_cat[cat] += self_us
        by_src[src] += self_us

print(f"total device self-time: {total/n_steps/1000:.1f} ms/step")
print("\n== by category ==")
for cat, us in by_cat.most_common(18):
    print(f"{us/n_steps/1000:9.2f} ms  {cat}")
print("\n== by source line ==")
for src, us in by_src.most_common(40):
    print(f"{us/n_steps/1000:9.2f} ms  {src}")
print("\n== top ops ==")
for (cat, base, src, d_), us in by_key.most_common(top_n):
    print(f"{us/n_steps/1000:9.2f} ms  {d_:3s} {cat:22s} {base:36s} {src}")

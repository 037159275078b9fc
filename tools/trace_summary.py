"""Summarize a jax.profiler trace: per-op-kind device self-times.

Usage:
  python tools/trace_summary.py /tmp/jax_trace [n_calls]

Works through the axon tunnel (trace dir contains
plugins/profile/<ts>/vm.trace.json.gz). n_calls divides totals into
per-call numbers (default 1).
"""
import collections
import glob
import gzip
import json
import re
import sys


def summarize(trace_dir: str, n_calls: int = 1, top: int = 25):
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    d = json.load(gzip.open(paths[-1]))
    evs = d["traceEvents"] if isinstance(d, dict) else d
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    groups = collections.Counter()
    cnt = collections.Counter()
    indiv = collections.Counter()
    jits = collections.Counter()
    tot = 0.0
    for e in evs:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if pids.get(e.get("pid")) != "/device:TPU:0":
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            jits[name] += e["dur"]
            continue
        if re.fullmatch(r"\d+", name):
            continue  # per-launch step markers
        g = re.sub(r"[.\d]+$", "", name)
        groups[g] += e["dur"]
        cnt[g] += 1
        indiv[name] += e["dur"]
        tot += e["dur"]
    print(f"device op time: {tot / 1000 / n_calls:.2f} ms/call "
          f"({n_calls} calls)")
    for jname, v in jits.most_common(5):
        print(f"  [jit] {v / 1000 / n_calls:8.2f} ms/call  {jname[:70]}")
    print("--- by op kind")
    for g, v in groups.most_common(top):
        print(f"{v / 1000 / n_calls:8.2f} ms/call x{cnt[g] / n_calls:6.0f}"
              f"  {g}")
    print("--- top individual ops")
    for n, v in indiv.most_common(12):
        print(f"{v / 1000 / n_calls:8.2f} ms/call  {n[:80]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)

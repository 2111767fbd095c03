"""Aggregate op durations from a jax.profiler trace.json.gz.

Usage: python -u probes/agg_trace.py <trace.json.gz> [top_n]
Groups TPU-lane events by op name prefix and prints total duration.
"""
import collections
import gzip
import json
import re
import sys


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find process ids whose name mentions TPU / device compute
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            pid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    totals = collections.Counter()
    counts = collections.Counter()
    total_dev = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = pid_names.get((e["pid"], e["tid"]), "")
        pname = pid_names.get(e["pid"], "")
        hay = (tname + " " + pname).lower()
        if not ("xla op" in hay or "tensorflow op" in hay or "ops" == tname.lower()):
            continue
        name = e.get("name", "?")
        # strip trailing .NN / numeric suffixes to merge fused variants
        base = re.sub(r"[.\d]+$", "", name)
        dur = e.get("dur", 0) / 1e3  # us -> ms
        totals[base] += dur
        counts[base] += 1
        total_dev += dur
    print(f"total device op time: {total_dev:.2f} ms "
          f"(threads matched: {sorted(set(v for k, v in pid_names.items() if isinstance(k, tuple) and 'xla' in v.lower()))[:5]})")
    for name, dur in totals.most_common(top_n):
        print(f"{dur:9.3f} ms  x{counts[name]:<6} {name[:140]}")


if __name__ == "__main__":
    main()

"""Aggregate ops inside the windows of each top-level while loop.

Usage: python -u probes/win.py <trace.json.gz> [while_name] [top_n]
With no while_name: list all while loops with durations.
"""
import collections
import gzip
import json
import sys


def load(path):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    return [e for e in ev if e.get("ph") == "X"
            and names.get((e["pid"], e["tid"])) == "XLA Ops"]


def main():
    path = sys.argv[1]
    target = sys.argv[2] if len(sys.argv) > 2 else None
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    xla = load(path)
    whiles = [e for e in xla if e["args"].get("hlo_category") == "while"]
    if target is None:
        agg = collections.Counter()
        cnt = collections.Counter()
        for e in whiles:
            agg[e["name"]] += int(e["args"]["device_duration_ps"]) / 1e9
            cnt[e["name"]] += 1
        for n, d in agg.most_common():
            print(f"{d:8.3f} ms x{cnt[n]:<3} {n}")
        return
    w = [e for e in xla if e["name"] == target][0]
    t0 = int(w["args"]["device_offset_ps"])
    t1 = t0 + int(w["args"]["device_duration_ps"])
    tot, cnt, long = collections.Counter(), collections.Counter(), {}
    for e in xla:
        a = e.get("args", {})
        off = int(a.get("device_offset_ps", -1))
        dur = int(a.get("device_duration_ps", 0))
        if off >= t0 and off + dur <= t1 and a.get("hlo_category") != "while" \
                and e["name"] != target:
            tot[e["name"]] += dur / 1e9
            cnt[e["name"]] += 1
            long[e["name"]] = a.get("long_name", "")[:150]
    print(f"{target} inner total {sum(tot.values()):.3f} ms of "
          f"{(t1-t0)/1e9:.3f}")
    for n, d in tot.most_common(top_n):
        print(f"{d:7.3f} ms x{cnt[n]:<4} {n:32s} {long[n]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare two bench artifacts and print a per-query delta table.

Accepts either the driver's BENCH_r{N}.json wrapper (with a "tail"
field holding the raw run output) or the engine's own one-line
{"metric":...,"queries":{...}} JSON.

Usage: bench_delta.py OLD.json NEW.json [threshold]
  threshold (default 1.5): flag queries whose NEW/OLD ratio exceeds it.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return {k: v for k, v in doc["queries"].items() if v >= 0}
    # driver wrapper: parse the tail's JSON fragment and/or stderr lines
    tail = doc.get("tail", "")
    out = {}
    for m in re.finditer(r'"([a-z0-9_]+)":(-?[0-9.]+)', tail):
        v = float(m.group(2))
        if v >= 0:
            out[m.group(1)] = v
    for m in re.finditer(r"\[bench\] (?:pass=\d+ )?([a-z0-9_]+) ([0-9.]+)s", tail):
        out.setdefault(m.group(1), float(m.group(2)))
    return out


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(old) & set(new))
    print(f"old: {len(old)} queries ({sum(old.values()):.1f}s)  "
          f"new: {len(new)} queries ({sum(new.values()):.1f}s)  "
          f"shared: {len(shared)} "
          f"(old {sum(old[k] for k in shared):.1f}s -> "
          f"new {sum(new[k] for k in shared):.1f}s)")
    rows = sorted(shared, key=lambda k: -(new[k] / old[k]))
    flagged = 0
    for k in rows:
        r = new[k] / old[k]
        mark = " <-- REGRESSED" if r > threshold and new[k] - old[k] > 0.25 else ""
        if mark:
            flagged += 1
        print(f"  {k:28s} {old[k]:7.3f}s -> {new[k]:7.3f}s  x{r:5.2f}{mark}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new-only:", ", ".join(f"{k}={new[k]:.2f}s" for k in only_new))
    print(f"{flagged} regression(s) above x{threshold} (+0.25s absolute)")


if __name__ == "__main__":
    main()

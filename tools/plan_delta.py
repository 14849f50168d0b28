#!/usr/bin/env python3
"""Diff two PLANS_r{N}.json artifacts (graft.Plans output).

Usage: tools/plan_delta.py PLANS_rA.json PLANS_rB.json

Splits a bench-ratio shift into plan drift vs environment drift: queries
whose digest is unchanged ran byte-identical (normalized) plans — any
timing delta on them is host/JIT epoch, not a regression. Queries listed
under CHANGED deserve a real look (rerun graft.Plans with
SPARK_GRAFT_PLANS_DUMP=dir on both commits and diff the .txt trees).

Caveat: DISTINCT-AGGREGATE plans (q_profile, and the countDistinct in
the o23–o27/o30 roundtrip checks) can change digest when UNRELATED
catalog edits — or even catalog-run execution order within one
process — shift expression-id allocation — Spark's
RewriteDistinctAggregates groups distinct columns and ORDERS the
Expand/grouping keys in exprId-dependent order, permuting labels and
key order beyond what textual scrubbing can hide. The tell: node and
Exchange counts are identical and the tree diff shows the same keys,
functions and children in a different order.
Digests are reproducible for a fixed code state (verified two-process
identical); the dump-and-diff workflow above distinguishes that
relabeling from real drift in one look.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__.strip())
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    added = sorted(set(b) - set(a))
    removed = sorted(set(a) - set(b))
    shared = sorted(set(a) & set(b))
    changed = [k for k in shared if a[k]["hash"] != b[k]["hash"]]
    errors = sorted(k for k in b if b[k]["hash"] == "ERROR")
    print(f"shared={len(shared)} unchanged={len(shared) - len(changed)} "
          f"changed={len(changed)} added={len(added)} removed={len(removed)} "
          f"errors={len(errors)}")
    for k in changed:
        print(f"  CHANGED {k}: nodes {a[k]['nodes']}->{b[k]['nodes']}, "
              f"exchanges {a[k]['exchanges']}->{b[k]['exchanges']}")
    for k in added:
        print(f"  ADDED   {k}")
    for k in removed:
        print(f"  REMOVED {k}")
    for k in errors:
        print(f"  ERROR   {k}")
    return 1 if (changed or errors) else 0


if __name__ == "__main__":
    sys.exit(main())

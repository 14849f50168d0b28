#!/usr/bin/env python3
"""One-command regression verdict across rounds.

NOT part of the shipped Scala library — round-over-round tooling.

Usage: python3 tools/regression_gate.py PLANS_old.json PLANS_new.json \
                                         BENCH_old.json BENCH_new.json
Exit 1 iff a digest-UNCHANGED query slowed by more than THRESHOLD
beyond the epoch drift (the control-normalised ratio): plan changes are
reported but never gate (they are intentional edits to review), and
host-epoch inflation is divided out using the median ratio of unchanged
queries, so only per-query anomalies fire. Slowdowns whose cause lives
where the digest cannot see it (closure-internal kernels, pre-pass
jobs) are gated unless root-caused in regression_allowlist.json.
"""
import json, os, statistics, sys

THRESHOLD = 1.5      # control-normalised slowdown that fails the gate
MIN_SECONDS = 0.3    # ignore sub-300ms trivia (pure jitter at that size)


def load_bench(path):
    txt = open(path).read()
    return json.loads(txt[txt.index("{"):])["queries"]


def main(plans_old, plans_new, bench_old, bench_new):
    po = json.load(open(plans_old))
    pn = json.load(open(plans_new))
    bo, bn = load_bench(bench_old), load_bench(bench_new)
    shared = [q for q in po if q in pn and q in bo and q in bn
              and bo[q] > 0 and bn[q] > 0]
    unchanged = [q for q in shared if po[q]["hash"] == pn[q]["hash"]]
    changed = [q for q in shared if po[q]["hash"] != pn[q]["hash"]]
    sized = [q for q in unchanged if bo[q] >= MIN_SECONDS]
    if not sized:
        print("no digest-unchanged queries above the size floor — nothing to gate")
        return 0
    epoch = statistics.median(bn[q] / bo[q] for q in sized)
    print(f"epoch drift (median over {len(sized)} unchanged queries ≥ "
          f"{MIN_SECONDS}s): {epoch:.3f}x")
    # committed root-cause notes for slowdowns the plan digest cannot
    # see (kernel-internal changes, chooser pre-pass jobs): allowlisted
    # queries report but never gate — the note IS the review artifact,
    # same contract as tools/scaling_allowlist.json
    allow_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "regression_allowlist.json")
    allow = json.load(open(allow_path)) if os.path.exists(allow_path) else {}
    bad = []
    for q in sized:
        norm = (bn[q] / bo[q]) / epoch
        if norm > THRESHOLD:
            if q in allow:
                print(f"  slowed but ALLOWED (root-caused): {q} "
                      f"{bo[q]:.2f}s -> {bn[q]:.2f}s — {allow[q]}")
            else:
                bad.append((norm, q, bo[q], bn[q]))
    for q in changed:
        print(f"  plan-changed (review, not gated): {q} "
              f"{bo[q]:.2f}s -> {bn[q]:.2f}s")
    if bad:
        print(f"FAIL: {len(bad)} digest-unchanged queries slowed > "
              f"{THRESHOLD}x beyond epoch:")
        for norm, q, o, n in sorted(bad, reverse=True):
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({norm:.2f}x normalised)")
        return 1
    print(f"OK: all {len(sized)} digest-unchanged queries within "
          f"{THRESHOLD}x of the epoch")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:5]))

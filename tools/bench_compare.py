#!/usr/bin/env python3
"""Bench regression triage (r10): diff a fresh BENCH_FULL.json against the
committed quiet baseline (BENCH_BASELINE.json) and apply the BASELINE.md
adjudication rule automatically:

  - wall > 2x baseline AND cpu > 1.5x baseline  -> REGRESSION (real work
    appeared: investigate the plan/source)
  - wall > 2x baseline but cpu flat             -> CONTENDED (external box
    load stole cores; re-time quiet, do not chase)
  - new query (no baseline)                     -> NEW (becomes baseline
    next time the baseline file is refreshed)
  - load_sentinel_par_* out of band             -> the box's PARALLEL
    capacity is collapsed even if single-task sentinels are quiet
    (r13/r14: 7 false REGRESSION flags — bandwidth contention inflates
    cpu along with wall, so the cpu>1.5x rule cannot tell it from real
    work); every would-be REGRESSION prints CONTENTION(capacity)
    instead and does not fail the gate. ERROR rows still fail.

Usage: python3 tools/bench_compare.py [current] [baseline]
       (defaults: BENCH_FULL.json vs BENCH_BASELINE.json in repo root)

Exit code 1 iff any REGRESSION row exists — contention and new queries
do not fail the gate.
"""
import json, sys, os

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, "BENCH_FULL.json")
base_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "BENCH_BASELINE.json")

cur = json.load(open(cur_path))
base = json.load(open(base_path))

# a polluted run cannot be adjudicated at all (BASELINE.md sentinel rule)
sent = [cur.get(f"load_sentinel_{k}") for k in ("start", "mid", "end")]
if any(s is not None and s > 0.5 for s in sent):
    print(f"RUN SUSPECT: sentinels {sent} above the 0.5 s quiet bound — "
          "re-run on a quiet box before reading per-query deltas")
    sys.exit(0)

# parallel-capacity band (r15): one long ALU task per core — quiet band
# documented in BASELINE.md. Bound = 3x the baseline's own worst par
# sample when the baseline carries one (same box class), else the
# absolute documented bound. Out of band does NOT make the run
# unreadable (walls of map-only queries may still be fine); it
# downgrades REGRESSION verdicts to CONTENTION(capacity) below.
par = [cur.get(f"load_sentinel_par_{k}") for k in ("start", "mid", "end")]
base_par = [base.get(f"load_sentinel_par_{k}") for k in ("start", "mid", "end")]
base_par_max = max((s for s in base_par if s is not None), default=None)
par_bound = max(1.8, 3 * base_par_max) if base_par_max else 1.8
capacity_collapsed = any(s is not None and s > par_bound for s in par)
if capacity_collapsed:
    print(f"CAPACITY SUSPECT: parallel sentinels {par} above the "
          f"{par_bound:.1f} s band — wall>2x rows print as "
          f"CONTENTION(capacity), re-time on a quiet box to adjudicate")

cw, bw = cur["queries"], base["queries"]
cc, bc = cur.get("queries_cpu_sec", {}), base.get("queries_cpu_sec", {})
regressions = []
for q, w in sorted(cw.items()):
    if w < 0:
        print(f"ERROR      {q}: errored in current run")
        regressions.append(q)
        continue
    b = bw.get(q)
    if b is None or b < 0:
        print(f"new        {q}: {w:.2f} s (no baseline)")
        continue
    if b < 0.2 and w < 0.5:
        continue  # sub-noise rows
    ratio = w / max(b, 1e-9)
    if ratio > 2.0:
        # a missing current-cpu entry is UNADJUDICABLE, not evidence of
        # contention: defaulting it to 0 would classify every >2x wall
        # regression from a cpu-less run as "contended" and exit 0 — the
        # silent-pass failure mode. Count it as a regression and say why.
        if q not in cc:
            print(f"REGRESSION {q}: wall {b:.2f} -> {w:.2f} s ({ratio:.1f}x), "
                  f"no cpu sample in current run — unadjudicable, re-run "
                  f"with queries_cpu_sec populated")
            regressions.append(q)
            continue
        cpu_ratio = cc.get(q, 0) / max(bc.get(q, 1e-9), 1e-9)
        if cpu_ratio > 1.5:
            if capacity_collapsed:
                print(f"CONTENTION(capacity) {q}: wall {b:.2f} -> {w:.2f} s "
                      f"({ratio:.1f}x), cpu {cpu_ratio:.1f}x — par sentinel "
                      f"out of band, not adjudicable as a regression")
            else:
                print(f"REGRESSION {q}: wall {b:.2f} -> {w:.2f} s ({ratio:.1f}x), "
                      f"cpu {bc.get(q, 0):.1f} -> {cc.get(q, 0):.1f} s ({cpu_ratio:.1f}x)")
                regressions.append(q)
        else:
            print(f"contended  {q}: wall {b:.2f} -> {w:.2f} s but cpu flat "
                  f"({bc.get(q, 0):.1f} -> {cc.get(q, 0):.1f} s) — external load")
print(f"\ntotal {base['value']:.1f} -> {cur['value']:.1f} s; "
      f"{len(regressions)} regression(s)")
sys.exit(1 if regressions else 0)

#!/usr/bin/env python3
"""Merge N graft.Bench detail files into one per-query-median record.

Usage: tools/median_bench.py OUT.json RUN1.json RUN2.json [RUN3.json ...]

The census gate must measure code, not box mood (r14 verdict item 1):
single runs on a shared host carry hypervisor-steal bursts that
inflate random rows 10-30x (measured r16; Bench records steal_pm per
run since then). The per-query MEDIAN across same-session runs kills
uncorrelated bursts; the merged record keeps each contributing run's
total and steal_pm in a note so the conditions stay auditable.
Queries missing from any run (or failed anywhere) are carried into
`failed` unless at least two runs timed them.
"""
import json
import statistics
import sys


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    assert len(run_paths) >= 2, "need at least 2 runs to take a median"
    runs = [json.load(open(p)) for p in run_paths]
    names = sorted({q for r in runs for q in r["queries"]})
    queries, failed = {}, sorted({f for r in runs for f in r.get("failed", [])})
    for q in names:
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        if len(vals) >= 2:
            queries[q] = round(statistics.median(vals), 3)
        elif q not in failed:
            failed.append(q)
    merged = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "failed": failed,
        "spill_mb": max(r.get("spill_mb", 0) for r in runs),
        "heap_mb": runs[0].get("heap_mb"),
        "sf": runs[0]["sf"],
        "note": (
            "per-query median of %d runs; totals %s; steal_pm %s"
            % (
                len(runs),
                [r["value"] for r in runs],
                [r.get("steal_pm") for r in runs],
            )
        ),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(json.dumps({k: merged[k] for k in ("value", "failed", "note")}))


if __name__ == "__main__":
    main()

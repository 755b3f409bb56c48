#!/usr/bin/env python3
"""Diff two Bench per-query JSON maps (BENCH_SELF*.json or a driver
BENCH_r*.json tail) and print regressions/improvements sorted by ratio.

Usage: python3 tools/benchdiff.py <old.json> <new.json> [min_ratio]
           [--confirm <other_new.json>]

Accepts either the full one-line Bench JSON ({"queries": {...}}) or a
driver capture whose "tail" field embeds a truncated queries map — in
the latter case only the queries present in the capture are compared.

PROTOCOL (round 10+): the committed clean exclusive-CPU sweep
(BENCH_SELF_r*.json) is the regression record — driver-host captures
carry contention scatter that has produced a phantom >1.5x "regression"
every round (r8 word_ktruss, r9 dedup_keep_best_quality), so a
driver-capture ratio alone is NOT adjudicable. Compare clean vs clean
by default; when a driver capture looks regressed, pass it as
--confirm alongside the clean sweep: a query is flagged only if BOTH
captures exceed min_ratio. One capture over = "suspect (not confirmed)"
— re-measure with BenchOne min-of-3 before believing it.
"""
import json
import re
import sys


def load_queries(path: str) -> dict:
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and isinstance(d.get("queries"), dict):
            return d["queries"]
        if isinstance(d, dict) and isinstance(d.get("tail"), str):
            raw = d["tail"]
    except json.JSONDecodeError:
        pass
    # salvage "name":seconds pairs from a truncated capture
    return {m.group(1): float(m.group(2)) for m in
            re.finditer(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', raw)}


def main(old_path: str, new_path: str, min_ratio: float = 1.3,
         confirm_path: str = None) -> int:
    old, new = load_queries(old_path), load_queries(new_path)
    confirm = load_queries(confirm_path) if confirm_path else None
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries between the two captures")
        return 1
    rows = [(new[q] / old[q] if old[q] > 0 else float("inf"),
             old[q], new[q], q) for q in shared]
    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}  "
          f"old total {tot_old:.1f}s  new total {tot_new:.1f}s  "
          f"ratio {tot_new / tot_old:.2f}x")
    worst = sorted((r for r in rows if r[0] >= min_ratio), reverse=True)
    best = sorted(r for r in rows if r[0] <= 1 / min_ratio)
    if worst and confirm is not None:
        # two-capture protocol: regressed only if BOTH captures agree
        confirmed, suspect = [], []
        for ratio, o, n, q in worst:
            c_ratio = confirm[q] / old[q] if old.get(q) and q in confirm \
                else None
            (confirmed if c_ratio is not None and c_ratio >= min_ratio
             else suspect).append((ratio, o, n, q, c_ratio))
        if confirmed:
            print(f"\nCONFIRMED regressions >= {min_ratio}x in BOTH captures:")
            for ratio, o, n, q, c in confirmed:
                print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x; "
                      f"confirm {c:.2f}x)")
        if suspect:
            print(f"\nsuspect (NOT confirmed by the second capture — "
                  f"treat as host noise, adjudicate with BenchOne):")
            for ratio, o, n, q, c in suspect:
                cs = f"{c:.2f}x" if c is not None else "absent"
                print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x; "
                      f"confirm {cs})")
    elif worst:
        print(f"\nregressions >= {min_ratio}x:")
        for ratio, o, n, q in worst:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    if best:
        print(f"\nimprovements <= {1/min_ratio:.2f}x:")
        for ratio, o, n, q in best:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew-only queries ({len(only_new)}): {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    confirm = None
    if "--confirm" in argv:
        i = argv.index("--confirm")
        confirm = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1],
                  float(argv[2]) if len(argv) > 2 else 1.3, confirm))

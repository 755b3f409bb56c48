#!/usr/bin/env python3
"""Diff two Bench per-query JSON maps (BENCH_SELF*.json or a driver
BENCH_r*.json tail) and print regressions/improvements sorted by ratio.

Usage: python3 tools/benchdiff.py <old.json> <new.json> [min_ratio]

Accepts either the full one-line Bench JSON ({"queries": {...}}) or a
driver capture whose "tail" field embeds a truncated queries map — in
the latter case only the queries present in the capture are compared.
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


def main(old_path: str, new_path: str, min_ratio: float = 1.3) -> int:
    old, new = load_queries(old_path), load_queries(new_path)
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
    if worst:
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.3))

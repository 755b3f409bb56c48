#!/usr/bin/env python3
"""Diff two PLAN_SNAPSHOT.json files (query -> normalized-plan digest)
and list queries whose physical-plan skeleton changed — the candidates
for a human plan review. Timing noise can't hide a lost broadcast or a
new exchange here.

Usage: python3 tools/plandiff.py <old.json> <new.json>
"""
import json
import sys


def main(old_path: str, new_path: str) -> int:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    changed = sorted(q for q in set(old) & set(new) if old[q] != new[q])
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    errors = sorted(q for q, v in new.items() if v == "ERROR")
    print(f"shared: {len(set(old) & set(new))}  "
          f"changed: {len(changed)}  added: {len(added)}  "
          f"removed: {len(removed)}  errors: {len(errors)}")
    for label, names in (("changed", changed), ("added", added),
                         ("removed", removed), ("errors", errors)):
        if names:
            print(f"\n{label}:")
            for q in names:
                print(f"  {q}")
    return 1 if (changed or errors) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

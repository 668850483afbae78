#!/usr/bin/env python3
"""Compare a fresh Bench JSON line against prior BENCH_r*.json recordings.

Usage: bench_compare.py <new_bench.json> <old_bench.json> [threshold]

Each file holds one JSON object; per-query seconds live either in a
"queries" map or (driver recordings) concatenated in the "tail" string.
Prints the shared-query ratio (sum of new / sum of old) and every query
whose ratio exceeds the threshold (default 1.5) in either direction.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)  # driver recordings: whole-file JSON
    except json.JSONDecodeError:
        # harness wrappers: one "[info] {...}" line plus EXIT noise
        line = next(l for l in txt.splitlines() if '"metric"' in l)
        d = json.loads(line[line.index('{'):])
    if isinstance(d.get("queries"), dict):
        return d["queries"]
    tail = d.get("tail", "") or ""
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    return {k: float(v) for k, v in
            re.findall(r'"([a-z0-9_]+)":([0-9.]+)', tail)}


def main():
    new, old = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(new) & set(old))
    sn, so = sum(new[q] for q in shared), sum(old[q] for q in shared)
    print(f"shared {len(shared)} queries: new {sn:.1f}s old {so:.1f}s "
          f"ratio {sn / so:.2f}")
    movers = [(new[q] / old[q], q) for q in shared
              if old[q] > 0.2 and (new[q] / old[q] > thr
                                   or old[q] / new[q] > thr)]
    for r, q in sorted(movers, reverse=True):
        print(f"  {q}: {old[q]:.2f}s -> {new[q]:.2f}s  ({r:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        tot = sum(new[q] for q in only_new)
        print(f"new-only: {len(only_new)} queries, {tot:.1f}s total")
        for q in only_new:
            print(f"  {q}: {new[q]:.2f}s")


if __name__ == "__main__":
    main()

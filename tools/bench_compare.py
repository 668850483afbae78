#!/usr/bin/env python3
"""Compare a fresh Bench JSON line against prior BENCH_r*.json recordings.

Usage:
  bench_compare.py <new_bench.json> <old_bench.json> [threshold]
  bench_compare.py --triage <full_session.json> <fresh_medians.json> [factor]

Each file holds one JSON object; per-query seconds live either in a
"queries" map or (driver recordings) concatenated in the "tail" string.

Default mode prints the shared-query ratio (sum of new / sum of old)
and every query whose ratio exceeds the threshold (default 1.5) in
either direction.

--triage is the driver-recording insurance (round 6's t01 lesson: a
shared-JVM recording showed 6.4x on code two fresh-JVM medians put at
0.63x): it flags every query whose full-session median exceeds
`factor` (default 2.0) times its fresh-JVM per-family median
(tools/bench_fresh.sh produces that file) and emits the triage list
ready for BENCH notes. Exit code 1 when anything is flagged, so the
check scripts cleanly.
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


def triage(full_path, fresh_path, factor):
    full, fresh = load(full_path), load(fresh_path)
    shared = sorted(set(full) & set(fresh))
    missing = sorted(set(full) - set(fresh))
    flagged = [(full[q] / fresh[q], q) for q in shared
               if fresh[q] > 0.2 and full[q] > factor * fresh[q]]
    print(f"triage: {len(shared)} queries with fresh-JVM medians, "
          f"factor {factor}")
    if missing:
        print(f"  (no fresh median for {len(missing)}: "
              f"{', '.join(missing[:8])}{'...' if len(missing) > 8 else ''})")
    if not flagged:
        print("  CLEAN: no query's session median exceeds "
              f"{factor}x its fresh-JVM median")
        return 0
    print(f"  FLAGGED {len(flagged)} — session pressure suspects, "
          "re-measure before believing the recording:")
    for r, q in sorted(flagged, reverse=True):
        print(f"  {q}: session {full[q]:.2f}s vs fresh {fresh[q]:.2f}s "
              f"({r:.2f}x)")
    return 1


def main():
    if sys.argv[1] == "--triage":
        factor = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
        sys.exit(triage(sys.argv[2], sys.argv[3], factor))
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

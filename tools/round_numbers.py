#!/usr/bin/env python3
"""Extract ROUND{N}.md figures FROM the final committed artifacts.

The r14 verdict found the round notes carrying stale numbers because
late-round additions regenerated the artifacts after the prose was
written. This script makes the numbers derived, not transcribed: run it
against the FINAL BENCHFULL_r{N}.json / BENCHDIFF_r{N}.txt (and the
previous round's BENCHFULL) and paste its output into ROUND{N}.md.

Usage: python3 tools/round_numbers.py BENCHFULL_r15.json \
           [BENCHFULL_r14.json] [BENCHDIFF_r15.txt]
"""
import json
import re
import sys


def load_bench(path):
    with open(path) as f:
        txt = f.read()
    line = next(l for l in txt.splitlines() if '"metric"' in l)
    return json.loads(line[line.index("{"):])


def main():
    cur = load_bench(sys.argv[1])
    prev = load_bench(sys.argv[2]) if len(sys.argv) > 2 else None
    diff = open(sys.argv[3]).read() if len(sys.argv) > 3 else None

    med = cur["queries"]
    mins = cur.get("queries_min", med)
    print(f"artifact: {sys.argv[1]}")
    print(f"queries: {len(med)}  reps: {cur.get('reps', 1)}"
          f"  isolated: {cur.get('isolated', False)}")
    print(f"median-sum: {sum(med.values()):.1f} s"
          f"  min-sum: {sum(mins.values()):.1f} s")
    if "failed" in cur:
        print(f"FAILED: {cur['failed']}")
    if "sentinel_first" in cur:
        print(f"sentinels: {cur['sentinel_first']:.2f}"
              f" -> {cur['sentinel_last']:.2f}")
    top = sorted(mins.items(), key=lambda kv: -kv[1])[:5]
    print("top-5 by min:",
          ", ".join(f"{k}={v:.1f}s" for k, v in top))
    if prev is not None:
        pmin = prev.get("queries_min", prev["queries"])
        shared = sorted(set(mins) & set(pmin))
        new = sorted(set(mins) - set(pmin))
        if shared:
            ratios = sorted(mins[k] / pmin[k] for k in shared if pmin[k] > 0)
            median_ratio = ratios[len(ratios) // 2]
            print(f"vs {sys.argv[2]}: shared={len(shared)}"
                  f"  shared-sum {sum(pmin[k] for k in shared):.1f}"
                  f" -> {sum(mins[k] for k in shared):.1f} s"
                  f"  median ratio {median_ratio:.3f}x")
        if new:
            print("new queries:",
                  ", ".join(f"{k}={mins[k]:.2f}s" for k in new))
    if diff is not None:
        head = next(l for l in diff.splitlines() if "basis=" in l)
        print(f"benchdiff: {head.strip()}")
        m = re.search(r"sentinel cap ([0-9.]+)x", head)
        if m:
            print(f"sentinel cap: {m.group(1)}x")


if __name__ == "__main__":
    main()

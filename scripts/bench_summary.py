"""Summarize a BENCHLOG_r*.jsonl into a winner table.

Groups the queue's JSON lines by bench step, keeps each step's
best (highest rays/s) result, and prints a sorted table plus the
decisions the log supports (mt-impl A/B, best sparse knobs). Pure
post-processing — run anywhere.

Usage: python scripts/bench_summary.py [--log BENCHLOG_r3.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--log", default=os.path.join(REPO, "BENCHLOG_r3.jsonl"))
    args = p.parse_args()

    rows, errors = [], []
    with open(args.log) as f:
        for line in f:
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            name = obj.get("bench")
            if not name or name == "queue":
                continue
            if "error" in obj:
                errors.append((name, obj["error"]))
            elif "rays_per_s" in obj or "value" in obj:
                rows.append(obj)
            elif "gtest_per_s" in obj or "ms_per_sweep" in obj:
                rows.append(obj)

    large = [r for r in rows if "rays_per_s" in r
             and ("large" in r["bench"] or r["bench"].startswith("r3_"))]
    cornell = [r for r in rows if r["bench"].startswith("cornell")]
    other = [r for r in rows if r not in large and r not in cornell]

    if cornell:
        print("== Cornell headline (bench.py) ==")
        for r in cornell:
            print(f"  {r['bench']:28s} {r.get('value', '?'):>12} "
                  f"{r.get('unit', '')} vs_baseline={r.get('vs_baseline')}")
    if large:
        print("== 100k-triangle box field (rays/s, best first) ==")
        for r in sorted(large, key=lambda r: -r["rays_per_s"]):
            print(f"  {r['bench']:28s} {r['rays_per_s'] / 1e6:8.2f} Mrays/s"
                  f"  ({r.get('ms_per_render', '?')} ms)"
                  f"  config={r.get('config')}")
        best = max(large, key=lambda r: r["rays_per_s"])
        print(f"  -> winner: {best['bench']} "
              f"({best['rays_per_s'] / 1e6:.2f} Mrays/s)")
    if other:
        print("== probes ==")
        for r in other:
            print(f"  {json.dumps(r)}")
    if errors:
        print("== errors ==")
        for name, err in errors:
            print(f"  {name}: {err}")


if __name__ == "__main__":
    main()

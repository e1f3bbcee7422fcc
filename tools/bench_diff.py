#!/usr/bin/env python3
"""Diff two bench artifacts (full JSON lines, or raw captured tails).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--top N]

Prints common-query totals, the median ratio (the honest drift number on
a noisy host — see ROUND5.md), and the biggest per-query regressions /
improvements. Accepts either a clean one-line JSON artifact
(bench_full.json / BENCH_r0N_local_w8.json) or a raw stdout tail that
merely CONTAINS the JSON line.
"""
import json
import re
import statistics
import sys


def load(path):
    raw = open(path).read()
    m = re.search(r'\{"metric".*\}', raw, re.DOTALL)
    d = json.loads(m.group(0) if m else raw)
    return d["queries"]


def stats(old_path, new_path):
    """Machine-readable summary for the gate JSON (gate.sh --json mode):
    median/worst/best per-query ratio over the common queries."""
    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        return {"prev": old_path, "n_common": 0}
    rats = sorted(((new[q] / max(old[q], 1e-9), q) for q in common),
                  reverse=True)
    med = statistics.median(r for r, _ in rats)
    return {
        "prev": old_path,
        "n_common": len(common),
        "median_ratio_vs_prev": round(med, 3),
        "worst_ratio": round(rats[0][0], 3),
        "worst_query": rats[0][1],
        "best_ratio": round(rats[-1][0], 3),
        "best_query": rats[-1][1],
    }


def main(old_path, new_path, top=10):
    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return 1
    so, sn = sum(old[q] for q in common), sum(new[q] for q in common)
    rats = sorted(((new[q] / max(old[q], 1e-9), q) for q in common),
                  reverse=True)
    med = statistics.median(r for r, _ in rats)
    print(f"common {len(common)}  old {so:.1f}s  new {sn:.1f}s  "
          f"median ratio {med:.2f}x")
    print(f"only-old: {sorted(set(old) - set(new))[:8]}")
    print(f"only-new: {sorted(set(new) - set(old))[:8]}")
    print("\nworst regressions (new/old):")
    for r, q in rats[:top]:
        print(f"  {r:6.2f}x  {old[q]:7.2f} -> {new[q]:7.2f}  {q}")
    print("\nbest improvements:")
    for r, q in rats[-top:]:
        print(f"  {r:6.2f}x  {old[q]:7.2f} -> {new[q]:7.2f}  {q}")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
        args = [a for a in args if a != str(top)]
    if "--json" in sys.argv:
        print(json.dumps(stats(args[0], args[1])))
        sys.exit(0)
    sys.exit(main(args[0], args[1], top))

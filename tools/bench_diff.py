#!/usr/bin/env python3
"""Diff two bench artifacts (full JSON lines, or raw captured tails).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--top N]

Prints common-query totals, the median ratio (the honest drift number on
a noisy host — see ROUND5.md), and the biggest per-query regressions /
improvements. Accepts either a clean one-line JSON artifact
(bench_full.json / BENCH_r0N_local_w8.json) or a raw stdout tail that
merely CONTAINS the JSON line.

Sub-200 ms rows (in EITHER artifact) are reported in their own band:
cache-sensitive fixture scans (q_binary_scan, q_mkv_scan,
q_media_catalog, ...) bounce 0.3x-3.3x between runs with unchanged plans
— page-cache state, not plans — and kept surfacing as "worst_ratio"
false regressions. The headline median/worst/best covers only rows big
enough for a ratio to reflect a plan.
"""
import json
import re
import statistics
import sys

SMALL_SEC = 0.2  # rows under this in either run are noise-banded


def load(path):
    raw = open(path).read()
    m = re.search(r'\{"metric".*\}', raw, re.DOTALL)
    d = json.loads(m.group(0) if m else raw)
    return d["queries"]


def split_bands(old, new):
    common = sorted(set(old) & set(new))
    big = [q for q in common if old[q] >= SMALL_SEC and new[q] >= SMALL_SEC]
    big_set = set(big)
    small = [q for q in common if q not in big_set]
    return common, big, small


def ratios(old, new, qs):
    return sorted(((new[q] / max(old[q], 1e-9), q) for q in qs), reverse=True)


def stats(old_path, new_path):
    """Machine-readable summary for the gate JSON (gate.sh --json mode):
    median/worst/best per-query ratio over the common queries big enough
    to carry a plan signal, plus the sub-200ms band reported separately."""
    old, new = load(old_path), load(new_path)
    common, big, small = split_bands(old, new)
    if not common:
        return {"prev": old_path, "n_common": 0}
    out = {"prev": old_path, "n_common": len(common),
           "n_sub200ms": len(small)}
    scored = big if big else common  # degenerate: all-small artifacts
    rats = ratios(old, new, scored)
    med = statistics.median(r for r, _ in rats)
    out.update({
        "median_ratio_vs_prev": round(med, 3),
        "worst_ratio": round(rats[0][0], 3),
        "worst_query": rats[0][1],
        "best_ratio": round(rats[-1][0], 3),
        "best_query": rats[-1][1],
    })
    if small:
        srats = ratios(old, new, small)
        out["sub200ms"] = {
            "median_ratio": round(statistics.median(r for r, _ in srats), 3),
            "worst_ratio": round(srats[0][0], 3),
            "worst_query": srats[0][1],
        }
    return out


def main(old_path, new_path, top=10):
    old, new = load(old_path), load(new_path)
    common, big, small = split_bands(old, new)
    if not common:
        print("no common queries")
        return 1
    so, sn = sum(old[q] for q in common), sum(new[q] for q in common)
    scored = big if big else common
    rats = ratios(old, new, scored)
    med = statistics.median(r for r, _ in rats)
    print(f"common {len(common)} ({len(small)} sub-200ms noise-banded)  "
          f"old {so:.1f}s  new {sn:.1f}s  median ratio {med:.2f}x")
    print(f"only-old: {sorted(set(old) - set(new))[:8]}")
    print(f"only-new: {sorted(set(new) - set(old))[:8]}")
    print("\nworst regressions (new/old, >=200ms rows):")
    for r, q in rats[:top]:
        print(f"  {r:6.2f}x  {old[q]:7.2f} -> {new[q]:7.2f}  {q}")
    print("\nbest improvements:")
    for r, q in rats[-top:]:
        print(f"  {r:6.2f}x  {old[q]:7.2f} -> {new[q]:7.2f}  {q}")
    if small:
        srats = ratios(old, new, small)
        smed = statistics.median(r for r, _ in srats)
        print(f"\nsub-200ms band ({len(small)} rows, median {smed:.2f}x — "
              "page-cache noise, not plans):")
        for r, q in srats[:5]:
            print(f"  {r:6.2f}x  {old[q]:7.3f} -> {new[q]:7.3f}  {q}")
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

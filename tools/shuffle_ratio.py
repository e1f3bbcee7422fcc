#!/usr/bin/env python3
"""Compare two ShuffleAudit artifacts (e.g. sf0.1 vs sf1): per-query
shuffle-write growth, sorted by ratio. Bytes are plan-deterministic, so
unlike wall-clock ratios these numbers adjudicate scaling claims
directly: a linear plan on 10x data shuffles ~10x the bytes; anything
far above that is the algorithm (pair blowup, widened state), not host
noise.

Usage: python3 tools/shuffle_ratio.py small.json big.json [--json]
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv
    small, big = load(args[0]), load(args[1])
    common = sorted(set(small) & set(big) - {"_unattributed"})
    rows = []
    for q in common:
        s, b = small[q], big[q]
        if s["sw"] == 0 and b["sw"] == 0:
            ratio = 1.0  # shuffle-free at both scales — the best row there is
        elif s["sw"] == 0:
            ratio = float("inf")
        else:
            ratio = b["sw"] / s["sw"]
        rows.append((ratio, q, s["sw"], b["sw"], b["spill_disk"] + b["spill_mem"]))
    rows.sort(reverse=True)
    ratios = [r for r, *_ in rows if r != float("inf")]
    zero_shuffle = [q for r, q, s, b, _ in rows if s == 0 and b == 0]
    spilled = [q for r, q, s, b, sp in rows if sp > 0]
    if as_json:
        print(json.dumps({
            "n_common": len(common),
            "median_sw_ratio": round(statistics.median(ratios), 2) if ratios else None,
            "n_zero_shuffle": len(zero_shuffle),
            "n_spilled_big": len(spilled),
            "top": [{"q": q, "ratio": None if r == float("inf") else round(r, 2),
                     "sw_small": s, "sw_big": b} for r, q, s, b, _ in rows[:12]],
        }))
        return
    print(f"{'ratio':>9}  {'small sw':>12}  {'big sw':>14}  query")
    for r, q, s, b, sp in rows:
        spill = "  SPILL" if sp else ""
        rs = "inf" if r == float("inf") else f"{r:.2f}x"
        print(f"{rs:>9}  {s:>12,}  {b:>14,}  {q}{spill}")
    if ratios:
        print(f"\nmedian sw ratio: {statistics.median(ratios):.2f}x over "
              f"{len(common)} queries; {len(zero_shuffle)} shuffle-free at both "
              f"scales; {len(spilled)} spilled at the big scale")


if __name__ == "__main__":
    main()

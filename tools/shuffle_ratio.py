#!/usr/bin/env python3
"""Compare two ShuffleAudit artifacts (e.g. sf0.1 vs sf1): per-query
shuffle growth, sorted by ratio. Bytes are plan-deterministic, so unlike
wall-clock ratios these numbers adjudicate scaling claims directly; when
the artifacts carry record counts (sw_rec), the table shows BOTH — rows
are the incompressible truth (byte ratios fold in shuffle-compression
drift as key spaces widen), so rows adjudicate the plan and bytes the
wire cost.

Usage: python3 tools/shuffle_ratio.py small.json big.json [--json]
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def ratio(a, b):
    if a == 0 and b == 0:
        return 1.0
    if a == 0:
        return float("inf")
    return b / a


def main():
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv
    small, big = load(args[0]), load(args[1])
    common = sorted(set(small) & set(big) - {"_unattributed"})
    has_rec = all("sw_rec" in small[q] and "sw_rec" in big[q] for q in common)
    rows = []
    for q in common:
        s, b = small[q], big[q]
        r_bytes = ratio(s["sw"], b["sw"])
        r_rec = ratio(s.get("sw_rec", 0), b.get("sw_rec", 0)) if has_rec else None
        rows.append((r_rec if has_rec else r_bytes, r_bytes, q, s, b))
    rows.sort(key=lambda r: -1e18 if r[0] == float("inf") else -r[0])
    key_ratios = [r for r, *_ in rows if r != float("inf")]
    spilled = [q for _, _, q, s, b in rows
               if b["spill_disk"] + b["spill_mem"] > 0]
    if as_json:
        print(json.dumps({
            "n_common": len(common),
            "ranked_by": "sw_rec" if has_rec else "sw",
            "median_ratio": round(statistics.median(key_ratios), 2) if key_ratios else None,
            "n_spilled_big": len(spilled),
            "top": [{"q": q, "ratio": None if r == float("inf") else round(r, 2),
                     "bytes_ratio": None if rb == float("inf") else round(rb, 2)}
                    for r, rb, q, s, b in rows[:12]],
        }))
        return
    unit = "rows" if has_rec else "bytes"
    print(f"ranked by shuffle-write {unit} ratio")
    hdr = f"{'ratio':>9}  {'bytes':>9}  {'small':>14}  {'big':>16}  query"
    print(hdr)
    for r, rb, q, s, b in rows:
        sv = s["sw_rec"] if has_rec else s["sw"]
        bv = b["sw_rec"] if has_rec else b["sw"]
        spill = "  SPILL" if b["spill_disk"] + b["spill_mem"] > 0 else ""
        rs = "inf" if r == float("inf") else f"{r:.2f}x"
        rbs = "inf" if rb == float("inf") else f"{rb:.1f}x"
        print(f"{rs:>9}  {rbs:>9}  {sv:>14,}  {bv:>16,}  {q}{spill}")
    if key_ratios:
        print(f"\nmedian sw {unit} ratio: {statistics.median(key_ratios):.2f}x over "
              f"{len(common)} queries; {len(spilled)} spilled at the big scale")


if __name__ == "__main__":
    main()

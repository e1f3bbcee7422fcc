#!/usr/bin/env python3
"""Diff two Verify output dirs row-for-row (order-insensitive).

Usage:
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sfDir> /tmp/det_a"
  SPARK_GRAFT_CPUS=4 sbt "runMain graft.Verify <sfDir> /tmp/det_b"
  python3 tools/determinism.py /tmp/det_a /tmp/det_b

Running the two dumps at DIFFERENT core counts (→ different
shuffle.partitions, different range-partition sampling, different
monotonically_increasing_id values) proves every query's OUTPUT is
parallelism-independent — the engine's determinism contract, and the
property the driver's hash compare implicitly depends on.
"""
import glob
import os
import sys

import duckdb


def main(dir_a, dir_b):
    con = duckdb.connect()
    ok = bad = 0
    for d in sorted(os.listdir(dir_a)):
        pa = glob.glob(f"{dir_a}/{d}/*.parquet")
        pb = glob.glob(f"{dir_b}/{d}/*.parquet")
        if not pa or not pb:
            continue
        a = con.execute(f"SELECT * FROM read_parquet({pa!r})").fetchall()
        b = con.execute(f"SELECT * FROM read_parquet({pb!r})").fetchall()
        ra = sorted(tuple(map(repr, r)) for r in a)
        rb = sorted(tuple(map(repr, r)) for r in b)
        if ra != rb:
            bad += 1
            diff = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y]
            print(f"NONDETERMINISTIC {d}: rows {len(a)} vs {len(b)}, "
                  f"first diff at {diff[0] if diff else 'length'}")
        else:
            ok += 1
    print(f"\n{ok} deterministic, {bad} nondeterministic")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads Verify.scala's output dir (one parquet dir per query +
oracle_sql.json), runs each oracle SQL in DuckDB against the same
scale-factor parquet tables, and compares: row count, column names
(sorted), and a hash over values with columns sorted by name.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — bit-for-bit check
    return repr(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]


def audit_types(sf_dir, out_dir, only=None):
    """Flag oracle output columns whose DuckDB type is a wide integer or
    decimal (HUGEINT from sum(BIGINT), DECIMAL, ...) while the Spark dump
    is a plain int64/double. The driver's comparator is type-sensitive
    (round 4: q_compaction_plan / q_pq_codes hash-failed on exactly this),
    while this script's repr-based hash is not — so run this audit too.
    """
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"AUDIT-ERR {name}: {e}")
            n_flag += 1
            continue
        bad = [(c, t) for c, t, *_ in desc
               if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")]
        if bad:
            print(f"TYPE {name}: {bad}")
            n_flag += 1
    print(f"\n{n_flag} oracles flagged")
    return 1 if n_flag else 0


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.description]
        try:
            want = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        wcols = [d[0] for d in con.description]
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_bad += 1
            continue
        g, w = table_hash(got, gcols), table_hash(want, wcols)
        if g != w:
            diffs = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first at {diffs[0]}:")
            print(f"  spark : {g[diffs[0]]}")
            print(f"  oracle: {w[diffs[0]]}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(got)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    # --only q_a,q_b restricts both modes to a query subset (the quick
    # pre-commit gate's targeted verify dumps only the touched queries)
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    if "--types" in argv:
        args = [a for a in argv if a != "--types"]
        sys.exit(audit_types(args[0], args[1], only))
    sys.exit(main(argv[0], argv[1], only))

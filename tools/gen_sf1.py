#!/usr/bin/env python3
"""Scale sf0.1 -> sf1 (10x) for the local scaling-curve measurement.

The driver generated sf0.001-0.1; no generator ships with the snapshot, so
this replicates sf0.1 ten times with FK-consistent key shifts. Design goals
(so the measured exponent means something):

- keys shift by copy * (max_key + 1) per key space, so all FK joins keep
  exactly the sf0.1 fan-out (10x groups, same group sizes);
- document text is perturbed per copy (every token suffixed with the copy
  tag, copy 0 kept verbatim) so cross-copy Jaccard is ~0: the duplicate /
  near-duplicate GROUP-SIZE distribution matches sf0.1 with 10x the groups
  -- naive replication would instead square the near-dup pair count and
  fake a super-linear exponent for the dedup family;
- embeddings get a small copy-dependent, dimension-dependent offset so no
  cross-copy vector sits at distance 0 (same reasoning for ANN);
- event/order timestamps are kept, so time-window queries see 10x density
  over the same horizon (windows hold 10x rows, window count unchanged).

Output: /tmp/graft_sf1/*.parquet (NOT committed; /root/testdata is
read-only by contract). Deterministic -- pure arithmetic on the source.
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS cp")

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def shift(t, key):
    return con.sql(f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()[0]

K_CUST = shift("customer", "c_custkey")
K_SUPP = shift("supplier", "s_suppkey")
K_PART = shift("part", "p_partkey")
K_ORD = shift("orders", "o_orderkey")
K_EVT = shift("events", "event_id")
K_USER = shift("events", "user_id")
K_DOC = shift("documents", "doc_id")
K_VEC = shift("embeddings", "vec_id")

def gen(name, sql):
    con.execute(
        f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")

# fixed dimensions: verbatim
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM {src(t)}")

gen("customer", f"""
  SELECT c_custkey + cp * {K_CUST} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')}, copies""")

gen("supplier", f"""
  SELECT s_suppkey + cp * {K_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')}, copies""")

gen("part", f"""
  SELECT p_partkey + cp * {K_PART} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')}, copies""")

gen("orders", f"""
  SELECT o_orderkey + cp * {K_ORD} AS o_orderkey,
         o_custkey + cp * {K_CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, copies""")

gen("lineitem", f"""
  SELECT l_orderkey + cp * {K_ORD} AS l_orderkey,
         l_partkey + cp * {K_PART} AS l_partkey,
         l_suppkey + cp * {K_SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, copies""")

gen("events", f"""
  SELECT event_id + cp * {K_EVT} AS event_id, ts,
         user_id + cp * {K_USER} AS user_id, event_type, value, props
  FROM {src('events')}, copies""")

# copy 0 verbatim; copies 1..9 suffix every token -> cross-copy Jaccard ~0
gen("documents", f"""
  SELECT doc_id + cp * {K_DOC} AS doc_id,
         CASE WHEN cp = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1x' || cp, 'g') END AS text,
         lang, source,
         CAST(length(CASE WHEN cp = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1x' || cp, 'g') END) AS BIGINT)
           AS n_chars
  FROM {src('documents')}, copies""")

# per-copy, per-dimension offset: keeps intra-copy geometry, breaks
# cross-copy zero distances
gen("embeddings", f"""
  SELECT vec_id + cp * {K_VEC} AS vec_id,
         CASE WHEN cp = 0 THEN embedding
              ELSE list_transform(list_zip(embedding,
                     range(1, len(embedding) + 1)),
                   p -> CAST(p[1] + 0.003 * cp * ((CAST(p[2] AS INTEGER) % 7) - 3)
                        AS FLOAT)) END AS embedding,
         label
  FROM {src('embeddings')}, copies""")

print("done ->", DST)

#!/usr/bin/env bash
# Round-13 THIRD-WAVE measurement legs (registry 304: + q_canonical_alias,
# q_mime_route, q_backoff_plan; robots redirect-following; native frontier
# canonicalizer), sequential:
#   1. archive/crawl shuffle audit at x1 and x10 fixture scale
#   2. bloom/url-dedup shuffle audit at sf0.1 and sf1 (post native expr)
#   3. full-registry bench at sf1 (the sf0.1 -> sf1 curve; the sf0.1 leg
#      is the full gate's bench)
set -uo pipefail
cd "$(dirname "$0")/.."

ARCHIVE_QS="q_backoff_plan,q_canonical_alias,q_crawl_corpus,q_crawl_delta,q_crawl_pagerank,q_fetch_schedule,q_html_link_graph,q_main_content,q_mime_route,q_recrawl_plan,q_redirect_map,q_revalidate_plan,q_robots_frontier,q_sitemap_frontier,q_tar_scan,q_targz_scan,q_warc_html_extract,q_warc_revisit,q_warc_scan,q_zip_scan"

echo "[r13w3] archive audit x1"
SPARK_GRAFT_ONLY="$ARCHIVE_QS" SPARK_GRAFT_AUDIT_OUT=SHUFFLE_r13w3_archive_x1.json \
  tools/run_main.sh graft.tools.ShuffleAudit > /tmp/r13w3_audit_x1.log 2>&1
echo "rc=$?"

echo "[r13w3] archive audit x10"
SPARK_GRAFT_MEDIA_SCALE=10 SPARK_GRAFT_ONLY="$ARCHIVE_QS" \
  SPARK_GRAFT_AUDIT_OUT=SHUFFLE_r13w3_archive_x10.json \
  tools/run_main.sh graft.tools.ShuffleAudit > /tmp/r13w3_audit_x10.log 2>&1
echo "rc=$?"

echo "[r13w3] bloom audit sf0.1"
SPARK_GRAFT_ONLY="q_bloom_urlseen,q_url_dedup" \
  SPARK_GRAFT_AUDIT_OUT=SHUFFLE_r13w3_bloom_sf01.json \
  tools/run_main.sh graft.tools.ShuffleAudit > /tmp/r13w3_audit_bloom01.log 2>&1
echo "rc=$?"

echo "[r13w3] bloom audit sf1"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_ONLY="q_bloom_urlseen,q_url_dedup" \
  SPARK_GRAFT_AUDIT_OUT=SHUFFLE_r13w3_bloom_sf1.json \
  tools/run_main.sh graft.tools.ShuffleAudit > /tmp/r13w3_audit_bloom1.log 2>&1
echo "rc=$?"

echo "[r13w3] full-registry bench @ sf1"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1_full_r13w3.json \
  tools/run_main.sh graft.Bench > /tmp/r13w3_bench_sf1.log 2>&1
echo "rc=$?"

echo "[r13w3] audits done"

"""Benchmark harness — runs the headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

"value" is total wall-clock over the query set (each executed to completion
via a count/collect action, inputs read cold from parquet each time).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_poc_spark.plans.registry import queries  # noqa: E402
from cdc_poc_spark.session import get_spark  # noqa: E402

# The headline set: every implemented operator family, heaviest shapes first.
BENCH_QUERIES = [
    "cdc_enriched",
    "cdc_leaderboard",
    "cdc_content_stats",
    "cdc_user_engagement",
    "cdc_minute_window",
    "cdc_parse_envelope",
    "cdc_apply_changelog",
    "cdc_asof_enrich",
    "wh_pricing_summary",
    "wh_top_orders",
    "wh_hourly_events",
    "wh_window_frames",
    "wh_sessions",
    "wh_skew_salted_join",
    "wh_payload_json",
    "wh_scalar_subquery",
    "wh_range_join",
    "wh_explode_tokens",
    "text_stats",
    "text_fingerprints",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_cosine",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_knn_join_lsh",
    "sim_embedding_dups_lsh",
    "dedup_clusters",
    "pipeline_split_assign",
    "mm_decode_features",
    "mm_media_stats",
    "pipeline_clean_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("cdc-poc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()
    names = [n for n in BENCH_QUERIES if n in reg]
    # warm the JVM/codegen paths once on the smallest SF so the measured
    # numbers reflect steady-state execution, not first-query JIT; cover
    # each expression family (joins/aggs, higher-order hashing, Arrow UDFs)
    warmup = [n for n in (
        names[0], names[1], "dedup_simhash", "sim_topk_cosine", "mm_decode_features"
    ) if n in reg]
    for n in dict.fromkeys(warmup):
        reg[n](spark, "/root/testdata/sf0.001").count()
    timings: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        df = reg[n](spark, sf_dir)
        df.count()
        timings[n] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_clock_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

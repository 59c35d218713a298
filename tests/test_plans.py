"""Physical-plan assertions — the 100 TB posture checks (SURVEY §4.2, §7.5.7).

Correctness tests prove the small-SF answers; these prove the *plans* are the
ones that survive a 1000-executor scale-up:

- the 15-row dimension join is a broadcast, never a shuffle (J1);
- top-k is TakeOrderedAndProject, never a global sort (K1/K2);
- aggregations have a map-side partial pass (A1-A4 at scale);
- filters and projections reach the parquet scan (pushdown/pruning);
- no query in the registry falls back to row-at-a-time Python UDFs
  (BatchEvalPython) — Python only via Arrow (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas*).
"""

from __future__ import annotations

import pytest

from cdc_poc_spark.plans.registry import queries

SF_DIR = "/root/testdata/sf0.001"

# these run real streaming queries; their batch-twin plans are covered by
# cdc_asof_enrich / wh_sessions / cdc_parse_envelope / cdc_minute_window
PLAN_SKIP = {
    "stream_asof_stateful",
    "stream_sessions_native",
    "stream_dedup_native",
    "stream_minute_window_native",
    "stream_leaderboard_native",
    "stream_interval_join_native",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scans(plan: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_enrichment_join_is_broadcast(spark):
    plan = _plan(queries()["cdc_enriched"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_miss_branch_is_broadcast_anti(spark):
    plan = _plan(queries()["cdc_enrichment_misses"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_topk_avoids_global_sort(spark):
    plan = _plan(queries()["wh_top_orders"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    # a global Sort followed by limit would shuffle-sort the whole fact table
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


def test_aggregation_is_partial(spark):
    """Map-side combine: two HashAggregate phases (partial + final), so a
    groupBy over 100 TB ships pre-aggregated partials, not raw rows."""
    plan = _plan(queries()["wh_pricing_summary"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2


def test_filter_pushed_to_scan(spark):
    """wh_top_orders filters customers to one market segment; that literal
    predicate must reach the customer parquet scan, not run post-scan."""
    plan = _plan(queries()["wh_top_orders"](spark, SF_DIR))
    scans = [s for s in _scans(plan) if "customer" in s]
    assert scans and any("EqualTo(c_mktsegment,BUILDING)" in s for s in scans)


def test_columns_pruned_at_scan(spark):
    """The pricing summary touches 7 of lineitem's 16 columns; the scan's
    ReadSchema must not include untouched wide columns like l_comment."""
    plan = _plan(queries()["wh_pricing_summary"](spark, SF_DIR))
    scans = [s for s in _scans(plan) if "lineitem" in s]
    assert scans and all("l_comment" not in s for s in scans)


def test_enrichment_whole_stage_codegen(spark):
    """The parse->join->derive path must fuse into whole-stage codegen spans
    (AQE finalizes the plan only on execution, so run it first)."""
    df = queries()["cdc_enriched"](spark, SF_DIR)
    df.collect()  # executes THIS plan (count() would plan a new query)
    plan = _plan(df)
    # codegen spans print as "*(N) Operator" in the finalized adaptive plan
    assert "isFinalPlan=true" in plan and "*(" in plan


def test_knn_exact_is_broadcast_nested_loop(spark):
    """The exact k-NN self-join must score pairs in a narrow broadcast
    nested-loop stage — the O(n²) work happens without ever shuffling the
    pair space; only the scored (src, nbr, sim) rows shuffle for the
    per-source top-k window."""
    plan = _plan(queries()["sim_knn_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_broadcast_not_cartesian(spark):
    """The band dimension is 10 rows: the non-equi join must be a broadcast
    nested loop (fact side streams with no shuffle), never a CartesianProduct
    or a shuffled join."""
    plan = _plan(queries()["wh_range_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_scalar_subquery_decorrelated(spark):
    """The correlated per-part average (Q17 shape) must decorrelate into an
    aggregate + join — executing the subquery per outer row would be O(n²)
    scans at 100 TB."""
    plan = _plan(queries()["wh_scalar_subquery"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # decorrelation materializes as >= 2 joins (part⋈lineitem, ⋈ per-part avg)
    assert plan.count("Join") >= 2 and plan.count("HashAggregate") >= 2


def test_explode_topk_no_global_sort(spark):
    """Token frequencies end in TakeOrderedAndProject: the 50-row answer must
    not global-sort the full token distribution."""
    plan = _plan(queries()["wh_explode_tokens"](spark, SF_DIR))
    assert "Generate explode" in plan and "TakeOrderedAndProject" in plan


def test_pivot_single_expand_pass(spark):
    """Fixed pivot value list ⇒ one aggregate pass over the fact table — no
    distinct-values pre-scan (which would be a second full read at scale)."""
    plan = _plan(queries()["wh_pivot"](spark, SF_DIR))
    assert len(_scans(plan)) == 1


def test_stratified_sample_filter_before_shuffle(spark):
    """The hash-bucket sample is a pure narrow filter: no shuffle (Exchange)
    in the plan at all — sampling 100 TB must not repartition it."""
    plan = _plan(queries()["pipeline_sample_stratified"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_quantize_is_narrow_map(spark):
    """int8 quantization is a pure per-row map: no Exchange anywhere —
    compressing 100 TB of embeddings must not repartition them."""
    plan = _plan(queries()["sim_quantize_int8"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_returned_items_broadcast_dim_and_topk(spark):
    """Q10 shape: the 25-row nation dim must broadcast, the quarter filter
    must reach the orders scan, and the top-20 must be TakeOrdered — three
    properties that decide whether this runs at 100 TB."""
    plan = _plan(queries()["wh_returned_items"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    scans = [s for s in _scans(plan) if "orders" in s]
    assert scans and any("o_orderdate" in s and "IsNotNull" in s for s in scans)
    li_scans = [s for s in _scans(plan) if "lineitem" in s]
    assert li_scans and any("EqualTo(l_returnflag,R)" in s for s in li_scans)


def test_large_volume_semijoin_shape(spark):
    """Q18 shape: qualifying keys reach the facts as a semi join (LeftSemi),
    and the final 100 rows come from TakeOrdered, not a global sort."""
    plan = _plan(queries()["wh_large_volume_orders"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_scd2_single_shuffle(spark):
    """The SCD2 build is one window over one shuffle on the dimension key —
    no joins, no second exchange."""
    plan = _plan(queries()["cdc_scd2_dim"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_market_share_all_dims_broadcast(spark):
    """Q8 shape: six dimension joins must all be broadcasts — the only
    exchange left is the final year rollup. A single shuffled dim join here
    would dominate the 100 TB run."""
    plan = _plan(queries()["wh_market_share"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 5


def test_late_suppliers_no_cartesian(spark):
    """Q21 shape: the EXISTS/NOT EXISTS self-joins carry a non-equi
    suppkey term, but the orderkey equi-term must still drive a hash/merge
    LeftSemi+LeftAnti — never a nested-loop or cartesian fallback."""
    plan = _plan(queries()["wh_late_suppliers"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_min_cost_supplier_agg_join_back(spark):
    """Q2 shape: the correlated min decorrelates into partial-agg +
    join-back; the part slice filter must reach the part scan."""
    plan = _plan(queries()["wh_min_cost_supplier"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    scans = [s for s in _scans(plan) if "/part.parquet" in s or "part]" in s]
    part_scans = [s for s in _scans(plan) if "p_type" in s]
    assert part_scans and any("EqualTo(p_type,LARGE)" in s for s in part_scans)


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast: a shuffled gram join would
    reshuffle the full corpus gram stream against a tiny eval set."""
    plan = _plan(queries()["pipeline_decontaminate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_profile_is_single_scan(spark):
    """The profiler must compute every column's metrics from ONE scan of
    the table — a per-column scan loop would read a 100 TB table N times."""
    plan = _plan(queries()["profile_documents"](spark, SF_DIR))
    assert len(_scans(plan)) == 1
    assert "BatchEvalPython" not in plan


def test_forecast_revenue_pushdown_and_partial_agg(spark):
    """Q6 shape: every predicate must reach the parquet scan (at 100 TB the
    win IS the row-group skip), the scan must read only the 4 needed
    columns, and the 1-row agg must have a map-side partial pass."""
    df = queries()["wh_forecast_revenue"](spark, SF_DIR)
    plan = _plan(df)
    assert len(_scans(plan)) == 1
    # plan.toString truncates long scan lines — read the formatted explain,
    # which prints PushedFilters / ReadSchema in full
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    full = df._jdf.queryExecution().explainString(mode)
    # shipdate range + quantity cap appear in PushedFilters
    assert "GreaterThanOrEqual(l_shipdate" in full
    assert "LessThan(l_quantity,24" in full
    # no extra columns read
    read_schema = [ln for ln in full.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_orderkey" not in read_schema[0]
    assert plan.count("HashAggregate") >= 2


def test_order_priority_semi_join_no_cartesian(spark):
    """Q4 shape: the correlated EXISTS with the non-equi lateness conjunct
    must decorrelate to a semi join keyed on the equi predicate — a
    nested-loop fallback would be quadratic in the fact table."""
    plan = _plan(queries()["wh_order_priority"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the quarter filter reaches the orders scan
    assert any("GreaterThanOrEqual(o_orderdate" in s for s in _scans(plan))


def test_small_qty_brand_filter_before_aggregate(spark):
    """Q17 shape: the brand slice must semi-join the facts down BEFORE the
    per-part avg — aggregating all parts then filtering would shuffle the
    full fact table for a 1/25 slice."""
    plan = _plan(queries()["wh_small_qty_revenue"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert any("EqualTo(p_brand,Brand#13)" in s for s in _scans(plan))
    # both fact branches (avg side and revenue side) are semi-joined first:
    # every LeftSemi sits below the first HashAggregate in its subtree
    assert plan.count("LeftSemi") >= 2


def test_excess_shipments_semi_chain(spark):
    """Q20 shape: part slice -> fact aggregate -> supplier must stay a
    semi-join chain with the name filter pushed to the part scan."""
    plan = _plan(queries()["wh_excess_shipments"](spark, SF_DIR))
    assert plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in plan
    assert any("StringContains(p_name,green)" in s for s in _scans(plan))


@pytest.mark.parametrize(
    "name", sorted(n for n in queries() if n not in PLAN_SKIP)
)
def test_no_row_at_a_time_python(spark, name):
    plan = _plan(queries()[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"


def test_bm25_no_explode_single_pass_topk(spark):
    """BM25 (operators/search.py): term frequencies are array expressions
    (no Generate/explode shuffle of one-row-per-token), corpus stats are a
    1-row broadcast, and top-k is TakeOrderedAndProject — at 100 TB the cost
    must be the documents scan itself."""
    plan = _plan(queries()["search_bm25"](spark, SF_DIR))
    assert "Generate explode" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_lsh_multiprobe_broadcast_probe_set(spark):
    """Multi-probe LSH: the planes+1 probe buckets come from ONE query row —
    they must broadcast to the bucketed corpus, never shuffle it, and the
    final top-k must stay TakeOrderedAndProject."""
    plan = _plan(queries()["sim_ann_lsh_multiprobe"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_pq_codebooks_broadcast(spark):
    """Product quantization: codebooks and the ADC lookup table are tiny
    (m x C rows) — every join in encode and search must broadcast them; the
    corpus side shuffles only (vec_id, sub, cell) assignment rows, never
    raw vectors."""
    for name in ("sim_pq_encode", "sim_pq_adc_topk"):
        plan = _plan(queries()[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, name


def test_char_entropy_no_shuffle(spark):
    """Char entropy is a pure narrow projection — no Exchange at all;
    scoring 100 TB of text must not repartition it."""
    plan = _plan(queries()["text_char_entropy"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_subsequence_search_single_shuffle_topk(spark):
    """Series subsequence search: one hash shuffle on user_id (the window
    spec), every candidate window materialized in-partition (no self-join),
    final top-k a heap."""
    plan = _plan(queries()["ts_subsequence_search"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_funnel_single_shuffle(spark):
    """The three chained funnel-step window mins share one user_id
    partitioning — Catalyst must plan exactly ONE hash exchange before the
    final 1-row aggregate."""
    plan = _plan(queries()["wh_funnel"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_runtime_bloom_filter_semi_join_reduction(spark):
    """With broadcast disabled (forcing a shuffle join), the optimizer must
    inject a bloom filter built from the selective dimension side into the
    fact-side scan (runtime row-level filtering / semi-join reduction) —
    the 100 TB knob that keeps non-matching fact rows out of the shuffle.
    Size thresholds are lowered to make the tiny local tables eligible."""
    from cdc_poc_spark.sources.testdata import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = load_table(spark, SF_DIR, "lineitem")
        dim = load_table(spark, SF_DIR, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = fact.join(dim, fact.l_orderkey == dim.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = _plan(j).lower()
        assert "might_contain" in plan or "bloomfilter" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_semantic_dedup_centroids_broadcast(spark):
    """SemDeDup's n x C assignment must broadcast the centroid side (never
    shuffle the corpus against it), and the in-cluster pair join must be a
    hash join on cell — no cartesian anywhere."""
    plan = _plan(queries()["sim_semantic_dedup"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_is_map_only(spark):
    plan = _plan(queries()["pipeline_chunk_documents"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_winnow_substring_no_cartesian(spark):
    """The winnowed-fingerprint self-join must stay an equi hash join
    (blocked candidate generation), and the hot-fingerprint guard a
    broadcast anti-join."""
    plan = _plan(queries()["dedup_substring"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_image_dedup_band_join_not_cartesian(spark):
    plan = _plan(queries()["mm_image_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_vocab_encode_joins_broadcast(spark):
    """The vocab (dimension-sized) must broadcast into the encode join —
    the exploded corpus side never shuffles against it."""
    plan = _plan(queries()["text_vocab_encode"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_autocorr_no_cartesian(spark):
    plan = _plan(queries()["ts_autocorr"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_no_complex_typed_output_columns(spark):
    """Every SQL-oracle query's result schema must be flat scalar columns.

    The differential harness canonicalizes results via a pandas sort over
    every column; array/map/struct cells are unhashable there and burn the
    verification slot with a TypeError instead of a real comparison
    (sim_quantize_int8, round 2). Sequences must be emitted as joined
    strings (see pq_encode / quantize_int8 / encode_docs)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from cdc_poc_spark.plans.oracles import oracle_sql

    offenders = []
    for name in oracle_sql():
        if name in PLAN_SKIP:
            continue
        df = queries()[name](spark, SF_DIR)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, offenders


def test_containment_join_not_cartesian(spark):
    plan = _plan(queries()["dedup_containment"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_importance_weights_stats_broadcast(spark):
    """The 1-row corpus stats must broadcast into the scoring join; the
    token-key joins stay hash joins (no cartesian)."""
    plan = _plan(queries()["pipeline_importance_weights"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_nb_classify_plan_shape(spark):
    """NB scoring: the (token -> logp array) grid joins the exploded
    corpus as a hash join (no cartesian); the 1-row class header and the
    vocab scalar broadcast; Python never enters the plan."""
    plan = _plan(queries()["text_nb_lang"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row hdr/voc crossJoins
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_encode_word_cache_join(spark):
    """BPE encoding runs the per-word encode over DISTINCT words and
    hash-joins the pieces back to token positions — no cartesian, never
    row-at-a-time Python. The greedy default enters the plan as exactly
    ONE Arrow stage on the vocabulary-sized side (corpus-sized stages
    stay pure JVM); the fold twin stays pure expression tree."""
    from cdc_poc_spark.operators import bpe
    from cdc_poc_spark.sources.testdata import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges, _ = bpe.train_merges(docs, 3)
    plan = _plan(bpe.encode(docs, merges))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1
    fold_plan = _plan(bpe.encode(docs, merges, method="folds"))
    assert "CartesianProduct" not in fold_plan
    assert "BatchEvalPython" not in fold_plan
    assert "ArrowEvalPython" not in fold_plan


def test_banded_keys_one_arrow_stage_per_side(spark):
    """The banded signature kernel enters the plan as exactly one
    ArrowEvalPython per self-join side (2 total — self-join attribute
    dedup blocks exchange reuse), never row-at-a-time BatchEvalPython.
    Catches the posexplode regression where Generate re-evaluated the
    kernel per output attribute (4 stages = double work per side)."""
    plan = _plan(queries()["sim_embedding_dups_lsh"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 2


def test_boilerplate_hot_set_broadcasts(spark):
    """The boilerplate line removal anti-joins a (small, bounded) hot-line
    set: must be a broadcast anti-join, never a shuffle, and the
    reassembly must be the only wide doc_id stage."""
    plan = _plan(queries()["text_boilerplate_strip"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tfidf_ncorpus_broadcast_no_cartesian(spark):
    """TF-IDF: the 1-row corpus count enters via broadcast; the df join is
    a key join (no cartesian); tf/df aggs keep map-side partials."""
    plan = _plan(queries()["text_tfidf_terms"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for tf and df


def test_cdc_chunks_single_scan_no_python(spark):
    """Content-defined chunking is one parquet scan + narrow array
    expressions behind one exchange — no join, no Python, and only
    doc_id/text read from the scan."""
    plan = _plan(queries()["dedup_cdc_chunks"](spark, SF_DIR))
    scans = _scans(plan)
    assert len(scans) == 1
    assert "text" in scans[0] and "lang" not in scans[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_lang_balance_floor_broadcasts(spark):
    """Language balancing: the 1-row floor count broadcasts (nested-loop
    on a single row is fine); the only shuffle is the lang window."""
    plan = _plan(queries()["pipeline_lang_balance"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bench_list_resolves_against_registry():
    """Every bench.py headline query must exist in the registry, with no
    duplicates — a rename or registry drop must fail here, not in the
    driver's per-round bench run."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_module",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from cdc_poc_spark.plans.registry import queries

    reg = queries(fresh=False)
    missing = [n for n in bench.BENCH_QUERIES if n not in reg]
    assert not missing, missing
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_hash_distinct_single_wide_exchange(spark):
    """partitioning.hash_distinct (round 6): the candidate-pair dedup
    must carry exactly ONE shuffle (dropDuplicates reuses the explicit
    repartition's hash layout instead of adding its own exchange), and
    that shuffle's partition count must be the explicit full-width one —
    a bare .distinct() lets AQE size the exchange by bytes and collapse
    the dedup onto 1-2 partitions (measured 116.3s vs 18.3s for
    embedding_dup_pairs_ivf on the 10x corpus)."""
    from cdc_poc_spark.functions.partitioning import hash_distinct

    df = spark.range(10000).selectExpr(
        "id % 97 AS vec_a", "id % 89 AS vec_b"
    )
    plan = _plan(hash_distinct(df, "vec_a", "vec_b"))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    par = spark.sparkContext.defaultParallelism
    assert f", {par})," in plan or f", {par})" in plan, plan

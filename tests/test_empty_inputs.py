"""Zero-row robustness: every operator family must return an EMPTY result
with the right schema on empty input — at cluster scale whole partitions
(and whole incremental runs) are routinely empty, and an operator that
throws or changes schema on zero rows breaks the pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators import aggregates, clustering, dedup, packing
from cdc_poc_spark.operators.enrich import enrich
from cdc_poc_spark.operators.text_analysis import clean_text, text_stats
from cdc_poc_spark.plans import cdc_mapping
from cdc_poc_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _empty_like(df):
    return df.filter(F.lit(False))


def test_enrich_and_aggregates_empty(spark):
    ev = _empty_like(
        cdc_mapping.engagement_events(load_table(spark, SF, "events"))
    )
    dim = cdc_mapping.content_dim(load_table(spark, SF, "part"))
    enriched = enrich(ev, dim)
    assert enriched.count() == 0
    full = enrich(
        cdc_mapping.engagement_events(load_table(spark, SF, "events")), dim
    )
    assert enriched.schema == full.schema
    assert aggregates.leaderboard(enriched).count() == 0
    assert aggregates.content_stats(enriched).count() == 0
    assert aggregates.engagement_window(enriched).count() == 0


def test_dedup_and_packing_empty(spark):
    docs = _empty_like(load_table(spark, SF, "documents"))
    assert dedup.exact_dups(docs).count() == 0
    assert dedup.minhash_lsh_dups(docs, 0.2).count() == 0
    assert dedup.ngram_jaccard_pairs(docs, 0.2).count() == 0
    assert clustering.connected_components(
        dedup.ngram_jaccard_pairs(docs, 0.2).select("doc_a", "doc_b"),
        src="doc_a",
        dst="doc_b",
    ).count() == 0
    assert packing.pack_sequences(docs).count() == 0
    assert text_stats(docs).count() == 0
    assert clean_text(docs).count() == 0


def test_search_similarity_empty(spark):
    """BM25, PQ, and the ANN paths on zero rows: empty result, no throw.
    (The BM25 corpus-stats aggregate yields one all-null row on empty input;
    the null-safe score filter must still produce zero output rows.)"""
    from cdc_poc_spark.operators import sampling, search, similarity

    docs = _empty_like(load_table(spark, SF, "documents"))
    assert search.bm25_topk(docs).count() == 0
    assert sampling.domain_mix(docs).count() == 0
    emb = _empty_like(load_table(spark, SF, "embeddings"))
    assert similarity.pq_encode(emb).count() == 0
    assert similarity.pq_adc_topk(emb, 0).count() == 0
    assert similarity.ann_lsh_multiprobe_topk(emb, 0).count() == 0


def test_incremental_empty_delta(spark):
    """An empty delta batch must leave the incremental view identical to
    the state's own aggregate (the no-op maintenance run)."""
    from cdc_poc_spark.operators import incremental
    from cdc_poc_spark.sources.debezium import changelog_apply

    ev = cdc_mapping.engagement_events(load_table(spark, SF, "events"))
    changes = ev.select(
        (F.col("id") % 100).alias("row_key"),
        "id",
        "event_type",
        "duration_ms",
        F.lit("c").alias("op"),
    )
    state = changelog_apply(changes, ["row_key"], ["id"], op_col="op")
    out = incremental.incremental_agg(
        state, _empty_like(changes), ["row_key"], ["id"], ["event_type"], "duration_ms"
    )
    base = state.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("duration_ms"), F.lit(0)).cast("long").alias("sum_duration_ms"),
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in base.collect()}
    assert got == want


def test_round2_operators_empty(spark):
    """chunking, winnowing substring dedup, SemDeDup, and the image hash
    pipeline on zero rows: empty result, stable schema, no throw."""
    from cdc_poc_spark.operators import multimodal, similarity

    docs = _empty_like(load_table(spark, SF, "documents"))
    emb = _empty_like(load_table(spark, SF, "embeddings"))
    assert packing.chunk_documents(docs).count() == 0
    assert dedup.winnow_fingerprints(docs).count() == 0
    assert dedup.substring_dup_pairs(docs).count() == 0
    assert similarity.semantic_dedup(emb).count() == 0
    media = multimodal.synthesize_png_corpus(docs)
    assert media.count() == 0
    assert multimodal.image_dup_pairs(multimodal.ahash64(media)).count() == 0


def test_dedup_lines_removes_repeats_preserves_order(spark):
    from cdc_poc_spark.operators.text_analysis import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "nav bar\nreal content one\nnav bar\nreal content two\nnav bar", "en"),
            (2, "only\nunique\nlines", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert got[1].dedup_text == "nav bar\nreal content one\nreal content two"
    assert got[1].n_lines == 5 and got[1].n_dup_lines_removed == 2
    assert got[2].dedup_text == "only\nunique\nlines"
    assert got[2].n_dup_lines_removed == 0


def test_cli_list_and_unknown_query(capsys):
    from cdc_poc_spark.__main__ import main

    assert main(["list", "--filter", "dedup_exact"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact" in out and "sql-oracle" in out
    assert main(["run", "no_such_query"]) == 2


def test_vocab_encode_oov_and_order(spark):
    from cdc_poc_spark.operators.text_analysis import build_vocab, encode_docs

    docs = spark.createDataFrame(
        [(1, "b a b c b a rare", "en"), (2, "a a a", "en")],
        "doc_id long, text string, lang string",
    )
    vocab = build_vocab(docs, size=3)  # keeps a(4), b(3), c(1)? -> top3 by freq
    v = {r.token: r.token_id for r in vocab.collect()}
    assert v["a"] == 0 and v["b"] == 1  # freq rank, lexical tie-break
    enc = {r.doc_id: r for r in encode_docs(docs, vocab, unk_id=99).collect()}
    # order-exact: tokens map positionally; 'rare' -> UNK ('_'-joined string)
    expected = [v["b"], v["a"], v["b"], v["c"], v["b"], v["a"], 99]
    assert enc[1].ids == "_".join(str(i) for i in expected)
    assert enc[1].n_unk == 1 and enc[1].n_tokens == 7
    assert enc[2].ids == "0_0_0" and enc[2].n_unk == 0


def test_r3_operators_empty(spark):
    """Round-3 additions on zero rows: fuzzy matching, containment,
    PII, banded/IVF/incremental embedding dedup."""
    from cdc_poc_spark.operators import privacy, similarity, text_analysis

    docs = _empty_like(load_table(spark, SF, "documents"))
    emb = _empty_like(load_table(spark, SF, "embeddings"))
    sup = _empty_like(load_table(spark, SF, "supplier"))
    assert text_analysis.fuzzy_string_pairs(sup, "s_name").count() == 0
    assert dedup.containment_pairs(docs).count() == 0
    assert privacy.pii_stats(docs).count() == 0
    assert privacy.pii_redact(docs).count() == 0
    assert similarity.embedding_dup_pairs_lsh(emb, 0.4).count() == 0
    assert similarity.embedding_dup_pairs_ivf(emb, 0.4).count() == 0
    full = load_table(spark, SF, "embeddings")
    # empty batch against a full index AND full batch against empty index
    assert similarity.embedding_dup_batch_lsh(full, emb, 0.4).count() == 0
    assert similarity.embedding_dup_batch_lsh(emb, full, 0.4).count() == 0


def test_r3_curation_ops_empty(spark):
    """The round-3 curation family on zero rows: empty results, no throw.
    (lang_balance/temperature divide by per-group counts that simply
    produce no groups; cdc chunking's sentinel append never sees a row.)"""
    from cdc_poc_spark.operators.sampling import lang_balance, temperature_weights
    from cdc_poc_spark.operators.text_analysis import (
        ngram_diversity,
        remove_boilerplate_lines,
        tfidf_terms,
    )

    docs = _empty_like(load_table(spark, SF, "documents"))
    assert tfidf_terms(docs).count() == 0
    assert ngram_diversity(docs).count() == 0
    assert lang_balance(docs).count() == 0
    assert temperature_weights(docs).count() == 0
    assert remove_boilerplate_lines(docs).count() == 0
    assert dedup.cdc_chunks(docs).count() == 0
    assert dedup.cdc_dedup_report(docs).count() == 0
    full = load_table(spark, SF, "documents")
    # empty batch against a real index, and a real batch against an empty
    # index — both shapes occur in incremental runs
    assert dedup.cdc_incremental_dedup(full, docs).count() == 0
    got = dedup.cdc_incremental_dedup(docs, full.limit(5))
    assert got.count() == 5
    assert got.filter(F.col("n_known_chunks") != 0).count() == 0


def test_late_r3_operators_empty(spark):
    """Zero-row robustness for the late-round-3 operators: capped IVF-PQ,
    LPA communities + diversity sampling, video frame dedup, semantic
    decontamination, KMV set algebra, keeper selection, SCD2 merge."""
    from cdc_poc_spark.operators import graph, multimodal, similarity, sketches
    from cdc_poc_spark.operators.clustering import keep_best_per_cluster
    from cdc_poc_spark.operators.incremental import scd2_merge

    emb = _empty_like(load_table(spark, SF, "embeddings"))
    assert similarity.ivfpq_topk(emb, 0, 10).count() == 0
    assert similarity.semantic_decontaminate(emb, 0.4).count() == 0
    assert graph.knn_communities(emb).count() == 0
    assert graph.diversity_sample(emb).count() == 0

    docs = _empty_like(load_table(spark, SF, "documents"))
    media = multimodal.synthesize_media(docs)
    assert multimodal.frame_signatures(media).count() == 0
    assert multimodal.video_dup_pairs(media).count() == 0
    assert keep_best_per_cluster(docs, 0.5).count() == 0

    ev = _empty_like(
        load_table(spark, SF, "events").select("event_type", "user_id")
    )
    assert sketches.kmv_setops(ev).count() == 0
    assert sketches.kmv_merge(
        sketches.kmv_sketch(ev, "event_type", "user_id"),
        sketches.kmv_sketch(ev, "event_type", "user_id"),
    ).count() == 0

    state = spark.createDataFrame(
        [],
        "content_id bigint, version_title string, version_length_seconds int,"
        " valid_from timestamp_ntz, valid_to timestamp_ntz, is_current boolean",
    )
    batch = spark.createDataFrame(
        [],
        "content_id bigint, version_title string, version_length_seconds int,"
        " version_ts timestamp_ntz",
    )
    assert scd2_merge(state, batch).count() == 0

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

"""Sequence packing + text cleaning — golden cases and invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators.packing import (
    PACK_BUDGET,
    pack_sequences,
    pack_summary,
)
from cdc_poc_spark.operators.text_analysis import clean_text
from cdc_poc_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_pack_invariants(spark):
    packed = pack_sequences(load_table(spark, SF, "documents")).cache()
    n = packed.count()
    assert n == load_table(spark, SF, "documents").count()
    # offset/pack arithmetic is self-consistent
    bad = packed.filter(
        (F.col("offset_in_pack") >= PACK_BUDGET)
        | (F.col("token_offset") != F.col("pack_id") * PACK_BUDGET + F.col("offset_in_pack"))
        | (F.col("offset_in_pack") < 0)
    ).count()
    assert bad == 0
    # within a shard, token_offset is the exclusive cumsum in doc_id order
    rows = (
        packed.filter(F.col("shard") == 0).orderBy("doc_id").collect()
    )
    running = 0
    for r in rows:
        assert r.token_offset == running
        running += r.n_tokens
    packed.unpersist()


def test_pack_summary_fill(spark):
    packed = pack_sequences(load_table(spark, SF, "documents"))
    summary = pack_summary(packed).cache()
    # every (shard, pack) holds at least one doc; no pack id gaps per shard
    per_shard = summary.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_packs"), F.max("pack_id").alias("max_pack")
    )
    assert per_shard.filter(F.col("n_packs") != F.col("max_pack") + 1).count() == 0
    summary.unpersist()


def test_clean_text_goldens(spark):
    df = spark.createDataFrame(
        [
            (1, "Visit https://example.com/x?q=1 NOW", "en"),
            (2, "mail me at john.doe@corp.example.org  today", "en"),
            (3, "  plain   text  ", "en"),
            (4, "http://a.b c http://d.e", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r for r in clean_text(df).collect()}
    assert got[1].clean_text == "visit now"
    assert got[1].n_urls == 1 and got[1].n_emails == 0
    assert got[2].clean_text == "mail me at today"
    assert got[2].n_emails == 1
    assert got[3].clean_text == "plain text"
    assert got[4].n_urls == 2 and got[4].clean_text == "c"

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


def test_chunk_documents_window_stride(spark):
    from cdc_poc_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, text, "en"), (2, "a b", "en"), (3, "", "en")],
        "doc_id long, text string, lang string",
    )
    out = chunk_documents(docs, window=128, stride=96).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 300 tokens, stride 96 -> starts 0,96,192,288 -> 4 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.start_tok for r in c1] == [0, 96, 192, 288]
    assert [r.n_tokens for r in c1] == [128, 128, 108, 12]
    # overlap: chunk k starts mid-chunk k-1 (window > stride)
    assert c1[0].chunk_text.split()[96] == c1[1].chunk_text.split()[0] == "t96"
    # short doc -> one chunk with all tokens; empty doc -> no chunks
    assert [(r.n_tokens, r.chunk_text) for r in by_doc[2]] == [(2, "a b")]
    assert 3 not in by_doc


def test_chunk_documents_no_shuffle(spark):
    from cdc_poc_spark.operators.packing import chunk_documents
    from cdc_poc_spark.sources.testdata import load_table

    df = chunk_documents(load_table(spark, SF, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only stage


def test_shuffle_to_shards_is_permutation(spark):
    """Shuffle export is a complete deterministic permutation: every id
    exactly once, dense per-shard positions, shard within range, and
    bit-identical across reruns; a different seed reorders."""
    from pyspark.sql import functions as F

    from cdc_poc_spark.operators.sampling import shuffle_to_shards
    from cdc_poc_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    out = shuffle_to_shards(docs, n_shards=8)
    rows = out.collect()
    assert len(rows) == n
    assert {r.doc_id for r in rows} == {r.doc_id for r in docs.collect()}
    assert all(0 <= r.shard < 8 for r in rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense ranks
    again = {(r.doc_id, r.shard, r.pos) for r in shuffle_to_shards(docs, n_shards=8).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}
    other = {(r.doc_id, r.shard, r.pos) for r in shuffle_to_shards(docs, n_shards=8, seed="epoch2").collect()}
    assert other != again

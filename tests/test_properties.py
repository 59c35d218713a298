"""Hypothesis property tests for the cross-engine hard parts (SURVEY §7.5):
metric arithmetic parity with DuckDB on arbitrary inputs, and wire-format
timestamp round-trips at microsecond precision."""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_poc_spark.functions.metrics import engagement_pct, engagement_seconds
from cdc_poc_spark.functions.timeutil import format_wire_ntz, parse_wire_ntz

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

pairs = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=10**9)),
        st.one_of(st.none(), st.integers(min_value=-10, max_value=10**6)),
    ),
    min_size=1,
    max_size=60,
)


@given(pairs)
@settings(**_SETTINGS)
def test_engagement_metrics_match_duckdb(spark, batch):
    """O4/O5 on arbitrary (duration_ms, length_seconds), incl. the edge
    cases: sub-second durations, zero/negative/NULL lengths, huge values."""
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("length_seconds", T.IntegerType()),
        ]
    )
    rows = [
        (i, d if d is None else min(d, 2**31 - 1), ln)
        for i, (d, ln) in enumerate(batch)
    ]
    df = spark.createDataFrame(rows, schema)
    es = engagement_seconds(F.col("duration_ms"))
    got = {
        r["i"]: (r["es"], r["pct"])
        for r in df.select(
            "i",
            es.alias("es"),
            engagement_pct(es, F.col("length_seconds")).alias("pct"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, duration_ms INTEGER, length_seconds INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT i,
                   CAST(duration_ms // 1000 AS INTEGER) AS es,
                   CASE WHEN duration_ms IS NOT NULL AND length_seconds > 0
                        THEN round(round((duration_ms // 1000) / length_seconds, 4) * 100, 2)
                   END AS pct
            FROM t"""
        ).fetchall()
    }
    assert got == want


timestamps = st.lists(
    st.datetimes(
        min_value=dt.datetime(1970, 1, 1),
        max_value=dt.datetime(2262, 1, 1),
    ),
    min_size=1,
    max_size=60,
)


@given(timestamps)
@settings(**_SETTINGS)
def test_wire_timestamp_roundtrip(spark, batch):
    """F1/F3: parse_wire_ntz(format_wire_ntz(ts)) == ts for arbitrary
    microsecond NTZ timestamps (tz-free both ways)."""
    schema = T.StructType(
        [T.StructField("i", T.LongType()), T.StructField("ts", T.TimestampNTZType())]
    )
    rows = [(i, ts) for i, ts in enumerate(batch)]
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        "i", parse_wire_ntz(format_wire_ntz("ts")).alias("rt"), "ts"
    ).collect()
    for r in out:
        assert r["rt"] == r["ts"], (r["ts"], r["rt"])


json_texts = st.lists(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
            max_codepoint=0x2FFF,
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=40,
)


@given(json_texts)
@settings(**_SETTINGS)
def test_envelope_roundtrip_arbitrary_payloads(spark, texts):
    """O1 wire robustness: arbitrary unicode payloads (quotes, newlines,
    control chars, CJK) must survive envelope serialize -> parse intact."""
    from cdc_poc_spark.sources import debezium

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("raw_payload", T.StringType()),
        ]
    )
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, schema)
    wire = df.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.struct("id", "raw_payload").alias("after"),
                    F.lit("c").alias("op"),
                ).alias("payload")
            )
        ).alias("value")
    )
    parsed = debezium.good_rows(debezium.parse_envelope(wire, schema))
    got = {r["id"]: r["raw_payload"] for r in parsed.collect()}
    assert got == dict(rows)


_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=400
)


@given(_words)
@settings(**_SETTINGS)
def test_chunking_reconstructs_document(spark, toks):
    """Property: at any token count, the chunk starts tile the doc at the
    stride, every token index is covered by >= 1 chunk, and concatenating
    the NON-overlapping prefix of each chunk (stride tokens, all of the
    last) reconstructs the document exactly."""
    from cdc_poc_spark.operators.packing import chunk_documents

    text = " ".join(toks)
    docs = spark.createDataFrame([(1, text, "en")], "doc_id long, text string, lang string")
    chunks = sorted(
        chunk_documents(docs, window=128, stride=96).collect(),
        key=lambda r: r.chunk_idx,
    )
    n = len([t for t in toks if t])
    if n == 0:
        assert chunks == []
        return
    assert [c.start_tok for c in chunks] == list(range(0, n, 96))
    rebuilt = []
    for c in chunks[:-1]:
        rebuilt.extend(c.chunk_text.split(" ")[:96])
    rebuilt.extend(chunks[-1].chunk_text.split(" "))
    assert rebuilt == [t for t in toks if t]
    assert all(c.n_tokens <= 128 for c in chunks)


@given(
    st.text(alphabet="xyzw ", min_size=40, max_size=120),
    st.text(alphabet="qrst ", min_size=40, max_size=120),
    st.text(alphabet="mnop", min_size=27, max_size=60),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
)
@settings(**_SETTINGS)
def test_winnow_guarantee_property(spark, pre_a, pre_b, shared, off_a, off_b):
    """Winnowing guarantee on arbitrary strings: two docs sharing ANY
    substring of length >= K + G - 1 = 27 share >= 1 fingerprint, wherever
    the substring is placed (disjoint alphabets keep the docs otherwise
    unrelated)."""
    from cdc_poc_spark.operators import dedup

    a = pre_a[:off_a] + shared + pre_a[off_a:]
    b = pre_b[:off_b] + shared + pre_b[off_b:]
    docs = spark.createDataFrame(
        [(1, a, "en"), (2, b, "en")], "doc_id long, text string, lang string"
    )
    pairs = dedup.substring_dup_pairs(docs, min_shared=1, max_df_frac=None).collect()
    assert any((r.doc_a, r.doc_b) == (1, 2) for r in pairs)

"""Custom stateful streaming operator: keyed-state as-of enrichment via
``applyInPandasWithState`` — the literal Structured-Streaming restatement of
the reference's ``KeyedCoProcessFunction`` + ``MapState`` join (J1,
reference EngagementStreamingJob.java:308-349).

Both inputs travel as ONE interleaved keyed stream (the analog of Flink's
``connect`` after keyBy): dimension-version rows upsert per-key state,
event rows probe it. Divergence from the reference, on purpose: state holds
the full *version history* per key and events match by event-time
(``version_ts <= event_ts``), so results are deterministic under replay and
identical to the batch :func:`cdc_poc_spark.operators.asof.asof_join` — the
reference's latest-wins MapState is the processing-time special case. A
production deployment would prune state below the watermark; the driver
corpus needs no pruning.

This is the "(b) Pandas-UDF-backed stateful operator" tier of custom
operators — Arrow-batched per key-group, no row-at-a-time Python.
"""

from __future__ import annotations

import json
import os
from bisect import bisect_right

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# interleaved wire schema: dimension rows have is_event=false and null
# event_id; event rows carry null version attributes
UNION_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("is_event", T.BooleanType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("version_title", T.StringType()),
        T.StructField("version_length_seconds", T.IntegerType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("content_id", T.LongType()),
        T.StructField("event_ts", T.TimestampNTZType()),
        T.StructField("version_ts", T.TimestampNTZType()),
        T.StructField("version_title", T.StringType()),
        T.StructField("version_length_seconds", T.IntegerType()),
    ]
)

# version history as a JSON blob: [[ts_iso, title, length], ...] sorted by ts
STATE_SCHEMA = T.StructType([T.StructField("versions_json", T.StringType())])


def _enrich_group(key, pdf_iter, state):
    versions = json.loads(state.get[0]) if state.exists else []
    events = []
    for pdf in pdf_iter:
        for row in pdf.itertuples(index=False):
            if row.is_event:
                events.append((row.ts, row.event_id))
            else:
                versions.append(
                    [row.ts.isoformat(), row.version_title, int(row.version_length_seconds)]
                )
    versions.sort(key=lambda v: v[0])
    state.update((json.dumps(versions),))
    vts = [pd.Timestamp(v[0]) for v in versions]
    out = []
    for ets, eid in events:
        i = bisect_right(vts, ets)  # rightmost version with ts <= event ts
        if i == 0:
            continue  # enrichment miss: dropped (inner semantics)
        v = versions[i - 1]
        out.append((int(eid), int(key[0]), ets, vts[i - 1], v[1], v[2]))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "id",
                "content_id",
                "event_ts",
                "version_ts",
                "version_title",
                "version_length_seconds",
            ],
        )


def interleave(events: DataFrame, versions: DataFrame) -> DataFrame:
    """Union the two sides into the keyed wire shape (UNION_SCHEMA).

    ``events`` needs (id, content_id, event_ts); ``versions`` needs
    (content_id, version_ts, version_title, version_length_seconds).
    """
    e = events.select(
        F.col("content_id"),
        F.col("event_ts").alias("ts"),
        F.lit(True).alias("is_event"),
        F.col("id").alias("event_id"),
        F.lit(None).cast("string").alias("version_title"),
        F.lit(None).cast("int").alias("version_length_seconds"),
    )
    v = versions.select(
        F.col("content_id"),
        F.col("version_ts").alias("ts"),
        F.lit(False).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("version_title"),
        F.col("version_length_seconds"),
    )
    return e.unionByName(v)


def asof_enrich_stateful(union_stream: DataFrame) -> DataFrame:
    """The stateful transform over a *streaming* UNION_SCHEMA DataFrame."""
    return union_stream.groupBy("content_id").applyInPandasWithState(
        _enrich_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_asof_stateful(
    spark: SparkSession, events: DataFrame, versions: DataFrame, workdir: str
) -> DataFrame:
    """Drive the stateful operator end-to-end with availableNow over a file
    source and a memory sink; returns the (batch) result table. Used by the
    registry so the driver's differential harness can hash-check a custom
    stateful streaming operator against the DuckDB ASOF oracle."""
    input_dir = os.path.join(workdir, "asof_input")
    interleave(events, versions).write.mode("overwrite").parquet(input_dir)
    stream = spark.readStream.schema(UNION_SCHEMA).parquet(input_dir)
    name = "asof_stateful_result"
    q = (
        asof_enrich_stateful(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", os.path.join(workdir, "asof_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)

"""Debezium CDC record parsing — O1/O2/O8 + T8 (SURVEY §2.2, §2.7).

The reference consumes Debezium JSON change records from Kafka and parses
them by hand with Jackson (reference EngagementStreamingJob.java:206-303):
take ``payload.after``, skip deletes/schema-change messages (after == null),
route malformed JSON to a dead-letter side output.

Two wire shapes are supported (SURVEY §3.1 ⚠): the connector config applies
the ExtractNewRecordState unwrap SMT (flattened row + ``__op`` field,
reference postgres-connector.json:28-32) while the Flink parser expects the
full envelope (``payload.after``); the envelope is the primary semantic, the
flattened shape is selectable.

Spark-first: one ``from_json`` with an explicit envelope schema — a single
Catalyst expression, whole-stage-codegen'd, no Python in the path. The
dead-letter split is two filters over one parsed DataFrame (computed once;
Catalyst reuses the parse subtree), the analog of Flink side outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.metrics import parse_wire_timestamp
from ..functions.timeutil import parse_wire_ntz
from ..schemas import debezium_envelope_schema, stringly

CORRUPT = "_corrupt"
OP = "_op"


def parse_envelope(
    raw: DataFrame, after_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Parse enveloped Debezium JSON into typed columns.

    Output = ``after_schema`` columns (timestamps parsed from the µs wire
    pattern, EngagementStreamingJob.java:237-239) + ``_op`` + boolean
    ``_corrupt``. Rows where ``payload.after`` is null (deletes /
    schema-change, :222-225) have all payload columns null but are NOT
    corrupt; use :func:`good_rows` / :func:`dead_letters` / :func:`dropped`
    to split.
    """
    wire = stringly(after_schema)
    env = debezium_envelope_schema(wire)
    parsed = raw.withColumn("_env", F.from_json(F.col(value_col), env))
    after = F.col("_env.payload.after")
    cols = [
        _typed(F.col(f"_env.payload.after.{f.name}"), f).alias(f.name)
        for f in after_schema.fields
    ]
    return parsed.select(
        *cols,
        F.col("_env.payload.op").alias(OP),
        (F.col("_env").isNull() | F.col("_env.payload").isNull()).alias(CORRUPT),
        after.isNull().alias("_after_null"),
    )


def parse_unwrapped(
    raw: DataFrame, after_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Parse the flattened (ExtractNewRecordState) shape: row columns at the
    top level plus ``__op`` / ``__source_ts_ms`` (postgres-connector.json:28-32).
    Output shape matches :func:`parse_envelope`."""
    wire = stringly(after_schema)
    flat = T.StructType(
        wire.fields
        + [
            T.StructField("__op", T.StringType(), True),
            T.StructField("__source_ts_ms", T.LongType(), True),
        ]
    )
    parsed = raw.withColumn("_row", F.from_json(F.col(value_col), flat))
    cols = [
        _typed(F.col(f"_row.{f.name}"), f).alias(f.name) for f in after_schema.fields
    ]
    is_delete = F.col("_row.__op") == F.lit("d")
    return parsed.select(
        *cols,
        F.col("_row.__op").alias(OP),
        F.col("_row").isNull().alias(CORRUPT),
        (F.col("_row").isNull() | is_delete).alias("_after_null"),
    )


def _typed(col: Column, field: T.StructField) -> Column:
    # NTZ parse is tz-free; plain TimestampType uses the session-tz parse
    # (matching the reference's LocalDateTime semantics when tz=UTC)
    if isinstance(field.dataType, T.TimestampNTZType):
        return parse_wire_ntz(col)
    if isinstance(field.dataType, T.TimestampType):
        return parse_wire_timestamp(col)
    return col.cast(field.dataType)


def good_rows(parsed: DataFrame) -> DataFrame:
    """Main flow: parseable, non-delete rows (O1 happy path)."""
    keep = [c for c in parsed.columns if c not in (CORRUPT, OP, "_after_null")]
    return parsed.filter(~F.col(CORRUPT) & ~F.col("_after_null")).select(*keep)


def dead_letters(parsed: DataFrame) -> DataFrame:
    """O8: malformed records (reference dead-letter side output,
    EngagementStreamingJob.java:254-257)."""
    return parsed.filter(F.col(CORRUPT))


def dropped(parsed: DataFrame) -> DataFrame:
    """T8: delete / schema-change records, dropped from the main flow."""
    return parsed.filter(~F.col(CORRUPT) & F.col("_after_null"))


def changelog_apply(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = OP,
    delete_op: str = "d",
) -> DataFrame:
    """Materialize current table state from a CDC changelog: per logical row
    key, the latest change wins; a key whose latest change is a delete is
    absent from the result.

    This is the compaction step every CDC consumer needs to turn a
    change stream into a queryable table (the reference sidesteps it by
    dropping deletes at the connector, postgres-connector.json:15,31 —
    an append-only approximation; this operator implements the real
    upsert/delete semantics).

    Scale shape: ONE shuffle on the row key, then a per-key linear window
    pass — no state beyond the window sort, any number of changes per key.
    At 100 TB this runs per partition-pruned slice of the changelog (the
    warehouse layout hour-partitions on event time), and hot keys fall to
    AQE skew splitting since row keys are near-unique by construction.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )

"""Data-quality constraint audit (Deequ-style declarative checks).

Pipeline extension beyond the reference's operator set: before a corpus or
warehouse snapshot is promoted, a curation run publishes a constraint
report — completeness, uniqueness, domain membership, value bounds, and
referential integrity — exactly the check families Amazon Deequ / Great
Expectations standardise. The reference has no analog (its validation is
the hasValidEngagement gate, O6); this generalises that gate into a
declarative audit over any table.

Scale design:
- Every non-distinct constraint on a table is a conditional sum inside ONE
  single-pass aggregate — auditing 10 constraints costs one scan, not ten.
- Uniqueness uses exact count(distinct); Spark plans multi-distinct
  aggregates with an Expand, still one scan of the table.
- Referential integrity is a broadcast-or-shuffle LEFT ANTI join counted to
  one row — never a collect.
- The report itself is O(#constraints) rows: dashboard-sized output no
  matter the input scale.

All metrics are integer (numerator, denominator) pairs plus a
ROUND(num*100/den, 4) percentage — exact in both engines for counts below
2^46, so the DuckDB oracle hashes identically.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("table_name", "constraint_name", "metric_num", "metric_den", "pct_ok", "passed")


@dataclass(frozen=True)
class Check:
    """One predicate-style constraint: passes when every row satisfies
    ``predicate`` (NULLs count as violations unless the predicate says
    otherwise)."""

    name: str
    predicate: Column


def _finish_report() -> list[Column]:
    """Shared unpivot tail: explode the per-constraint struct array out of
    the 1-row aggregate in ONE projection. A union-of-selects unpivot would
    re-execute the whole aggregate (and its table scan) once per branch —
    Catalyst does not dedupe the shared subplan across Union children — so
    at 100 TB this explode is the difference between 1 scan and N scans."""
    pct = F.round(
        F.col("r.num").cast("double") * F.lit(100.0) / F.col("r.den").cast("double"),
        4,
    )
    return [
        F.col("r.table_name").alias("table_name"),
        F.col("r.constraint_name").alias("constraint_name"),
        F.col("r.num").cast("long").alias("metric_num"),
        F.col("r.den").cast("long").alias("metric_den"),
        pct.alias("pct_ok"),
        F.when(F.col("r.num") == F.col("r.den"), 1).otherwise(0).alias("passed"),
    ]


def _struct_row(table: str, name: str, num: Column, den: Column) -> Column:
    return F.struct(
        F.lit(table).alias("table_name"),
        F.lit(name).alias("constraint_name"),
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
    )


def audit_checks(
    df: DataFrame,
    table: str,
    checks: list[Check],
    unique_cols: list[tuple[str, ...]] | None = None,
) -> DataFrame:
    """Single-pass constraint audit of one table.

    Returns (table_name, constraint_name, metric_num, metric_den, pct_ok,
    passed) — one row per check plus one per uniqueness column-set. All
    checks share ONE aggregate over the table (conditional sums), so the
    audit reads the table exactly once regardless of check count.
    """
    aggs = [F.count(F.lit(1)).alias("__den")]
    for i, c in enumerate(checks):
        aggs.append(
            F.sum(F.when(c.predicate, 1).otherwise(0)).alias(f"__c{i}")
        )
    for j, cols in enumerate(unique_cols or []):
        aggs.append(
            F.count_distinct(*[F.col(c) for c in cols]).alias(f"__u{j}")
        )
    agg = df.agg(*aggs)

    rows = [
        _struct_row(table, c.name, F.col(f"__c{i}"), F.col("__den"))
        for i, c in enumerate(checks)
    ]
    rows += [
        _struct_row(
            table, f"unique:{','.join(cols)}", F.col(f"__u{j}"), F.col("__den")
        )
        for j, cols in enumerate(unique_cols or [])
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select(
        *_finish_report()
    )


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    child_table: str,
) -> DataFrame:
    """FK orphan audit: fraction of child rows whose key exists in parent.

    LEFT ANTI join (AQE broadcasts the parent key-set when it fits, else a
    shuffled semi-join — never a driver-side collect), counted to one row.
    """
    den = child.agg(F.count(F.lit(1)).alias("__den"))
    orphans = (
        child.select(child_key)
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("__orph"))
    )
    # both sides are 1-row aggregates: the cross join is trivially broadcast
    joined = den.join(F.broadcast(orphans))
    row = _struct_row(
        child_table,
        f"ref:{child_key}",
        F.col("__den") - F.col("__orph"),
        F.col("__den"),
    )
    return joined.select(F.explode(F.array(row)).alias("r")).select(
        *_finish_report()
    )


def audit_warehouse(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The standing warehouse audit suite: the constraint set a nightly
    promotion job would run over the orders/lineitem snapshot."""
    o_checks = [
        Check("complete:o_custkey", F.col("o_custkey").isNotNull()),
        Check(
            "domain:o_orderstatus",
            F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        Check("bounds:o_totalprice>0", F.col("o_totalprice") > 0),
        Check(
            "bounds:o_orderdate",
            F.col("o_orderdate").between("1992-01-01", "2001-12-31"),
        ),
    ]
    l_checks = [
        Check("complete:l_orderkey", F.col("l_orderkey").isNotNull()),
        Check(
            "bounds:l_discount",
            (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
        ),
        Check("bounds:l_quantity", F.col("l_quantity").between(1, 50)),
        Check(
            "domain:l_returnflag",
            F.col("l_returnflag").isin("R", "A", "N"),
        ),
    ]
    # Fuse the FK audit into the lineitem pass: a left join against the
    # distinct parent key-set attaches a hit flag, so referential integrity
    # becomes one more conditional sum in the SAME single-scan aggregate —
    # the fact table is read exactly once for all six of its constraints.
    parent_keys = (
        orders.select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
        .withColumn("__parent_hit", F.lit(1))
    )
    lineitem_flagged = lineitem.join(parent_keys, "l_orderkey", "left")
    l_checks = l_checks + [
        Check("ref:l_orderkey", F.col("__parent_hit").isNotNull())
    ]
    report = audit_checks(
        orders, "orders", o_checks, unique_cols=[("o_orderkey",)]
    ).unionByName(
        audit_checks(
            lineitem_flagged,
            "lineitem",
            l_checks,
            unique_cols=[("l_orderkey", "l_linenumber")],
        )
    )
    return report.orderBy("table_name", "constraint_name")

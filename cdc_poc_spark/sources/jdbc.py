"""JDBC dimension source — the reference's S4 scan path.

The reference workload generator reads its content dimension over JDBC from
Postgres (reference generator.py:74-86) and the streaming job treats the
dimension as a JDBC-backed lookup table. This module is the Spark-native
twin: ``spark.read.format("jdbc")``, which Catalyst integrates like any
other relation — column pruning and filter pushdown reach the database
(``PushedFilters`` in the physical plan), and the result can feed the
broadcast enrichment join directly.

Scale posture: a dimension table is read with ONE partition by default
(fine — dims are broadcast-sized by definition here). For a large JDBC
fact scan pass ``partition_column``/``num_partitions`` bounds so Spark
issues parallel range-partitioned queries instead of one giant cursor;
that is the standard Spark JDBC parallel-read contract.

No Postgres exists in the test sandbox; tests exercise the same code path
against embedded Apache Derby (its driver ships in Spark's own jars), so
the Spark side of the contract — type mapping, pushdown, round-trip — is
genuinely executed, not mocked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a JDBC table as a DataFrame.

    With ``partition_column`` + bounds + ``num_partitions`` the read is
    issued as parallel range queries (one per partition) — required for
    any JDBC source bigger than a dimension.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 1))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame, url: str, table: str, driver: str | None = None
) -> None:
    """Write a DataFrame to a JDBC table (overwrite) — used by tests to
    stage the dimension, and the inverse of the reference's
    generator-inserts-into-Postgres path."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        writer = writer.option("driver", driver)
    writer.mode("overwrite").save()

"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under a scale-factor dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


# Some driver builds write events.ts as parquet TIMESTAMP(NANOS), which Spark
# has no native type for (PARQUET_TYPE_ILLEGAL); others write TIMESTAMP(MICROS)
# which reads natively. Adapt per-file: only when the column surfaces as int64
# nanos (legacy nanosAsLong) do we rebuild a TIMESTAMP_NTZ via an
# epoch+interval construction that is timezone-independent and floors
# nanos->micros exactly like DuckDB's own truncation of NANOS.
_NANOS_TO_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
    "make_interval(0, 0, 0, 0, 0, 0, CAST(ts div 1000 AS DECIMAL(26,0)) / 1000000)"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(_NANOS_TO_NTZ))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can be used
    interchangeably with the DataFrame API (same Catalyst plans)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

"""SparkSession factory tuned for the engine.

Test/bench topology is local[N] single-JVM, but every config here is chosen
for cluster-scale behavior first:

- AQE on (runtime coalesce + skew-join splitting): the reference workload has
  *extreme* join-key skew — the generator draws content_id uniformly from only
  15 keys (reference generator.py:118; SURVEY.md §7.5) — so at 100 TB a
  shuffle join on content_id needs AQE skew handling or a broadcast.
- Broadcast threshold raised: every dimension in this engine (content analog,
  part/supplier/nation/region) is tiny relative to the fact side; broadcasting
  eliminates the only shuffle the reference job had (its keyBy, SURVEY §3.2).
- UTC session timezone pins timestamp semantics to the DuckDB oracle.
- Arrow enabled for the (rare) pandas-UDF paths — Arrow batches, never
  row-at-a-time Python.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cdc-poc-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Runtime row-level filtering: inject a bloom filter built from the
        # selective (dimension) side of a shuffle join into the fact-side
        # scan, so filtered keys die at the parquet reader instead of
        # traveling through the shuffle — at 100 TB this is the difference
        # between shuffling the whole fact table and shuffling the matching
        # slice. (Semi-join reduction; complements DPP, which only prunes
        # whole partitions.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""Count-Min-Sketch heavy-hitter estimation (M6-class pipeline extension).

The 100 TB problem: "how often does key X occur overall?" for a set of
interesting keys, without paying a full groupBy shuffle of the fact table.
A Count-Min sketch is a bounded-memory, MERGEABLE summary: every partition
builds a tiny (depth x width) counter grid, the grids add cell-wise
map-side, and the driver gets one ~100 KB object no matter the input size.
Estimates are biased high by at most eps * N with probability `confidence`
(Cormode & Muthukrishnan 2005).

Spark-first: the sketch is built by the NATIVE `count_min_sketch` aggregate
(JVM-side, partial-aggregated — one scan, no Python in the data path);
probing deserializes the sketch bytes once on the driver through the
built-in `org.apache.spark.util.sketch.CountMinSketch`. Cell additions
commute, so estimates are partition-layout independent — deterministic for
a fixed seed, retry-safe.

Reference parity note: the reference has no approximate structures at all;
this extends its per-content running counts (RedisSink.java:199) to the
cardinalities where exact per-key state stops fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42

# heavy_hitters_over_candidates collects the candidate key set to the
# driver to probe the sketch; this cap turns "caller accidentally passed
# the full key domain" into a loud error instead of a driver OOM.
MAX_CANDIDATE_KEYS = 100_000


def cms_sketch(
    df: DataFrame,
    col: str,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
) -> bytes:
    """One-pass mergeable Count-Min sketch of `col` (integral or string),
    as the serialized sketch bytes."""
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("s")
    ).first()
    return bytes(row["s"])


def _jvm_sketch(spark: SparkSession, sketch: bytes):
    jvm = spark._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sketch)
    )


def estimate_counts(
    spark: SparkSession, sketch: bytes, keys: list[int]
) -> dict[int, int]:
    """Probe the sketch for each (long) key. Driver-side by design: the
    sketch is tiny and the candidate set is bounded (heavy-hitter sets are
    at most 1/threshold keys), so this never scales with the fact table."""
    cms = _jvm_sketch(spark, sketch)
    return {int(k): int(cms.estimateCount(int(k))) for k in keys}


def heavy_hitters_over_candidates(
    facts: DataFrame,
    candidates: DataFrame,
    col: str,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
    max_keys: int = MAX_CANDIDATE_KEYS,
) -> DataFrame:
    """Estimated total occurrence count in `facts` for every key in
    `candidates[col]`, highest first.

    `facts` is scanned exactly once (the sketch aggregate); `candidates`
    must be driver-sized (it is collected to probe the sketch) — in the
    intended pattern it is the output of a selective filter, e.g. "keys
    active in the most recent slice", never the full key domain. The
    ``max_keys`` bound ENFORCES that contract: the collect is capped at
    max_keys + 1 rows, and exceeding the cap raises instead of silently
    pulling an unbounded key set onto the driver.
    """
    spark = facts.sparkSession
    sketch = cms_sketch(facts, col, eps, confidence, seed)
    distinct_keys = candidates.select(col).distinct()
    keys = [r[0] for r in distinct_keys.limit(max_keys + 1).collect()]
    if len(keys) > max_keys:
        raise ValueError(
            f"heavy_hitters_over_candidates: candidate key set exceeds "
            f"max_keys={max_keys}; pass a selective candidate set (or raise "
            f"max_keys explicitly if the driver can hold it)"
        )
    est = estimate_counts(spark, sketch, keys)
    out = spark.createDataFrame(
        sorted(est.items(), key=lambda kv: (-kv[1], kv[0])),
        f"{col} long, est_count long",
    )
    return out

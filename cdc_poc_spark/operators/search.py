"""BM25 keyword search over ``documents`` — the retrieval primitive of a
training-data pipeline (quality-weighted sampling, targeted corpus slices,
eval-set mining all start from "top-k docs for this query").

The reference has no search surface (its read path is Redis key lookups,
reference sinks/RedisSink.java:174-231); this is an M6-class extension
(SURVEY §7.3) built the Spark-first way:

- per-document term frequencies are pure array expressions over the token
  array (query terms are literals, so NO explode and NO shuffle for tf);
- corpus statistics (N, total token count, per-term document frequency)
  reduce to ONE single-row aggregate, broadcast back with a cross join —
  the classic tiny-side broadcast;
- scoring is arithmetic over (tf, dl, N, df) — whole-stage codegen'd;
- top-k is orderBy+limit -> TakeOrderedAndProject (per-partition heaps +
  driver merge of k rows, never a full sort).

Scale: one scan of ``text`` (column-pruned), one 1-row aggregate, no
shuffle proportional to data size. At 100 TB the cost is the scan itself.
Scores are rounded to 6 decimals in the OUTPUT (ranking uses the raw
score) so the DuckDB differential is robust to last-ulp ``ln`` divergence
between Java's Math.log and libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import spread
from .text_analysis import tokens

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
# mid-frequency terms of the driver's synthetic vocabulary
BM25_QUERY = ("hash", "join", "stream")


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Sparck Jones, the Okapi
    formulation with the +1 idf floor) for a literal query-term set.

    Output: (doc_id, tf_<term>..., score) — score rounded to 6 decimals,
    ranking on the raw double with doc_id as the deterministic tiebreak.
    """
    toks = tokens(F.col("text"))

    # NB: a two-parameter lambda would be treated by F.filter as
    # (element, index) — bind the term via a closure factory instead.
    def _eq(term: str):
        return lambda t: t == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("_toks"), _eq(term))).cast("long").alias(f"tf_{term}")
        for term in query_terms
    ]
    base = (
        spread(docs, "doc_id")
        .select("doc_id", toks.alias("_toks"))
        .select("doc_id", F.size("_toks").cast("long").alias("dl"), *tf_cols)
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{term}") > 0).cast("long")).alias(f"df_{term}")
            for term in query_terms
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") / avgdl))
    score = F.lit(0.0)
    for term in query_terms:  # fixed left-to-right sum: deterministic doubles
        tf = F.col(f"tf_{term}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{term}") + F.lit(0.5))
            / (F.col(f"df_{term}") + F.lit(0.5))
            + F.lit(1.0)
        )
        score = score + idf * ((tf * (F.lit(k1) + F.lit(1.0))) / (tf + norm))
    return (
        scored.withColumn("_score", score)
        .filter(F.col("_score") > 0)
        .orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(topk)
        .select(
            "doc_id",
            *[f"tf_{term}" for term in query_terms],
            F.round(F.col("_score"), 6).alias("score"),
        )
    )

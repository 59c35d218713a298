"""Multinomial Naive Bayes document classification — the corpus-curation
classifier step (domain/language routing, the closed-form stand-in for
the fastText-style classifiers LLM pipelines train for quality and
language filtering). Public algorithm (McCallum & Nigam 1998 formulation
with Laplace smoothing).

Unlike the iterative trainers (bpe.py, similarity.ivf_refine), NB fits in
CLOSED FORM — two hash aggregates — so the whole fit+score+evaluate
pipeline is one Catalyst plan with an exact DuckDB oracle twin.

Scale shape: class-conditional token counts are explode + hash agg
(corpus-sized, the only heavy pass). The model is then PIVOTED to a
(token -> class-ordered logp array) dimension table — vocabulary-sized
(Heaps-bounded at any corpus size) — so scoring is ONE join on the token
key and one fold per document, not a |classes|-way row blowup (the
unpivoted form A/B'd 5.5s vs 3.8s at sf0.1 with 5 classes; at a real
class count the gap grows with the class count). Determinism: the
per-document fold starts from the class-ordered log-prior array and adds
each position's logp array elementwise in position order (array_sort
over (pos, lps), sequential aggregate + zip_with), so every class's
double accumulates in the same order as the DuckDB oracle's mirrored
list_reduce — bit-identical log-likelihoods, bit-identical argmax.

On this synthetic corpus the docs draw from one shared vocabulary, so
classification ACCURACY is meaningless (same caveat as the LANG_MARKERS
language-ID heuristic) — the operator, its plan shape, and its oracle
parity are what is exercised; the separable-corpus unit test pins the
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import tokens

NB_ALPHA = 1  # Laplace smoothing count


def nb_confusion(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """Fit multinomial NB on (text -> ``label_col``) over the corpus and
    return the resubstitution confusion matrix (true_label, pred_label,
    n_docs) — classes-squared rows, the compact evaluation artifact.

    Zero-token documents have no likelihood evidence and drop out of the
    prediction join (the oracle mirrors this). Ties on log-likelihood
    break toward the lexically smallest class (first position of the
    array max in class-name order)."""
    # exchange barrier between tokenization and the per-position lambdas
    # (CollapseProject would re-evaluate the tokenizer per element)
    base = docs.select(
        "doc_id", F.col(label_col).alias("label"), tokens(F.col("text")).alias("toks")
    )
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(parallelism, "doc_id")
    # persisted: the exploded token frame feeds FIVE consumers (class-token
    # counts, class totals, vocabulary size, the model grid's distinct, and
    # the scoring join) — without the pin each re-runs the posexplode over
    # the exchange; the session cache hygiene reclaims it after the action
    dt = base.select(
        "doc_id", "label", F.posexplode("toks").alias("pos", "token")
    ).persist()

    ctk = dt.groupBy("label", "token").agg(F.count(F.lit(1)).alias("c"))
    cls = dt.groupBy("label").agg(F.count(F.lit(1)).alias("n_tok"))
    voc = dt.agg(F.countDistinct("token").alias("v"))

    # 1-row class-ordered header: class names, and log-priors in the same
    # order — every per-class array downstream shares this ordering
    hdr = (
        base.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .agg(
            F.array_sort(F.collect_list(F.struct("label", "n_docs"))).alias(
                "_cs"
            ),
            F.sum("n_docs").alias("_n_all"),
        )
        .select(
            F.transform("_cs", lambda s: s["label"]).alias("class_names"),
            F.transform(
                "_cs",
                lambda s: F.log(
                    s["n_docs"].cast("double") / F.col("_n_all").cast("double")
                ),
            ).alias("log_priors"),
        )
    )

    # (token -> class-ordered logp array): the pivoted model dimension.
    # Tokens unseen for a class get the smoothed floor alpha/(n_tok+a*V).
    grid = (
        dt.select("token").distinct()
        .crossJoin(F.broadcast(cls.select(F.col("label").alias("cand"), "n_tok")))
        .join(
            ctk.select(F.col("label").alias("cand"), "token", "c"),
            ["cand", "token"],
            "left",
        )
        .crossJoin(F.broadcast(voc))
        .select(
            "token",
            "cand",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(NB_ALPHA)).cast(
                    "double"
                )
                / (F.col("n_tok") + F.lit(NB_ALPHA) * F.col("v")).cast(
                    "double"
                )
            ).alias("logp"),
        )
        .groupBy("token")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cand", "logp"))),
                lambda s: s["logp"],
            ).alias("lps")
        )
    )

    ll_df = (
        dt.join(grid, "token")
        .groupBy("doc_id", "label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lps"))),
                lambda s: s["lps"],
            ).alias("_seq")
        )
        .crossJoin(F.broadcast(hdr))
        .select(
            "doc_id",
            "label",
            "class_names",
            F.aggregate(
                F.col("_seq"),
                F.col("log_priors"),
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("ll"),
        )
    )
    # exchange barrier: the argmax projection reads `ll` twice
    # (array_position + array_max) — without it CollapseProject would
    # inline (and re-run) the whole fold per reference
    ll_df = ll_df.repartition(parallelism, "doc_id")
    pred = ll_df.select(
        "doc_id",
        "label",
        F.element_at(
            F.col("class_names"),
            F.array_position(F.col("ll"), F.array_max("ll")).cast("int"),
        ).alias("pred"),
    )
    return (
        pred.groupBy(
            F.col("label").alias("true_label"), F.col("pred").alias("pred_label")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )

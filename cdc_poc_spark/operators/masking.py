"""Deterministic T5-style span corruption: (input, target) pair generation.

The denoising objective behind T5/UL2 pretraining replaces random token
spans with sentinel tokens (`<extra_id_0>`, `<extra_id_1>`, ...) in the
input and emits the masked spans, each prefixed by its sentinel, as the
target. A training-data pipeline materializes these pairs at corpus scale —
this is the missing "objective materialization" step after cleaning /
dedup / packing (pipeline extensions beyond the reference's operator set,
same family as `pack_sequences` and `chunk_documents`).

Determinism design: "randomness" is the seeded md5 hash of
(doc_id, token-block index) — the same draw the split/sampling operators
use — so the corruption is reproducible run-to-run, engine-to-engine, and
stable under repartitioning. Masking whole ``block``-token blocks with
probability ``noise_pct``% yields a mean span length of ``block`` and
~``noise_pct``% corruption rate, the T5 defaults (span 3, rate 15%), with
adjacent masked blocks merging into one span exactly as T5's span merging
does.

Scale shape: ONE shuffle on doc_id — the posexplode is map-side, the two
window passes (previous-flag lag + running span counter) and the final
reassembly groupBy all share the doc_id partitioning, so Catalyst plans a
single exchange. No UDFs: sentinel numbering and span assembly are
array/window expressions end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long_seeded
from .text_analysis import tokens

MASK_BLOCK = 3  # tokens per corruption block (mean span length)
MASK_NOISE_PCT = 15  # corruption rate in percent
MASK_SEED = "span"


def span_corrupt(
    docs: DataFrame,
    block: int = MASK_BLOCK,
    noise_pct: int = MASK_NOISE_PCT,
    seed: str = MASK_SEED,
) -> DataFrame:
    """(doc_id, n_tokens, n_masked, n_spans, input_text, target_text) per
    document with >= 1 whitespace token.

    A token at position p is masked iff
    ``md5_60(seed || doc_id || ':' || p div block) % 100 < noise_pct`` —
    whole blocks mask together; a maximal run of masked tokens is one span.
    ``input_text`` replaces each span with its sentinel; ``target_text``
    lists each sentinel followed by the span's tokens and ends with the
    closing sentinel ``<extra_id_{n_spans}>`` (T5 convention; a fully
    unmasked document's target is exactly ``<extra_id_0>``)."""
    toks = tokens(F.col("text"))
    exploded = docs.select("doc_id", F.posexplode(toks).alias("pos", "token"))
    blk = F.expr(f"pos div {int(block)}")
    flag = (
        md5_long_seeded(F.concat_ws(":", F.col("doc_id"), blk), seed) % 100
        < noise_pct
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = exploded.select("doc_id", "pos", "token", flag.alias("flag"))
    started = flagged.withColumn(
        "is_start", F.col("flag") & ~F.lag("flag", 1, False).over(w)
    ).withColumn(
        "span_id", F.sum(F.col("is_start").cast("int")).over(run) - 1
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("span_id"), F.lit(">"))
    piece_in = (
        F.when(~F.col("flag"), F.col("token"))
        .when(F.col("is_start"), sentinel)
        .otherwise(F.lit(None).cast("string"))
    )
    piece_tgt = (
        F.when(F.col("is_start"), F.concat(sentinel, F.lit(" "), F.col("token")))
        .when(F.col("flag"), F.col("token"))
        .otherwise(F.lit(None).cast("string"))
    )
    pieces = started.select(
        "doc_id",
        "pos",
        F.col("flag"),
        F.col("is_start"),
        piece_in.alias("piece_in"),
        piece_tgt.alias("piece_tgt"),
    )

    def _joined(field: str):
        # collect_list drops NULLs, which would misalign pieces with their
        # positions — collect the full struct (never null), sort by pos,
        # then project + drop the null pieces
        arr = F.array_sort(F.collect_list(F.struct("pos", "piece_in", "piece_tgt")))
        return F.concat_ws(
            " ",
            F.filter(
                F.transform(arr, lambda s: s[field]), lambda x: x.isNotNull()
            ),
        )

    grouped = pieces.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("flag").cast("int")).cast("long").alias("n_masked"),
        F.sum(F.col("is_start").cast("int")).cast("long").alias("n_spans"),
        _joined("piece_in").alias("input_text"),
        _joined("piece_tgt").alias("target_core"),
    )
    closing = F.concat(F.lit("<extra_id_"), F.col("n_spans"), F.lit(">"))
    return grouped.select(
        "doc_id",
        "n_tokens",
        "n_masked",
        "n_spans",
        "input_text",
        F.when(F.col("target_core") == "", closing)
        .otherwise(F.concat(F.col("target_core"), F.lit(" "), closing))
        .alias("target_text"),
    )

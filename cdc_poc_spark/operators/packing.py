"""Sequence packing — the training-sequence assembly step of an LLM data
pipeline: concatenate documents into fixed token-budget packs so no
training sequence wastes padding.

Scale design (100 TB): a single global greedy packer is a serial scan —
unusable. The standard distributed answer is *sharded packing*: documents
are hash-bucketed (same portable buckets as dataset splitting), each shard
packs independently with a deterministic in-shard order, and pack ids are
(shard, local pack). Shards are embarrassingly parallel; each shard's
running token total is one window over one shuffle, and the assignment is
reproducible across engines/retries (no rand(), no partition-layout
dependence).

Within a shard the packer is the "contiguous fill" formulation: documents
in doc_id order fill packs of `budget` tokens; a document starts a new pack
when its tokens would cross the budget boundary of the running total
(floor(exclusive-cumsum / budget) — oversized documents simply occupy
their own pack(s)). This is the formulation used by block-packing data
loaders; boundary-respecting best-fit packing is NP-hard and not
deterministic under parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long_seeded
from .text_analysis import tokens

PACK_SEED = "pack-v1"
PACK_SHARDS = 16
PACK_BUDGET = 256


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
    seed: str = PACK_SEED,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: its shard, token count, exclusive running-token offset
    within the shard, and pack assignment (shard-local pack_id + the offset
    of the document inside its pack)."""
    n_tokens = F.size(tokens(F.col("text"))).cast("long")
    shard = (md5_long_seeded(F.col(id_col), seed) % shards).cast("int")
    base = docs.select(
        F.col(id_col), shard.alias("shard"), n_tokens.alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_excl = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        cum_excl.alias("token_offset"),
        F.floor(cum_excl / budget).cast("long").alias("pack_id"),
        (cum_excl % budget).cast("long").alias("offset_in_pack"),
    )


def pack_summary(packed: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per (shard, pack): document count and fill ratio — the padding-waste
    audit run after packing."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


CHUNK_WINDOW = 128
CHUNK_STRIDE = 96


def chunk_documents(
    docs: DataFrame, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step of a
    pretraining pipeline: each document becomes ceil(n_tokens / stride)
    overlapping chunks of up to ``window`` tokens, starting every ``stride``
    tokens (window > stride => the standard overlap so no boundary context
    is lost). Pure narrow expressions: tokenize, explode the start-offset
    sequence, slice — no shuffle at all; at 100 TB this is a map-only stage
    whose output feeds pack_sequences.

    Deterministic: chunk ids are (doc_id, start // stride)."""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    with_toks = docs.select("doc_id", toks.alias("toks"), n.alias("n")).filter(
        F.col("n") > 0
    )
    start = F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(int(stride))))
    exploded = with_toks.select("doc_id", "toks", start.alias("start"))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, int(window))
    return exploded.select(
        "doc_id",
        (F.col("start") / int(stride)).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )

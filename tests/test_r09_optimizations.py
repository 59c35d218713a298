"""Round-9 optimization guards — pin the plan/semantic properties the
optimization round relies on, so a refactor can't silently reintroduce
the measured defects.

- simhash: the token md5-hash array must be computed ONCE per document
  (materialized behind an exchange), not inlined into every per-bit
  majority filter by CollapseProject (the measured bits× blowup).
- label_propagation: the struct-MIN argmax must keep the exact
  (count DESC, label ASC) rule of the window it replaced, including the
  tie toward the smallest label.
- robust_trend: the pair join must keep an explicit (AQE-exempt)
  partition count so the slope arithmetic cannot be coalesced serial.
- image_dup_pairs: the hamming verify must sit BELOW the candidate
  distinct (the dedup exchange carries only true pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_simhash_hashes_each_token_once(spark):
    from cdc_poc_spark.operators import dedup
    from cdc_poc_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = _plan(dedup.simhash(docs, bits=16))
    # the tokenize+md5 array expression appears in exactly one projection;
    # before the exchange barrier CollapseProject inlined it per bit
    # (16 or 60 occurrences of md5 in the plan text)
    assert plan.count("md5") == 1, plan.count("md5")
    # and the per-bit votes run ABOVE an exchange that ships the array
    assert "Exchange" in plan


def test_label_propagation_tie_breaks_toward_smallest_label(spark):
    from cdc_poc_spark.operators.graph import label_propagation

    # node 1 has two neighbours with one label-vote each after round 1's
    # simultaneous update: labels 2 and 3 tie at cnt=1 -> must pick 2
    e = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    got = {r.node_id: r.community for r in label_propagation(e, rounds=1).collect()}
    assert got[1] == 2  # tie between {2: 1, 3: 1} breaks to the smaller
    # 2 and 3 each see only node 1 -> adopt label 1
    assert got[2] == 1 and got[3] == 1


def test_label_propagation_majority_beats_smaller_label(spark):
    from cdc_poc_spark.operators.graph import label_propagation

    # In round 1 labels are node ids, so every neighbour label is distinct
    # and ALL votes tie at cnt=1 — a single round can never exercise the
    # majority half of the argmax (ADVICE r9). This case needs round 2:
    # after round 1 each node's label is its min neighbour id, so node
    # 100's neighbours carry labels {8: 7, 9: 7, 50: 0} — votes {7: 2,
    # 0: 1} — and the majority label 7 must win even though 0 is lexically
    # smaller. An argmin-by-count (dropped -cnt negation) or a
    # count-blind min-label rewrite would both pick 0.
    e = spark.createDataFrame(
        [(100, 8), (100, 9), (100, 50), (8, 7), (9, 7), (50, 0)],
        "src long, dst long",
    )
    labels1 = {
        r.node_id: r.community
        for r in label_propagation(e, rounds=1).collect()
    }
    # round 1 = min neighbour id everywhere (all votes tie at cnt=1)
    assert labels1[100] == 8
    assert labels1[8] == 7 and labels1[9] == 7 and labels1[50] == 0
    labels2 = {
        r.node_id: r.community
        for r in label_propagation(e, rounds=2).collect()
    }
    # round 2: node 100 votes {7: 2, 0: 1} -> majority 7 beats smaller 0
    assert labels2[100] == 7


def test_robust_trend_pair_join_is_aqe_exempt(spark):
    from cdc_poc_spark.operators.timeseries import robust_trend
    from cdc_poc_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    plan = _plan(robust_trend(ev))
    # the explicit repartition of the exploded pair side (AQE-exempt
    # REPARTITION_BY_NUM) must survive optimization
    assert "REPARTITION_BY_NUM" in plan


def test_image_dup_pairs_filters_before_distinct(spark):
    from cdc_poc_spark.operators import multimodal

    rows = [(i, 0b1111000011110000) for i in range(4)] + [(9, 0b1)]
    hashed = spark.createDataFrame(rows, "media_id long, ahash long")
    df = multimodal.image_dup_pairs(hashed)
    plan = _plan(df)
    # the hamming threshold is evaluated below the dedup aggregate: the
    # HashAggregate's input already carries the hamming column
    agg_at = plan.find("HashAggregate")
    assert agg_at != -1 and "hamming" in plan[agg_at:]
    # identical hashes pair up at hamming 0, each pair exactly once
    got = {(r.id_a, r.id_b, r.hamming) for r in df.collect()}
    assert got == {(a, b, 0) for a in range(4) for b in range(4) if a < b}

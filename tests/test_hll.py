"""HyperLogLog sketch (operators/sketches.py): mergeability, accuracy,
and partition-layout independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators import sketches


def _vals(spark, n, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
    )


def test_union_max_merge_equals_global_sketch(spark):
    """The defining sketch property: merging per-group registers by
    union-max must give exactly the whole-table sketch."""
    df = _vals(spark, 5000)
    merged = (
        sketches.hll_registers(df, "v", ["g"])
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    direct = sketches.hll_registers(df, "v")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_estimate_accuracy(spark):
    """1024 registers -> ~1.04/sqrt(1024) ~ 3.25% typical error; assert a
    generous 10% bound at two cardinalities well above the small-range
    regime."""
    for n in (20_000, 100_000):
        df = _vals(spark, n)
        est = sketches.hll_estimate(sketches.hll_registers(df, "v")).first()
        assert abs(est.est_distinct - n) / n < 0.10, (n, est.est_distinct)


def test_registers_partition_independent(spark):
    df1 = _vals(spark, 3000, parts=1)
    df32 = _vals(spark, 3000, parts=32)
    r1 = set(map(tuple, sketches.hll_registers(df1, "v").collect()))
    r32 = set(map(tuple, sketches.hll_registers(df32, "v").collect()))
    assert r1 == r32


def test_rho_bounds_and_register_range(spark):
    regs = sketches.hll_registers(_vals(spark, 2000), "v").collect()
    assert all(0 <= r.register < sketches.HLL_M for r in regs)
    assert all(1 <= r.max_rho <= sketches.HLL_W + 1 for r in regs)


def test_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "v string"
    )
    regs = sketches.hll_registers(df, "v")
    assert regs.agg(F.sum(F.lit(1))).first()[0] == 2


def test_user_report_scopes(spark, sf_dir):
    from cdc_poc_spark.sources.testdata import load_table

    rep = {r.scope: r for r in
           sketches.hll_user_report(load_table(spark, sf_dir, "events")).collect()}
    assert "ALL" in rep
    for r in rep.values():
        assert r.exact_distinct > 0
        # every scope's estimate within the generous 10% bound
        assert abs(r.rel_err_pct) < 10.0
        assert r.n_registers <= sketches.HLL_M


def test_streaming_hll_merge_matches_batch(spark, tmp_path):
    """Streaming cardinality monitoring: each micro-batch's registers
    union-max into the standing sketch; the final merged registers (and so
    the estimate) must equal the batch sketch over the full history."""
    df = _vals(spark, 8000)
    ind = str(tmp_path / "hll_in")
    for i in range(2):
        df.filter((F.crc32(F.col("v")) % 2) == i).coalesce(1).write.parquet(
            f"{ind}/b{i}", mode="overwrite"
        )

    state = {"regs": None}

    def on_batch(batch_df, _bid):
        regs = sketches.hll_registers(batch_df, "v")
        if state["regs"] is None:
            state["regs"] = regs.persist()
        else:
            state["regs"] = (
                state["regs"]
                .unionByName(regs)
                .groupBy("register")
                .agg(F.max("max_rho").alias("max_rho"))
                .persist()
            )

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{ind}/*")
    )
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = {(r.register, r.max_rho) for r in state["regs"].collect()}
    direct = {(r.register, r.max_rho)
              for r in sketches.hll_registers(df, "v").collect()}
    assert merged == direct


def test_kmv_setops_exact_mode_small_groups(spark):
    """With fewer than K distinct values per group the KMV sketch IS the
    distinct set: every estimate must be exactly right, including the
    intersection."""
    from cdc_poc_spark.operators.sketches import kmv_setops

    rows = [("a", u) for u in range(30)] + [("b", u) for u in range(20, 60)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    r = {(x.type_a, x.type_b): x for x in kmv_setops(ev).collect()}
    got = r[("a", "b")]
    assert (got.est_a, got.est_b) == (30, 40)
    assert got.est_union == 60
    assert got.est_intersect == 10


def test_kmv_setops_estimation_accuracy(spark):
    """Above K distinct values the estimators engage: on constructed
    overlapping groups (600/500 distinct, 200 common) every estimate must
    land within the ~4/sqrt(K-1) relative-error envelope."""
    from cdc_poc_spark.operators.sketches import KMV_K, kmv_setops

    assert KMV_K == 64  # tolerance below is sized for this K
    rows = [("a", u) for u in range(600)] + [("b", u) for u in range(400, 900)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {(x.type_a, x.type_b): x for x in kmv_setops(ev).collect()}[("a", "b")]
    for est, true in [
        (got.est_a, 600),
        (got.est_b, 500),
        (got.est_union, 900),
        (got.est_intersect, 200),
    ]:
        assert abs(est - true) / true < 0.5, (est, true)


def test_kmv_merge_equals_sketch_of_union(spark):
    """The defining mergeability property: kmv_merge(sketch(A), sketch(B))
    must equal sketch(A UNION B) exactly — so per-partition / per-micro-
    batch accumulation can never change an estimate."""
    from cdc_poc_spark.operators.sketches import kmv_merge, kmv_sketch

    rows_a = [("x", u) for u in range(0, 300, 2)] + [("y", u) for u in range(40)]
    rows_b = [("x", u) for u in range(150, 400)] + [("y", u) for u in range(20, 90)]
    a = spark.createDataFrame(rows_a, "event_type string, user_id long")
    b = spark.createDataFrame(rows_b, "event_type string, user_id long")
    direct = kmv_sketch(a.unionAll(b), "event_type", "user_id")
    merged = kmv_merge(
        kmv_sketch(a, "event_type", "user_id"),
        kmv_sketch(b, "event_type", "user_id"),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


# --- portable Bloom filter (round 5: the membership sketch) ---


def test_bloom_no_false_negatives_and_merge_equals_batch(spark):
    """One-sided error is a hard guarantee: every inserted key must be
    maybe_present, under the default geometry AND a deliberately
    saturated tiny filter. Merging two half-builds must equal the
    one-shot build bit-for-bit, and definitely-absent verdicts must
    dominate for absent keys at the default geometry."""
    from pyspark.sql import functions as F

    from cdc_poc_spark.operators import sketches

    keys = spark.range(0, 400).select(F.col("id").alias("k"))
    absent = spark.range(10_000, 10_400).select(F.col("id").alias("k"))

    for m, k in ((sketches.BLOOM_M, sketches.BLOOM_K), (64, 2)):
        bits = sketches.bloom_bits(keys, "k", k=k, m=m)
        assert bits.count() <= m
        verd = sketches.bloom_membership(bits, keys, "k", k=k, m=m)
        assert verd.filter(~F.col("maybe_present")).count() == 0, (m, k)

    bits = sketches.bloom_bits(keys, "k")
    absent_verd = sketches.bloom_membership(bits, absent, "k")
    n_absent_flagged = absent_verd.filter(F.col("maybe_present")).count()
    assert n_absent_flagged < 40  # fp rate ~(1-e^(-kn/m))^k << 10%

    half_a = sketches.bloom_bits(keys.filter(F.col("k") < 200), "k")
    half_b = sketches.bloom_bits(keys.filter(F.col("k") >= 200), "k")
    merged = {r.bit for r in sketches.bloom_merge(half_a, half_b).collect()}
    batch = {r.bit for r in bits.collect()}
    assert merged == batch


def test_bloom_self_sizing_holds_fp_bound_at_two_scales(spark):
    """Round-6 verdict stretch item: bloom_params derives (m, k) from the
    build side, so the analytic false-positive bound
    p = (1 - e^(-k n / m))^k must hold at ANY corpus size — measured FP
    rate within 2x of the bound at two corpus sizes an order of
    magnitude apart (the fixed round-5 (m, k) was sized for ~9k keys
    only). Also pins the integer-ppm k derivation and the pow2 m band
    m/n in [8, 16)."""
    import math

    from pyspark.sql import functions as F

    from cdc_poc_spark.operators import sketches

    for n, probe_n in ((500, 4000), (5000, 8000)):
        keys = spark.range(0, n).select(F.col("id").alias("k"))
        absent = spark.range(1_000_000, 1_000_000 + probe_n).select(
            F.col("id").alias("k")
        )
        m, k = sketches.bloom_params(keys, "k")
        assert m & (m - 1) == 0 and 8 * n <= m < 16 * n
        assert k == max(1, (m * 693_147) // (n * 1_000_000))
        bits = sketches.bloom_bits(keys, "k", k=k, m=m)
        # no false negatives, ever
        self_verd = sketches.bloom_membership(bits, keys, "k", k=k, m=m)
        assert self_verd.filter(~F.col("maybe_present")).count() == 0
        # measured FP rate within 2x of the analytic bound
        fp = (
            sketches.bloom_membership(bits, absent, "k", k=k, m=m)
            .filter(F.col("maybe_present"))
            .count()
        )
        bound = (1.0 - math.exp(-k * n / m)) ** k
        assert fp / probe_n <= 2.0 * bound, (n, m, k, fp, bound)

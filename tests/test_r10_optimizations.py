"""Round-10 optimization guards — semantic equivalence proofs for the
restructures this round kept, pinned against the ORIGINAL formulation
(not just the oracle), so a refactor can't drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_substring_cross_split_equals_filtered_full_join(spark):
    """substring_dup_pairs(split_pred=...) must equal the full self-join
    filtered to cross pairs — the contamination-report restructure."""
    from cdc_poc_spark.functions import hashing
    from cdc_poc_spark.operators import dedup
    from cdc_poc_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    pred = (
        lambda c: hashing.md5_long_seeded(c, "bench") % dedup.CONTAM_BENCH_MOD
        == 0
    )
    full = dedup.substring_dup_pairs(docs)
    is_b_a = pred(F.col("doc_a"))
    is_b_b = pred(F.col("doc_b"))
    want = {
        (r.doc_a, r.doc_b, r.n_shared_fp)
        for r in full.filter(is_b_a != is_b_b).collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.n_shared_fp)
        for r in dedup.substring_dup_pairs(docs, split_pred=pred).collect()
    }
    assert got == want
    # the split must actually select both sides (non-degenerate fixture)
    assert len(got) > 0


def test_substring_cross_split_keeps_corpus_wide_hot_cap(spark):
    """The hot-fingerprint cap must stay computed over the FULL corpus:
    a boilerplate fingerprint shared by many corpus docs is dropped even
    for bench-vs-corpus pairs (a split-side df would not see it as hot).
    Constructed: 30 corpus docs share one long boilerplate substring
    (df 30 > 10% of 40 docs), one bench doc contains ONLY that substring
    -> no surviving shared fingerprint -> no pair."""
    from cdc_poc_spark.operators import dedup

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler + f" unique tail {i} " + "x" * 30) for i in range(30)]
    # ids 100..108: unrelated corpus docs
    rows += [(100 + i, f"completely different text body number {i} " + "y" * 40)
             for i in range(9)]
    rows += [(999, boiler)]  # the "bench" doc: only boilerplate content
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.substring_dup_pairs(
        docs, split_pred=lambda c: c == 999
    ).collect()
    assert got == []  # every shared fingerprint was corpus-hot


def test_md5_long_py_binary_form_matches_hex_form():
    """The binary fast path must equal the original hexdigest parse on
    arbitrary strings (incl. empty and non-ascii)."""
    import hashlib

    from cdc_poc_spark.functions.hashing import md5_long_py

    for s in ["", "a", "hp3_17", "the quick brown fox", "naïve café", "w123",
              " ".join(["tok"] * 50), "é☃"]:
        want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        assert md5_long_py(s) == want, s


def _ivf_assign_expression_form(embeddings, centroids, nprobe=1):
    """The round-9 ivf_assign plan the Arrow kernel replaced: crossJoin
    against the broadcast centroids + per-vec_id row_number window —
    kept here as the differential reference."""
    from pyspark.sql import Window

    from cdc_poc_spark.functions.partitioning import spread
    from cdc_poc_spark.operators.similarity import dot

    e = spread(embeddings, "vec_id").select(
        "vec_id", "embedding", dot(F.col("embedding"), F.col("embedding")).alias("_ne")
    )
    c = centroids.select(
        "cell", "c_vec", dot(F.col("c_vec"), F.col("c_vec")).alias("_nc")
    )
    d = e.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cell",
        (
            F.col("_ne") + F.col("_nc")
            - F.lit(2.0) * dot(F.col("embedding"), F.col("c_vec"))
        ).alias("d"),
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cell")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(nprobe))
        .select("vec_id", "cell", "d")
    )


def test_ivf_assign_kernel_matches_expression_form(spark):
    """The Arrow kernel must reproduce the crossJoin+window assignment
    value-for-value (cells AND the raw distance doubles, bitwise) on the
    real corpus at nprobe 1 and 3, and on a constructed dim-8 corpus
    with distance ties (equal vectors -> tie broken by lowest cell)."""
    from cdc_poc_spark.operators.similarity import (
        balanced_max_cells,
        ivf_assign,
        ivf_centroids,
    )
    from cdc_poc_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    cents = ivf_centroids(emb, max_cells="balanced")
    for nprobe in (1, 3):
        got = {
            (r.vec_id, r.cell, r.d)
            for r in ivf_assign(emb, cents, nprobe=nprobe, with_dist=True).collect()
        }
        want = {
            (r.vec_id, r.cell, r.d)
            for r in _ivf_assign_expression_form(emb, cents, nprobe).collect()
        }
        assert got == want and len(got) > 0
    # constructed ties: duplicate centroids (cells 0 and 10 identical) —
    # the (d, cell) tie must break to cell 0 in both forms
    rows = [(i, [float(i % 3), 1.0, 0.0, 2.0, 0.5, 0.25, 1.5, 0.125])
            for i in range(30)]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents2 = spark.createDataFrame(
        [(0, rows[0][1]), (10, rows[0][1]), (20, rows[1][1])],
        "cell long, c_vec array<double>",
    )
    got2 = sorted(
        (r.vec_id, r.cell)
        for r in ivf_assign(emb2, cents2, nprobe=2).collect()
    )
    want2 = sorted(
        (r.vec_id, r.cell)
        for r in _ivf_assign_expression_form(emb2, cents2, 2)
        .select("vec_id", "cell")
        .collect()
    )
    assert got2 == want2
    # empty centroid set -> empty assignment, like the old crossJoin
    empty = cents2.filter(F.lit(False))
    assert ivf_assign(emb2, empty, nprobe=2).count() == 0


def test_embedding_ivf_cell_cap_does_not_bind_at_shipped_sfs(spark):
    """EMB_IVF_CELL_CAP is contract-visible but must be slack at the
    shipped SFs (declared results unchanged): assert the max balanced
    3-probe cell occupancy stays under the cap at sf0.001/sf0.01 (sf0.1
    measured 166 via DuckDB, recorded in OPTIMIZATION_r10.md)."""
    from cdc_poc_spark.operators.similarity import (
        EMB_IVF_CELL_CAP,
        EMB_IVF_NPROBE,
        ivf_assign,
        ivf_centroids,
    )
    from cdc_poc_spark.sources.testdata import load_table

    for sf in ("0.001", "0.01"):
        emb = load_table(spark, f"/root/testdata/sf{sf}", "embeddings")
        cents = ivf_centroids(emb, max_cells="balanced")
        occ = (
            ivf_assign(emb, cents, nprobe=EMB_IVF_NPROBE)
            .groupBy("cell")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert occ < EMB_IVF_CELL_CAP


def test_cc_midloop_contraction_matches_pure_loop(spark, monkeypatch):
    """The mid-loop contraction (auto strategy, big graphs) must land on
    the identical (node, cluster_id) relation as the pure distributed
    loop and the driver solver. Exercised by shrinking the driver cap so
    a 150-node path graph (149 edges > cap, diameter >> one round) takes
    the distributed path and contracts below the cap at round 2."""
    from cdc_poc_spark.operators import clustering

    monkeypatch.setattr(clustering, "CC_DRIVER_EDGE_CAP", 100)
    solver_calls = []
    real_solver = clustering._driver_components
    monkeypatch.setattr(
        clustering,
        "_driver_components",
        lambda pdf: (solver_calls.append(len(pdf)), real_solver(pdf))[1],
    )
    # one 30-node path (converges slowly — still unconverged at round 2)
    # plus 200 disjoint triangles (collapse to uniform labels by round 1,
    # so the round-2 contraction shrinks to just the path's label chain)
    rows = [(i, i + 1) for i in range(29)]
    for base in range(1000, 1600, 3):
        rows += [(base, base + 1), (base + 1, base + 2), (base, base + 2)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r.node, r.cluster_id)
        for r in clustering.connected_components(edges).collect()
    }
    want = {(i, 0) for i in range(30)}
    for base in range(1000, 1600, 3):
        want |= {(base, base), (base + 1, base), (base + 2, base)}
    assert got == want
    # the contraction branch must actually have fired (entry fast path is
    # blocked by the shrunken cap, so the only solver call is mid-loop),
    # and on a CONTRACTED graph, not the original
    assert len(solver_calls) == 1 and 0 < solver_calls[0] <= 100
    # the forced pure loop agrees (it never contracts)
    pure = {
        (r.node, r.cluster_id)
        for r in clustering.connected_components(
            edges, strategy="distributed"
        ).collect()
    }
    assert pure == want
    # forced-distributed must never contract (it exists to test the loop)
    assert len(solver_calls) == 1


def test_embedding_ivf_cell_cap_keeps_nearest_members(spark):
    """When the cap binds, the survivors must be the cap members nearest
    the centroid (ties -> lowest vec_id), and the pair set shrinks to
    pairs among survivors — differential against cell_cap=None plus the
    explicit rank rule."""
    from cdc_poc_spark.operators.similarity import embedding_dup_pairs_ivf

    # one tight cluster of 8 near-identical vectors around the only
    # centroid seed (vec_id 0 % 29 == 0); cap 4 keeps the 4 nearest
    rows = [(i, [1.0 + 0.001 * i, 0.5, 0.25, 2.0]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = {
        (r.vec_a, r.vec_b)
        for r in embedding_dup_pairs_ivf(
            emb, tau=0.4, centroid_mod=29, nprobe=1, cell_cap=4
        ).collect()
    }
    # nearest 4 to the seed (vec 0's vector) are vecs 0..3 by construction
    assert capped == {(a, b) for a in range(4) for b in range(4) if a < b}
    full = {
        (r.vec_a, r.vec_b)
        for r in embedding_dup_pairs_ivf(
            emb, tau=0.4, centroid_mod=29, nprobe=1, cell_cap=None
        ).collect()
    }
    assert full == {(a, b) for a in range(8) for b in range(8) if a < b}

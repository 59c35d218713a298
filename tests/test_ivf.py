"""IVF ANN tests: recall vs brute force and the k-means refinement
invariant (iterative path, no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators import similarity
from cdc_poc_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"


def _mean_assign_dist(emb, cents):
    assign = similarity.ivf_assign(emb, cents)
    d = (
        emb.join(assign, "vec_id")
        .join(cents.withColumnRenamed("cell", "cell2"), F.col("cell") == F.col("cell2"))
        .select(similarity.l2sq(F.col("embedding"), F.col("c_vec")).alias("d"))
    )
    return d.agg(F.avg("d")).collect()[0][0]


def test_lloyd_refinement_reduces_distortion(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    seed = similarity.ivf_centroids(emb)
    refined = similarity.ivf_refine(emb, seed, iters=2)
    assert _mean_assign_dist(emb, refined) <= _mean_assign_dist(emb, seed) + 1e-9


def test_ivf_recall_vs_brute_force(spark):
    """With nprobe=3 of ~18 cells the probe set is ~1/6 of the corpus; the
    top-10 overlap with brute force must still be meaningful (>= 3/10 on
    this corpus — IVF on near-uniform random vectors is a weak quantizer,
    but the determinism and plumbing are what's under test)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {r["vec_id"] for r in similarity.brute_force_topk(emb, 0, 10).collect()}
    approx = {r["vec_id"] for r in similarity.ann_ivf_topk(emb, 0, 10).collect()}
    assert len(approx) == 10
    assert len(exact & approx) >= 3


def test_pandas_udf_cosine_matches_fold(spark):
    """The vectorized numpy path must agree with the JVM fold path: same
    top-k members and order, scores within 1e-9 (summation-order ulps)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    fold = similarity.brute_force_topk(emb, 0, 10).collect()
    vec = similarity.brute_force_topk_pandas(emb, 0, 10).collect()
    assert [r["vec_id"] for r in fold] == [r["vec_id"] for r in vec]
    for a, b in zip(fold, vec):
        assert abs(a["cosine_sim"] - b["cosine_sim"]) < 1e-9


def test_semantic_dedup_drops_in_cluster_near_dups(spark):
    """SemDeDup contract: a vector with a high-cosine LOWER-id neighbour in
    its cluster is dropped; the lowest-id member of a dup group survives;
    dissimilar vectors survive. Built on a constructed corpus where cluster
    assignment is forced by construction (two far-apart directions)."""
    from cdc_poc_spark.operators.similarity import semantic_dedup

    def v(direction, eps):
        base = [0.0] * 8
        base[direction] = 1.0
        base[(direction + 1) % 8] = eps
        return base

    rows = [
        # cell A (near e0): 0 is the centroid seed (id%2==0 with mod=2 -> use mod big)
        (0, v(0, 0.00), "a"),
        (2, v(0, 0.01), "a"),   # near-dup of 0 -> dropped
        (4, v(0, 0.02), "a"),   # near-dup of 0 and 2 -> dropped, n_dup_of 2
        (5, v(4, 0.00), "b"),   # other direction, own cluster
        (7, v(4, 0.01), "b"),   # near-dup of 5 -> dropped
        (9, v(2, 0.0), "c"),    # orthogonal, no lower-id neighbour above tau
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r.drop_id: r for r in semantic_dedup(emb, tau=0.95, centroid_mod=5).collect()}
    assert set(out) == {2, 4, 7}
    assert out[4].n_dup_of == 2
    assert out[2].n_dup_of == 1
    # survivors: 0 (lowest id of group A), 5 (lowest of B), 9 (unique)


def test_ivf_centroids_max_cells_cap(spark):
    """The capped quantizer keeps exactly the first max_cells seeds by
    vec_id (deterministic), and assignment stays total — every vector
    still lands in nprobe cells drawn from the capped set."""
    from pyspark.sql import functions as F

    from cdc_poc_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = spark.range(0, 100).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (F.col("id") % 13 + i).cast("double"),
        ).alias("embedding"),
    )
    capped = ivf_centroids(emb, centroid_mod=10, max_cells=3)
    assert [r.cell for r in capped.orderBy("cell").collect()] == [0, 10, 20]
    # sparse/offset id space must still yield max_cells centroids
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    capped_off = ivf_centroids(shifted, centroid_mod=10, max_cells=3)
    assert [r.cell for r in capped_off.orderBy("cell").collect()] == [
        1_000_000, 1_000_010, 1_000_020,
    ]
    assign = ivf_assign(emb, capped, nprobe=2)
    rows = assign.collect()
    assert len(rows) == 200  # 100 vectors x nprobe, none dropped
    assert {r.cell for r in rows} <= {0, 10, 20}
    per_vec = assign.groupBy("vec_id").count().collect()
    assert all(r["count"] == 2 for r in per_vec)


def test_embedding_dup_batch_lsh_cross_side_only(spark):
    """Incremental embedding dedup emits ONLY batch-vs-index pairs: a
    batch vector identical to an index vector is found; identical pairs
    entirely within the index (or within the batch) are not re-emitted."""
    from cdc_poc_spark.operators.similarity import embedding_dup_batch_lsh

    def v(seed, eps=0.0):
        base = [float((seed * 31 + i * 7) % 11 - 5) for i in range(8)]
        base[0] += eps
        return base

    index = spark.createDataFrame(
        [(0, v(1)), (1, v(1)), (2, v(2)), (3, v(3))],  # 0~1 internal dup
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(100, v(2, 0.001)), (101, v(9)), (102, v(9, 0.001))],  # 101~102 internal
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.vec_batch, r.vec_index)
        for r in embedding_dup_batch_lsh(
            index, batch, 0.999, bands=4, rows=4, dim=8
        ).collect()
    }
    assert (100, 2) in got                      # cross-side near-dup found
    assert all(b >= 100 and i < 100 for b, i in got)  # only cross-side
    assert (0, 1) not in got and (1, 0) not in got
    assert not any({a, b} == {101, 102} for a, b in got)


def test_ivfpq_candidates_confined_to_probed_cells(spark):
    """IVF-PQ invariant: every returned vec_id must be assigned to one of
    the nprobe cells the query probed, and its ADC score must equal the
    full-corpus pq_adc_topk score for the same vec_id (candidate
    restriction changes WHICH vectors are scored, never their score)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    got = similarity.ivfpq_topk(emb, 0, 10).collect()
    assert 0 < len(got) <= 10

    cents = similarity.ivf_centroids(emb)
    assign = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(emb, cents).collect()}
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    probed = {
        r["cell"]
        for r in q.crossJoin(F.broadcast(cents))
        .select("cell", similarity.l2sq(F.col("q_vec"), F.col("c_vec")).alias("d"))
        .orderBy("d", "cell")
        .limit(similarity.IVF_NPROBE)
        .collect()
    }
    for r in got:
        assert assign[r["vec_id"]] in probed

    # full-corpus ADC scores for comparison: large k so the candidate ids
    # are all present
    full = {
        r["vec_id"]: r["approx_l2sq"]
        for r in similarity.pq_adc_topk(emb, 0, k=10_000).collect()
    }
    for r in got:
        assert abs(full[r["vec_id"]] - r["approx_l2sq"]) < 1e-12


def test_semantic_decontaminate_flags_only_near_bench(spark):
    """A corpus vector colinear with a bench vector (vec_id % 50 == 0) is
    flagged with max_cosine ~1; orthogonal corpus vectors are not; bench
    vectors themselves never appear in the output."""

    def v(axis, dim=16, eps=0.0):
        base = [0.0] * dim
        base[axis] = 1.0
        base[(axis + 1) % dim] = eps
        return base

    emb = spark.createDataFrame(
        [
            (0, v(1), "a"),      # bench (id % 50 == 0)
            (50, v(5), "a"),     # bench
            (1, v(1, eps=0.01), "a"),   # corpus, near bench 0
            (2, v(9), "a"),      # corpus, orthogonal to both
            (51, v(5), "a"),     # corpus, identical to bench 50
        ],
        "vec_id long, embedding array<double>, label string",
    )
    got = {
        r.vec_id: (r.n_bench_matches, r.max_cosine)
        for r in similarity.semantic_decontaminate(emb, 0.9, dim=16).collect()
    }
    assert set(got) == {1, 51}
    assert got[1][0] == 1 and got[1][1] > 0.99
    assert got[51] == (1, 1.0)


def test_pq_codebook_fixed_at_scale(spark):
    """Round 6: pq_encode / pq_adc_topk default to the classic fixed
    256-entry codebook (PQ_MAX_CODES). Below 256*29 ~ 7.4k vectors the
    cap never binds (all shipped testdata scales are unchanged); above
    it the codebook must STOP growing — the uncapped every-29th-vector
    seed made assignment O(n^2/29) and measured 40.8x wall at a 10x data
    step in the round-6 sf1 spot-bench."""
    from cdc_poc_spark.sources import generator as G

    emb = G.gen_embeddings(spark, 9000)  # 9000/29 = 310 raw seeds > 256
    used = (
        similarity.pq_encode(emb)
        .select(F.explode(F.split("codes", "-")).alias("cell"))
        .distinct()
        .count()
    )
    assert used <= similarity.PQ_MAX_CODES
    top = similarity.pq_adc_topk(emb, 0, k=10).collect()
    assert len(top) == 10
    # ADC scores are sums of LUT entries over the SAME capped codebook —
    # every scored vector's code cells must come from the capped seed set
    seeds = {
        r.vec_id
        for r in emb.filter(F.col("vec_id") % similarity.PQ_CENTROID_MOD == 0)
        .orderBy("vec_id")
        .limit(similarity.PQ_MAX_CODES)
        .collect()
    }
    cells = {
        int(c)
        for r in similarity.pq_encode(emb).limit(50).collect()
        for c in r.codes.split("-")
    }
    assert cells <= seeds

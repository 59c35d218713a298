"""Random-projection reduction (operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_poc_spark.operators import similarity
from cdc_poc_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_projection_matrix_deterministic_and_shaped():
    m1 = similarity.projection_matrix()
    m2 = similarity.projection_matrix()
    assert m1 == m2
    assert len(m1) == similarity.RP_DIM
    assert all(len(r) == similarity.EMBED_DIM for r in m1)
    assert all(-1000 <= x <= 1000 for r in m1 for x in r)


def test_project_matches_python_fold(spark):
    emb = load_table(spark, SF, "embeddings").limit(5)
    rows = similarity.projection_matrix()
    got = emb.select(
        "vec_id", similarity.project(F.col("embedding"), rows).alias("r")
    ).collect()
    src = {r.vec_id: r.embedding for r in emb.collect()}
    for g in got:
        v = src[g.vec_id]
        for j, comp in enumerate(g.r):
            expect = 0.0
            for x, w in zip(v, rows[j]):  # same left-fold order
                expect += float(x) * float(w)
            assert abs(comp - expect) < 1e-6


def test_recall_probe_correct(spark):
    """The probe's in_exact_topk flags must equal an independent Python
    brute-force exact top-k. Quality note: the synthetic embeddings are
    near-uniform (neighbour margins inside JL noise at 16-d), so the probe
    HONESTLY reports low recall here — that report being right is exactly
    its job; no quality bar is asserted, only correctness."""
    import math

    emb = load_table(spark, SF, "embeddings")
    out = similarity.random_projection_recall(emb, 0, 10).collect()
    assert len(out) == 10
    assert [r.nbr_rank for r in out] == list(range(1, 11))
    rcs = [r.reduced_cosine for r in out]
    assert rcs == sorted(rcs, reverse=True)

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    q = vecs[0]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    exact = sorted(
        ((cos(v, q), vid) for vid, v in vecs.items() if vid != 0),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    exact_ids = {vid for _, vid in exact}
    for r in out:
        assert r.in_exact_topk == (1 if r.vec_id in exact_ids else 0)
        # full_cosine matches the independent computation
        assert abs(r.full_cosine - cos(vecs[r.vec_id], q)) < 1e-5


def test_probe_perfect_recall_on_separable_data(spark):
    """On data whose neighbour structure survives projection (clustered,
    large margins), the same probe must report full recall — separating
    'probe is broken' from 'data is JL-hard'."""
    import random

    rng = random.Random(3)
    q = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(0, q, 0)]
    # 10 near-copies of the query (the unambiguous exact top-10) ...
    for i in range(1, 11):
        rows.append((i, [x + rng.uniform(-0.01, 0.01) for x in q], 0))
    # ... and 29 unrelated vectors (cosine ~0 to q)
    for i in range(11, 40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.random_projection_recall(emb, 0, 10).collect()
    assert sum(r.in_exact_topk for r in out) == 10

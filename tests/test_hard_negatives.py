"""Hard-negative mining (operators/similarity.py::hard_negatives)."""

from __future__ import annotations

import math
import random

from cdc_poc_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _rand_vecs(n, dim, seed=7):
    import struct

    rng = random.Random(seed)

    def f32(x):  # embeddings are stored as float32: quantize the oracle too
        return struct.unpack("f", struct.pack("f", x))[0]

    return [
        (i, [f32(rng.uniform(-1, 1)) for _ in range(dim)], i % 3)
        for i in range(n)
    ]


def test_exact_matches_bruteforce(spark):
    rows = _rand_vecs(40, 8)
    out = similarity.hard_negatives(
        _emb(spark, rows), k=3, exact=True
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.src_id, []).append(r)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for sid, svec, slab in rows:
        cands = [
            (cos(svec, v), vid)
            for vid, v, lab in rows
            if vid != sid and lab != slab
        ]
        cands = [c for c in cands if c[0] < similarity.HARDNEG_FALSE_NEG_TAU]
        expect = sorted(cands, key=lambda c: (-c[0], c[1]))[:3]
        got = sorted(by_src[sid], key=lambda r: r.nbr_rank)
        assert [g.nbr_id for g in got] == [e[1] for e in expect], sid
        for g, e in zip(got, expect):
            assert abs(g.cosine_sim - e[0]) < 1e-9


def test_no_same_label_pairs(spark):
    rows = _rand_vecs(60, 8)
    out = similarity.hard_negatives(_emb(spark, rows), k=5).collect()
    assert out, "LSH path returned nothing"
    assert all(r.src_label != r.nbr_label for r in out)
    assert all(r.cosine_sim < similarity.HARDNEG_FALSE_NEG_TAU for r in out)


def test_false_negative_ceiling_excludes_near_dup(spark):
    # vec 1 is a near-copy of vec 0 with a different label: it would be the
    # hardest negative, but it is above the ceiling -> must be excluded
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    rows = [
        (0, base, 0),
        (1, near, 1),
        (2, [0.5, 0.5, 0.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0, 0.0], 1),
    ]
    out = similarity.hard_negatives(
        _emb(spark, rows), k=2, exact=True
    ).collect()
    nbrs0 = {r.nbr_id for r in out if r.src_id == 0}
    assert 1 not in nbrs0
    assert 2 in nbrs0


def test_lsh_pairs_subset_of_exact(spark):
    rows = _rand_vecs(50, 8)
    exact = {
        (r.src_id, r.nbr_id): r.cosine_sim
        for r in similarity.hard_negatives(
            _emb(spark, rows), k=50, exact=True
        ).collect()
    }
    lsh = similarity.hard_negatives(_emb(spark, rows), k=5).collect()
    for r in lsh:
        assert (r.src_id, r.nbr_id) in exact
        assert abs(exact[(r.src_id, r.nbr_id)] - r.cosine_sim) < 1e-12

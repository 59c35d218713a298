"""Fixed-point PageRank (operators/graph.py): exact differential against a
pure-Python reference of the identical integer recurrence, structural
invariants, and the degenerate inputs."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_poc_spark.operators.graph import (
    PR_DAMP_PCT,
    PR_TOTAL,
    hits,
    knn_pagerank,
    pagerank,
)


def _ref_pagerank(edges, iters=8, total=PR_TOTAL, damp=PR_DAMP_PCT):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = Counter(u for u, _ in edges)
    r = {v: total // n for v in nodes}
    tp = (total * (100 - damp)) // (100 * n)
    for _ in range(iters):
        nr = {v: tp for v in nodes}
        for u, v in edges:
            nr[v] += (r[u] * damp) // (100 * outdeg[u])
        r = nr
    return r


EDGES = [
    (1, 2),
    (2, 1),
    (2, 3),
    (3, 1),
    (4, 1),
    (4, 5),
    (5, 4),
    (6, 4),  # 6 has out-edges but no in-edges -> teleport-only rank
]


def test_pagerank_matches_python_reference_exactly(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node_id"]: r["rank_units"]
        for r in pagerank(df, iterations=8).collect()
    }
    assert got == _ref_pagerank(EDGES)


def test_pagerank_uniform_on_regular_graph(spark):
    # directed 8-cycle: 1-regular in and out -> ranks stay exactly uniform
    cyc = [(i, (i + 1) % 8) for i in range(8)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    units = [r["rank_units"] for r in pagerank(df).collect()]
    assert len(units) == 8
    assert len(set(units)) == 1


def test_pagerank_mass_is_conserved_up_to_truncation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    out = pagerank(df, iterations=8)
    total = out.agg(F.sum("rank_units")).first()[0]
    # each integer division truncates < 1 unit per edge per round, plus the
    # teleport truncation per node per round; with damping the loss is
    # geometric but this loose linear bound is enough to catch a real bug
    n_nodes, n_edges, rounds = 6, len(EDGES), 8
    max_loss = rounds * (n_edges + n_nodes) + n_nodes
    assert PR_TOTAL - max_loss <= total <= PR_TOTAL


def test_pagerank_source_only_node_gets_teleport_rank(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node_id"]: r["rank_units"] for r in pagerank(df).collect()}
    teleport = (PR_TOTAL * (100 - PR_DAMP_PCT)) // (100 * 6)
    assert got[6] == teleport
    # and the most-linked hub outranks it
    assert got[1] > got[6]


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def _ref_hits(edges, rounds=4, scale=10**6):
    hubs = {u: scale for u, _ in edges}
    auths: dict = {}
    for _ in range(rounds):
        raw_a: Counter = Counter()
        for u, v in edges:
            raw_a[v] += hubs[u]
        mx = max(raw_a.values())
        auths = {v: (r * scale) // mx for v, r in raw_a.items()}
        raw_h: Counter = Counter()
        for u, v in edges:
            raw_h[u] += auths[v]
        mx = max(raw_h.values())
        hubs = {u: (r * scale) // mx for u, r in raw_h.items()}
    return hubs, auths


def test_hits_matches_python_reference_exactly(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    ref_h, ref_a = _ref_hits(EDGES)
    got = hits(df, topk=100).collect()
    got_h = {r["node_id"]: r["score"] for r in got if r["side"] == "hub"}
    got_a = {r["node_id"]: r["score"] for r in got if r["side"] == "auth"}
    assert got_h == ref_h
    assert got_a == ref_a


def test_hits_scores_bounded_and_max_is_scale(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    for side in ("hub", "auth"):
        rows = hits(df).filter(F.col("side") == side).collect()
        scores = sorted((r["score"] for r in rows), reverse=True)
        # L-infinity rescale: the side's max is exactly the scale and the
        # flooring division keeps every other score strictly within it
        assert scores[0] == 10**6
        assert all(0 <= s <= 10**6 for s in scores)
        # rnk is dense over descending score
        rnks = sorted(r["rnk"] for r in rows)
        assert rnks == list(range(1, len(rows) + 1))


def test_hits_star_graph_center_is_sole_authority(spark):
    # 5 hubs all pointing at node 99: the center is the only authority
    star = [(i, 99) for i in range(1, 6)]
    df = spark.createDataFrame(star, "src long, dst long")
    rows = hits(df).collect()
    auths = [r for r in rows if r["side"] == "auth"]
    assert len(auths) == 1 and auths[0]["node_id"] == 99
    hubs = [r for r in rows if r["side"] == "hub"]
    # all five spokes are equally perfect hubs
    assert {r["score"] for r in hubs} == {10**6} and len(hubs) == 5


def test_knn_pagerank_shape(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_pagerank(emb, topk=10)
    rows = out.collect()
    assert len(rows) == 10
    assert out.columns == ["vec_id", "rank_units", "rank_ppm"]
    # descending by rank, ids break ties ascending
    units = [r["rank_units"] for r in rows]
    assert units == sorted(units, reverse=True)
    assert all(r["rank_ppm"] == (r["rank_units"] * 10**6) // PR_TOTAL for r in rows)


def test_label_propagation_splits_bridged_cliques(spark):
    """Two 4-cliques joined by a single bridge edge: connected components
    would merge them into one group; label propagation keeps them as two
    communities (the bridge is outvoted by each clique's internal
    majority)."""
    from itertools import combinations

    from cdc_poc_spark.operators.graph import label_propagation

    a, b = [1, 2, 3, 4], [10, 11, 12, 13]
    edges = (
        [(x, y) for x, y in combinations(a, 2)]
        + [(x, y) for x, y in combinations(b, 2)]
        + [(4, 10)]  # the bridge
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node_id: (r.community, r.community_size)
        for r in label_propagation(e).collect()
    }
    assert {got[n] for n in a} == {(1, 4)}
    assert {got[n] for n in b} == {(10, 4)}


def test_diversity_sample_cap_and_rank_invariants(spark):
    """Per community: at most DIVERSITY_CAP survivors, ranks contiguous
    from 1, and every survivor belongs to the community table."""
    from collections import Counter

    from cdc_poc_spark.operators.graph import (
        DIVERSITY_CAP,
        diversity_sample,
        knn_communities,
    )
    from cdc_poc_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    picked = diversity_sample(emb).collect()
    assert picked
    per = Counter(r.community for r in picked)
    assert max(per.values()) <= DIVERSITY_CAP
    ranks: dict[int, list[int]] = {}
    for r in picked:
        ranks.setdefault(r.community, []).append(r.rank_in_community)
    for c, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))
    comm = {(r.node_id, r.community) for r in knn_communities(emb).collect()}
    assert all((r.vec_id, r.community) in comm for r in picked)


def test_triangle_counts_constructed_graph(spark):
    """Exact triangle semantics: a 4-clique has C(3,2)=3 triangles per
    node and coefficient 1; a path node has none and coefficient 0; a
    degree-1 node has an undefined (NULL) coefficient."""
    from itertools import combinations

    from cdc_poc_spark.operators.graph import triangle_counts

    clique = list(combinations([1, 2, 3, 4], 2))   # 4-clique
    path = [(10, 11), (11, 12)]                    # open wedge
    pendant = [(20, 21)]                           # single edge
    e = spark.createDataFrame(clique + path + pendant, "src long, dst long")
    got = {r.node_id: r for r in triangle_counts(e).collect()}
    for n in (1, 2, 3, 4):
        assert (got[n].degree, got[n].n_triangles) == (3, 3)
        assert got[n].clustering_coeff == 1.0
    assert got[11].degree == 2 and got[11].n_triangles == 0
    assert got[11].clustering_coeff == 0.0
    assert got[20].degree == 1 and got[20].clustering_coeff is None

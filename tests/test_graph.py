"""Fixed-point PageRank (operators/graph.py): exact differential against a
pure-Python reference of the identical integer recurrence, structural
invariants, and the degenerate inputs."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_poc_spark.operators.graph import (
    PR_DAMP_PCT,
    PR_TOTAL,
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

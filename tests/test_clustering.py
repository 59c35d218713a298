"""Connected-components unit tests — the iterative operator needs its own
coverage beyond the oracle diff (worst-case topology, convergence bound)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_poc_spark.operators.clustering import connected_components, dup_clusters
from cdc_poc_spark.sources.testdata import load_table


def _py_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_matches_union_find(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 10), (30, 31)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == _py_components(pairs)


def test_cc_chain_converges_in_log_rounds(spark):
    # a 64-node path graph is the worst case for plain label propagation
    # (diameter 63); pointer jumping must close it well inside the cap
    # (forced distributed: auto would short-circuit to the driver path)
    n = 64
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = connected_components(edges, max_rounds=12, strategy="distributed")
    assert got.select(F.count_distinct("cluster_id")).first()[0] == 1
    assert got.filter(F.col("cluster_id") != 0).count() == 0
    assert got.count() == n


def test_cc_raises_without_fixpoint(spark):
    pairs = [(i, i + 1) for i in range(40)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_rounds=1, strategy="distributed")


def test_cc_driver_matches_distributed(spark):
    # the round-7 guarded driver fast path must produce the identical
    # (node, cluster_id) relation as the distributed loop — chains,
    # cliques, isolated-by-self-loop nodes, and 60-bit-sized ids mixed
    pairs = (
        [(i, i + 1) for i in range(30)]  # path
        + [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
        + [(2**59 + 7, 2**59 + 11), (2**59 + 11, 3)]
        + [(500, 500)]
    )
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    drv = {
        (r["node"], r["cluster_id"])
        for r in connected_components(edges, strategy="driver").collect()
    }
    dist = {
        (r["node"], r["cluster_id"])
        for r in connected_components(edges, strategy="distributed").collect()
    }
    assert drv == dist


def test_cc_auto_takes_driver_path_under_cap(spark):
    # under the cap, auto == driver (identical relation), and the result
    # is still correct against the pure-python reference
    pairs = [(2 * i, 2 * i + 1) for i in range(50)] + [(1, 2)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == _py_components(pairs)


def test_cc_string_ids_skip_driver_path(spark):
    # ADVICE r7: the driver solver is int64-only, so non-integral ids
    # under "auto" must keep the distributed loop (and still be correct),
    # while forcing "driver" fails with this module's own TypeError, not
    # a numpy cast error from inside pandas.
    import pytest

    pairs = [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}
    with pytest.raises(TypeError, match="integral"):
        connected_components(edges, strategy="driver")


def test_dup_clusters_keeper_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    clusters = dup_clusters(docs, 0.2).collect()
    assert clusters, "test corpus should contain near-dup pairs"
    by_cluster: dict[int, list] = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m["doc_id"] for m in members)
        assert cid == ids[0], "cluster id must be the min member id"
        keepers = [m for m in members if m["is_keeper"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == cid
        assert all(m["cluster_size"] == len(members) for m in members)
        assert len(members) >= 2, "singletons cannot appear in the pair graph"


def test_resolve_entities_transitive_and_singletons(spark):
    from cdc_poc_spark.operators.clustering import resolve_entities

    df = spark.createDataFrame(
        [
            ("ACME Corp",),
            ("ACME Corp",),   # duplicate rows collapse
            ("ACME Cor",),    # dist 1 of ACME Corp
            ("ACME Co",),     # dist 1 of ACME Cor (transitive to Corp)
            ("Widgets Inc",),  # singleton
        ],
        "name string",
    )
    out = {r.name: r for r in resolve_entities(df, "name").collect()}
    assert len(out) == 4
    acme = {"ACME Corp", "ACME Cor", "ACME Co"}
    # one transitive entity, canonical = lexicographic min
    assert {out[n].entity_id for n in acme} == {"ACME Co"}
    assert all(out[n].cluster_size == 3 for n in acme)
    assert out["ACME Co"].is_canonical == 1
    assert out["ACME Corp"].is_canonical == 0
    assert out["Widgets Inc"].entity_id == "Widgets Inc"
    assert out["Widgets Inc"].cluster_size == 1
    assert out["Widgets Inc"].is_canonical == 1


def test_cc_large_hash_node_ids_no_overflow(spark):
    """Convergence checksum must survive 60-bit node ids (the
    resolve_entities id scheme) — BIGINT sums overflow under ANSI."""
    from cdc_poc_spark.operators.clustering import connected_components

    big = 1 << 59
    edges = spark.createDataFrame(
        [(big + i, big + i + 1) for i in range(0, 2000, 2)],
        "src long, dst long",
    )
    cc = connected_components(edges)
    assert cc.count() == 2000


def test_keep_best_longest_wins_with_id_tiebreak(spark):
    """keep_best_per_cluster keeps the LONGEST cluster member; equal
    lengths fall back to the lowest doc_id."""
    from cdc_poc_spark.operators.clustering import keep_best_per_cluster

    # distinct base per cluster: a shingle shared by >4 docs trips the
    # stop-shingle df-cap and would block the pairs entirely
    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    base_b = "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3
    rows = [
        # cluster {0,1,2}: near-dups, 2 is the longest
        (0, base_a + "tail one"),
        (1, base_a + "tail two"),
        (2, base_a + "tail two three"),
        # cluster {10,11}: identical length -> lowest id kept
        (10, base_b + "same length pad"),
        (11, base_b + "same length pad"),
        # singleton: no pair, not in any cluster
        (20, "completely unrelated text with no shared shingles at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.cluster_id: (r.cluster_size, r.keep_doc_id, r.keep_len)
        for r in keep_best_per_cluster(docs, 0.5).collect()
    }
    assert set(got) == {0, 10}
    size0, keep0, len0 = got[0]
    assert (size0, keep0) == (3, 2) and len0 == len(rows[2][1])
    size1, keep1, len1 = got[10]
    assert (size1, keep1) == (2, 10) and len1 == len(rows[3][1])


def test_incremental_components_merge_cases(spark):
    """Constructed merge cases: a batch edge merging two standing
    clusters, a new node attaching to a cluster, and a brand-new isolated
    pair — all must match full CC over the union of edges."""
    from cdc_poc_spark.operators.clustering import (
        connected_components,
        incremental_components,
    )

    old_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "src long, dst long"
    )
    batch = spark.createDataFrame(
        [
            (3, 10),    # merges cluster {1,2,3} with {10,11}
            (21, 30),   # new node 30 joins cluster {20,21}
            (40, 41),   # brand-new isolated pair
        ],
        "src long, dst long",
    )
    standing = connected_components(old_edges)
    got = {
        (r.node, r.cluster_id)
        for r in incremental_components(standing, batch).collect()
    }
    want = {
        (r.node, r.cluster_id)
        for r in connected_components(old_edges.unionAll(batch)).collect()
    }
    assert got == want
    assert (30, 20) in got and (41, 40) in got and (11, 1) in got


def test_cc_driver_property_random_graphs(spark):
    """Property: on arbitrary random graphs, the numpy driver solver, the
    distributed loop, and the pure-python reference agree exactly. Seeded
    exhaustively rather than via hypothesis: each spark round-trip is
    ~seconds, so a fixed battery of adversarial shapes (paths, stars,
    cliques, bridges, self-loops, duplicate/reversed edges, sparse random)
    beats a shrinking search for wall-clock."""
    import random

    rng = random.Random(7)
    cases = []
    # sparse random graphs of varying density
    for n, m in [(30, 10), (40, 40), (25, 60), (60, 30)]:
        cases.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        )
    # long path + disconnected clique + star, with reversed duplicates
    path = [(i, i + 1) for i in range(50)]
    cases.append(path + [(b, a) for a, b in path[::3]])
    cases.append(
        [(100, 100 + i) for i in range(1, 8)]
        + [(200 + i, 200 + j) for i in range(4) for j in range(i + 1, 4)]
        + [(300, 300)]
    )
    for pairs in cases:
        edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
        want = _py_components(pairs)
        drv = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges, strategy="driver").collect()
        }
        dist = {
            r["node"]: r["cluster_id"]
            for r in connected_components(
                edges, strategy="distributed"
            ).collect()
        }
        assert drv == want and dist == want


def test_cc_string_ids_random_graphs_match_reference(spark):
    """The round-8 non-integral path (exact changed-label convergence
    probe instead of the decimal checksum) must agree with the pure
    python reference on random graphs whose nodes are STRINGS — min
    labels then follow lexicographic order, which the zero-padded
    rendering keeps aligned with the integer reference."""
    import random

    rng = random.Random(11)
    for n, m in [(25, 15), (30, 45), (40, 20)]:
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        want = {
            f"n{a:03d}": f"n{b:03d}" for a, b in _py_components(pairs).items()
        }
        edges = spark.createDataFrame(
            [(f"n{a:03d}", f"n{b:03d}") for a, b in pairs], ["src", "dst"]
        )
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges).collect()
        }
        assert got == want

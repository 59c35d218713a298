"""Graph centrality over the k-NN similarity graph: fixed-point PageRank.

Training-data curation increasingly scores documents by how *central* they
are in the corpus similarity graph (graph-based data selection: build the
k-NN graph over embeddings, rank nodes, keep/up-weight the most
representative ones). The reference engine has no graph operator at all —
this extends the similarity family (SURVEY §2 extensions) with the missing
"rank the near-dup graph" step that follows `knn_join` the same way
`dup_clusters` follows the pair generators.

Spark-first formulation: PageRank as iterative relational algebra — each
round is ONE equi-join of the rank table to the edge list (shuffle on the
small rank key, the edge list is hash-partitioned once and reused) plus
ONE groupBy(dst) partial-aggregated sum. Rounds truncate lineage with
localCheckpoint exactly like `connected_components`, so a 100-iteration
cluster run keeps a flat plan.

Determinism design (the part that makes a cross-engine oracle possible):
a floating-point PageRank is partition-order dependent — the per-node sum
of double contributions differs in the last ulp between engines and even
between runs. Ranks here are therefore EXACT fixed-point integers: the
total mass is ``PR_TOTAL`` integer units, the teleport and damping terms
are integer multiply-then-integer-divide (``div`` in Spark, ``//`` in
DuckDB — identical truncation for non-negative operands), and integer sums
are exact and order-independent. Truncation loses a bounded sliver of mass
per round (< 1 unit per in-edge, ~1e-12 of total per edge) — deterministic
and identical in both engines, so the oracle hash-matches bit-for-bit.

Scale posture at 100 TB: the edge list comes from the *blocked* k-NN path
(`knn_join_lsh`), is |V|·k rows — orders of magnitude smaller than the
corpus scanned once to build it — and both per-round shuffles key on node
id. No driver-side state beyond the node count and the convergence-free
fixed iteration count (8 rounds ≈ damping^8 < 0.28 residual, the standard
"ranking stabilizes long before values do" cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_TOTAL = 10**12  # fixed-point mass: 1.0 == 1e12 units
PR_DAMP_PCT = 85  # damping factor in percent (0.85)
PR_ITERATIONS = 8
PR_TOPK = 50


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = PR_ITERATIONS,
    damp_pct: int = PR_DAMP_PCT,
    total: int = PR_TOTAL,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node_id, rank_units) for every node of the directed edge list —
    ``rank_units`` is the node's PageRank mass in integer ``total``-ths.

    Recurrence (all integer, both engines):

        r_0(v)     = total div N
        r_{t+1}(v) = (total * (100 - damp)) div (100 * N)
                     + sum over in-edges (u, v) of
                           (r_t(u) * damp) div (100 * outdeg(u))

    Nodes with no in-edges keep exactly the teleport term (left join +
    coalesce 0). The edge list is materialized once (localCheckpoint) so
    the possibly-expensive upstream k-NN lineage never re-executes inside
    the loop.

    ``checkpoint_every``: 0 (default) chains all rounds into ONE Catalyst
    plan — for the standard 8-round run the whole iteration is a single
    job and AQE coalesces the tiny rank shuffles (measured 0.8 s vs 6.5 s
    with an eager per-round checkpoint at sf0.1: eight job submissions of
    pure overhead). For long cluster runs (tens of rounds) pass a period
    (e.g. 5) so lineage is truncated before the plan tree gets deep enough
    to hurt the optimizer or a recovery recompute.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # attach out-degree once and MATERIALIZE the joined frame: without the
    # pin the unrolled loop re-plans (and re-executes) the degree
    # aggregate + join every round. localCheckpoint rather than persist on
    # purpose — the checkpoint TRUNCATES the lineage, so the 8-round
    # unrolled plan carries 8 references to a flat RDD scan instead of 8
    # copies of the whole upstream k-NN pipeline (a persist keeps the
    # partitioning visible but re-analyzes that lineage per round; it
    # measured 1.5s SLOWER here at sf0.1).
    e_deg = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("id", F.lit(0).cast("long").alias("rank_units"))
    teleport = (total * (100 - damp_pct)) // (100 * n_nodes)
    ranks = nodes.select("id", F.lit(total // n_nodes).cast("long").alias("r"))
    for it in range(1, int(iterations) + 1):
        # SHUFFLE_HASH on the rank/contrib side: the persisted edge frame
        # already sits in the join-key layout, so the round join moves only
        # the narrow (id, r) rows and builds the per-partition hash from
        # them — no sort of the edge side, no re-shuffle of the edges, and
        # no broadcast of a table that is |V|-sized at cluster scale.
        contribs = (
            e_deg.join(ranks.hint("shuffle_hash"), e_deg["src"] == ranks["id"])
            .select(
                F.col("dst"),
                F.expr(f"(r * {int(damp_pct)}) div (100 * outdeg)").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = nodes.join(
            contribs.hint("shuffle_hash"), nodes["id"] == contribs["dst"], "left"
        ).select(
            "id",
            (
                F.lit(teleport).cast("long")
                + F.coalesce(F.col("in_mass"), F.lit(0)).cast("long")
            ).alias("r"),
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select(F.col("id").alias("node_id"), F.col("r").alias("rank_units"))


HITS_SCALE = 10**6  # L-infinity normalized scores live in [0, SCALE]
HITS_ROUNDS = 4
HITS_TOPK = 20


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = HITS_ROUNDS,
    scale: int = HITS_SCALE,
    topk: int = HITS_TOPK,
) -> DataFrame:
    """Kleinberg HITS hubs & authorities over a directed (bipartite or not)
    edge list — (side in {'hub','auth'}, node_id, score, rnk): the top-k of
    each side, score in exact integer ``scale``-ths of the side's maximum.

    Determinism design: the classical algorithm normalizes each round by a
    float L2 norm (partition-order dependent). This uses L-infinity
    normalization instead — score * scale div max(score) — which the HITS
    convergence theory equally supports (normalization only fixes the
    scale; the principal-eigenvector direction is unchanged) and which
    keeps every value an exact integer <= ``scale``: sums are
    order-independent, the one global max per half-round is a single-row
    broadcast, and products never exceed scale * in-degree, far inside
    int64.

    Plan shape per round: two hash aggregates (groupBy dst for the
    authority sum, groupBy src for the hub sum), each followed by a 1-row
    max broadcast-crossjoin for the rescale. The edge list is materialized
    once; all `rounds` rounds compose into ONE Catalyst job."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    hubs = e.select("src").distinct().select(
        F.col("src").alias("id"), F.lit(int(scale)).cast("long").alias("score")
    )

    def _norm(scored: DataFrame) -> DataFrame:
        # the raw frame is referenced TWICE (max + rescale): materialize it
        # first, or each half-round doubles the unresolved plan and the
        # 4-round loop becomes a 2^8 lineage blowup that stalls the optimizer
        scored = scored.localCheckpoint()
        mx = scored.agg(F.max("raw").alias("mx"))
        return scored.crossJoin(F.broadcast(mx)).select(
            "id",
            F.expr(f"(raw * {int(scale)}) div mx").cast("long").alias("score"),
        )

    auths = None
    for _ in range(int(rounds)):
        auths = _norm(
            e.join(hubs, e["src"] == hubs["id"])
            .groupBy("dst")
            .agg(F.sum("score").alias("raw"))
            .select(F.col("dst").alias("id"), "raw")
        )
        hubs = _norm(
            e.join(auths, e["dst"] == auths["id"])
            .groupBy("src")
            .agg(F.sum("score").alias("raw"))
            .select(F.col("src").alias("id"), "raw")
        )

    def _top(df: DataFrame, side: str) -> DataFrame:
        # distributed TakeOrderedAndProject first; the row_number window
        # then runs over only `topk` rows (no global single-partition sort)
        w = Window.orderBy(F.desc("score"), F.asc("id"))
        return (
            df.orderBy(F.desc("score"), F.asc("id"))
            .limit(int(topk))
            .withColumn("rnk", F.row_number().over(w))
            .select(
                F.lit(side).alias("side"),
                F.col("id").alias("node_id"),
                "score",
                F.col("rnk").cast("long").alias("rnk"),
            )
        )

    return _top(hubs, "hub").unionAll(_top(auths, "auth"))


def knn_pagerank(
    embeddings: DataFrame,
    k: int | None = None,
    iterations: int = PR_ITERATIONS,
    topk: int = PR_TOPK,
    blocked: bool = True,
) -> DataFrame:
    """Top-``topk`` most central vectors of the k-NN cosine graph — the
    data-selection score ("how representative is this embedding of the
    corpus"). ``rank_ppm`` is the rank as integer parts-per-million of
    total mass (pure integer rescale — no float division in the result).

    ``blocked=True`` (default) builds edges with the LSH-bucketed k-NN
    join — the sub-quadratic path that is the ONLY option at 100 TB, and
    3× faster already at sf0.1; the ranked graph is then exactly the
    blocked graph the rest of the similarity family operates on.
    ``blocked=False`` ranks the exact all-pairs k-NN graph (the recall-1
    baseline, quadratic edge generation)."""
    from .similarity import KNN_K, knn_join, knn_join_lsh

    kk = KNN_K if k is None else k
    join_fn = knn_join_lsh if blocked else knn_join
    edges = join_fn(embeddings, kk).select("src_id", "nbr_id")
    ranks = pagerank(edges, src="src_id", dst="nbr_id", iterations=iterations)
    return (
        ranks.orderBy(F.desc("rank_units"), F.asc("node_id"))
        .limit(int(topk))
        .select(
            F.col("node_id").alias("vec_id"),
            "rank_units",
            F.expr(f"(rank_units * 1000000) div {PR_TOTAL}").alias("rank_ppm"),
        )
    )


LPA_ROUNDS = 4


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = LPA_ROUNDS,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007, Phys. Rev. E 76) over an undirected edge list — the
    community structure of the similarity graph, where connected
    components only give its connectivity (CC merges everything touching;
    LPA splits dense regions joined by thin bridges).

    Determinism design: the classic algorithm visits nodes in RANDOM order
    with asynchronous updates and random tie-breaks — unreproducible
    across engines by construction. This variant is fully deterministic:
    labels start as node ids, every round ALL nodes simultaneously adopt
    the most frequent label among their neighbours with ties broken
    toward the smallest label, and the round count is fixed (synchronous
    LPA can oscillate on bipartite structures, so the contract is "the
    label state after exactly `rounds` rounds", which both engines
    reproduce bit-for-bit; integer counts, no floats anywhere).

    Plan shape per round: one join of the label table to the symmetrized
    edge list (keyed on node id) + one (node, label) count aggregate + a
    per-node argmax window over neighbour-count rows (|V|·avg-degree
    rows, never the corpus). Edge list materialized once.

    Output: (node_id, community, community_size) for every node with at
    least one edge."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = (
        fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = e.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("lbl")
    )
    for _ in range(int(rounds)):
        votes = (
            e.join(labels, e["dst"] == labels["id"])
            .select(F.col("src").alias("id"), "lbl")
            .groupBy("id", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax as a lexicographic struct MIN — (-cnt, lbl) orders by
        # count desc then label asc, exactly the window's (cnt DESC, lbl
        # ASC) row_number()=1 rule — so each round is two hash aggregates
        # with map-side partials instead of an exchange + full sort +
        # filter over the |V|·degree vote rows (guide §2.3: aggregate
        # before you shuffle; the sort was the round's dominant cost at
        # scale). -cnt cannot overflow: cnt >= 1.
        labels = (
            votes.groupBy("id")
            .agg(F.min(F.struct((-F.col("cnt")).alias("_nc"), F.col("lbl"))).alias("_m"))
            .select("id", F.col("_m.lbl").alias("lbl"))
        )
    sz = Window.partitionBy("lbl")
    return labels.select(
        F.col("id").alias("node_id"),
        F.col("lbl").alias("community"),
        F.count(F.lit(1)).over(sz).alias("community_size"),
    )


def knn_communities(
    embeddings: DataFrame, k: int | None = None, rounds: int = LPA_ROUNDS
) -> DataFrame:
    """Communities of the LSH-blocked k-NN cosine graph — the
    topic-cluster discovery step of graph-based curation (diversity
    sampling / per-community quotas operate on exactly this table). Same
    blocked edge construction as :func:`knn_pagerank`."""
    from .similarity import KNN_K, knn_join_lsh

    kk = KNN_K if k is None else k
    edges = knn_join_lsh(embeddings, kk).select("src_id", "nbr_id")
    return label_propagation(edges, src="src_id", dst="nbr_id", rounds=rounds)


DIVERSITY_CAP = 3
DIVERSITY_SEED = "diversity"


def diversity_sample(
    embeddings: DataFrame,
    cap: int = DIVERSITY_CAP,
    k: int | None = None,
    rounds: int = LPA_ROUNDS,
    seed: str = DIVERSITY_SEED,
) -> DataFrame:
    """Per-community diversity quota over the k-NN similarity graph: keep
    at most ``cap`` members of every :func:`knn_communities` community,
    chosen by a seeded-hash rank (a deterministic uniform draw,
    reproducible across engines and reruns) — the graph-side counterpart
    of per-domain capping: where `domain_cap` bounds a metadata facet,
    this bounds CONTENT redundancy (a topic crawled from 50 mirrors is one
    community here regardless of source labels).

    Same scale shape as `domain_cap` on top of the community table: one
    shuffle on the community key, local per-community sort; hot-community
    mitigation is the identical hash-threshold pre-prune.

    Output: (vec_id, community, rank_in_community)."""
    from ..functions.hashing import md5_long_seeded

    comm = knn_communities(embeddings, k, rounds)
    h = md5_long_seeded(F.col("node_id"), seed)
    w = Window.partitionBy("community").orderBy(F.asc("_h"), F.asc("node_id"))
    return (
        comm.select("node_id", "community", h.alias("_h"))
        .withColumn("rank_in_community", F.row_number().over(w))
        .filter(F.col("rank_in_community") <= int(cap))
        .select(
            F.col("node_id").alias("vec_id"),
            "community",
            F.col("rank_in_community").cast("long").alias("rank_in_community"),
        )
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected edge list (Watts-Strogatz coefficient — the local-density
    signal that separates tight near-dup communities from stringy
    accidental neighbourhoods in the similarity graph).

    The standard distributed formulation (Suri & Vassilvitskii 2011):
    edges canonicalize to a < b, wedges come from ONE self-join on the
    middle vertex with a < b < c (each triangle counted exactly once),
    and a second join closes them against the edge set. All joins key on
    node ids; nothing is quadratic in the graph — wedge volume is
    sum-of-degrees², the quantity the hot-bucket caps upstream already
    bound.

    Output: (node_id, degree, n_triangles, clustering_coeff) — the
    coefficient is 2T / (deg * (deg - 1)), NULL for degree < 2,
    double-rounded 6dp identically in both engines."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    canon = (
        fwd.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        canon.select(F.col("a").alias("node_id"))
        .unionAll(canon.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # wedges a < b < c around middle vertex b
    e1 = canon.select(F.col("a"), F.col("b"))
    e2 = canon.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").filter(F.col("a") < F.col("c"))
    closing = canon.select(F.col("a"), F.col("b").alias("c"))
    tris = wedges.join(closing, ["a", "c"]).select("a", "b", "c")
    per_node = (
        tris.select(F.col("a").alias("node_id"))
        .unionAll(tris.select(F.col("b").alias("node_id")))
        .unionAll(tris.select(F.col("c").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    d = F.col("degree").cast("double")
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0 * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
            / (d * (d - 1.0)),
            6,
        ),
    )
    return deg.join(per_node, "node_id", "left").select(
        "node_id",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
        coeff.alias("clustering_coeff"),
    )


def knn_triangles(embeddings: DataFrame, k: int | None = None) -> DataFrame:
    """Triangle/coefficient profile of the LSH-blocked k-NN cosine graph
    — same edge construction as :func:`knn_pagerank` and
    :func:`knn_communities`."""
    from .similarity import KNN_K, knn_join_lsh

    kk = KNN_K if k is None else k
    edges = knn_join_lsh(embeddings, kk).select("src_id", "nbr_id")
    return triangle_counts(edges, src="src_id", dst="nbr_id")

"""Spatial distance self-join — grid-bucketed, the classic distributed
spatial join (the same blocked shape as the LSH/IVF candidate generators,
but over 2-D geometry instead of hash space).

Not present in the reference (no geometry anywhere); included as an
M6-class extension: event streams routinely carry coordinates (the
reference generator writes a ``coordinates:{x,y}`` payload field,
reference data-generator/generator.py:138-161), and "which events happened
within distance d of each other" is the canonical proximity query.

Scale shape: each point lands in ONE grid cell of side ``eps``; the LEFT
side of the candidate join is exploded to its 3x3 cell neighbourhood (a
fixed 9-way flatMap, not a data-sized blowup), so every true pair within
``eps`` shares a (cell_x, cell_y) key with certainty — candidates are
cell-blocked, never all-pairs, and the exact euclidean check verifies.
Degenerate-density cells are the spatial analog of hot LSH buckets; the
``cell_cap`` guard drops cells holding more points than the cap (same
device as EMB_LSH_BUCKET_CAP, documented recall trade).

Determinism: coordinates are doubles, but both engines compute the same
IEEE expressions in the same order (squared distance, no sqrt in the
filter), so the pair set and rounded distances hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long_seeded

SPATIAL_EPS = 1.5
SPATIAL_CELL_CAP = 1000
# synthesized coordinate space: uniform in [0, 1000) x [0, 1000)
COORD_MOD = 1_000_000
COORD_SCALE = 1000.0


def synthesize_points(events: DataFrame) -> DataFrame:
    """Deterministic (point_id, x, y) from the event stream — the stand-in
    for the reference generator's ``coordinates:{x,y}`` payload field
    (the driver's events.parquet carries only the FK payload). Seeded
    60-bit hashes scaled to [0, 1000): integer-derived doubles, identical
    in both engines."""
    x = (md5_long_seeded(F.col("event_id"), "px") % COORD_MOD) / F.lit(COORD_SCALE)
    y = (md5_long_seeded(F.col("event_id"), "py") % COORD_MOD) / F.lit(COORD_SCALE)
    return events.select(
        F.col("event_id").alias("point_id"), x.alias("x"), y.alias("y")
    )


def grid_distance_join(
    points: DataFrame,
    eps: float = SPATIAL_EPS,
    cell_cap: int | None = SPATIAL_CELL_CAP,
) -> DataFrame:
    """All point pairs within euclidean distance ``eps``: grid cells of
    side eps, left side exploded to the 3x3 neighbourhood, exact
    squared-distance verification. Output (id_a, id_b, dist) with
    dist rounded to 6dp (the only sqrt, applied after the exact filter).
    """
    cx = F.floor(F.col("x") / F.lit(float(eps))).cast("long")
    cy = F.floor(F.col("y") / F.lit(float(eps))).cast("long")
    # the cell projection feeds THREE scans (hot-cell counts, join side a,
    # join side b); its lineage re-derives the coordinates per scan — for
    # the synthesized-point callers that is two md5 hashes per point per
    # scan. Persist the narrow (id, x, y, cell) rows once; the session
    # cache-hygiene prologue reclaims them after the query's action.
    # (A spread() of the single-split scan was A/B'd here and measured
    # neutral — the join exchanges already distribute the heavy stages.)
    cells = points.select(
        "point_id", "x", "y", cx.alias("cx"), cy.alias("cy")
    ).persist()
    if cell_cap is not None:
        hot = (
            cells.groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > int(cell_cap))
            .select("cx", "cy")
        )
        cells = cells.join(F.broadcast(hot), ["cx", "cy"], "left_anti")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = cells.select(
        F.col("point_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = cells.select(
        F.col("point_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(float(eps)) * F.lit(float(eps)))
        .select("id_a", "id_b", F.round(F.sqrt(d2), 6).alias("dist"))
        # no distinct needed: b sits in exactly one cell and a probes each
        # neighbour key once, so a qualifying pair matches exactly once
    )


DBSCAN_MIN_PTS = 4  # |N_eps(p)| including p itself, the classic definition
# density-adaptive radius target: mean eps-degree lambda = 2.5 — enough
# density for a real core/border/noise split, but SUBCRITICAL for 2-D
# continuum percolation (critical mean degree ~4.5): components stay
# small-diameter at EVERY corpus size. A fixed eps on uniform points
# goes supercritical as n grows — one giant ~L/eps-hop component whose
# diameter defeats any relational CC (measured: the sf0.1 graph at fixed
# eps=5 has mean degree ~8 and needs hundreds of label rounds), and
# "one blob" is a meaningless clustering anyway.
DBSCAN_TARGET_DEG = 2.5
COORD_AREA = 1000.0 * 1000.0


def adaptive_eps(n: int, target_deg: float = DBSCAN_TARGET_DEG) -> float:
    """eps such that the expected eps-degree over n uniform points in the
    synthesized coordinate box is ``target_deg`` — the exact same IEEE
    expression the SQL oracle evaluates (verified bit-identical)."""
    import math

    return math.sqrt(target_deg * COORD_AREA / (math.pi * n))


def dbscan(
    points: DataFrame,
    eps: float | None = None,
    min_pts: int = DBSCAN_MIN_PTS,
    cell_cap: int | None = SPATIAL_CELL_CAP,
) -> DataFrame:
    """Deterministic DBSCAN (Ester et al. 1996) over the grid-blocked
    eps-neighbour graph: CORE points (>= min_pts neighbours counting
    themselves) cluster by connected components of the core-core edge
    subgraph; BORDER points (non-core with a core neighbour) attach to
    the smallest cluster id among their core neighbours — the one
    under-specified choice in classic DBSCAN, pinned deterministically so
    two engines (and two runs) agree; noise points are excluded.

    Plan shape: one grid distance join (cell-blocked), one degree
    aggregate, CC over the core subgraph (log-diameter pointer jumping),
    one border attachment join. Nothing touches all-pairs.

    ``eps=None`` (default) derives the density-adaptive radius from the
    point count (:func:`adaptive_eps`) — constant expected degree at any
    scale, so component diameters stay CC-friendly (see the
    DBSCAN_TARGET_DEG note).

    Output: (point_id, cluster_id, role in {'core','border'})."""
    from .clustering import connected_components

    if eps is None:
        eps = adaptive_eps(points.count())
    pairs = grid_distance_join(points, eps, cell_cap).select("id_a", "id_b")
    # symmetrize with ONE pass over the pair join (explode both directions
    # per row) instead of a self-union whose two branches each re-run the
    # grid join when the persist materializes
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a"), F.col("id_b")),
                    F.struct(
                        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
                    ),
                )
            ).alias("e")
        )
        .select(F.col("e.id_a").alias("id_a"), F.col("e.id_b").alias("id_b"))
        .persist()
    )
    deg = sym.groupBy("id_a").agg(F.count(F.lit(1)).alias("_deg"))
    core = deg.filter(F.col("_deg") >= int(min_pts) - 1).select(
        F.col("id_a").alias("pid")
    )
    # feed CC ONE-DIRECTIONAL core pairs (round 10): CC symmetrizes and
    # self-loops internally, so handing it the already-symmetrized frame
    # doubled both core-membership joins and CC's internal distinct for
    # the identical undirected graph; the persisted sym filters to the
    # canonical direction for free
    core_edges = (
        sym.filter(F.col("id_a") < F.col("id_b"))
        .join(core.select(F.col("pid").alias("id_a")), "id_a")
        .join(core.select(F.col("pid").alias("id_b")), "id_b")
        .select("id_a", "id_b")
    )
    cc = connected_components(core_edges, src="id_a", dst="id_b")
    # an isolated core point (no core neighbour) forms its own cluster
    core_clusters = (
        core.join(cc, core["pid"] == cc["node"], "left")
        .select(
            "pid", F.coalesce(F.col("cluster_id"), F.col("pid")).alias("cluster_id")
        )
    )
    border = (
        sym.join(core.select(F.col("pid").alias("id_a")), "id_a", "left_anti")
        .join(
            core_clusters.select(
                F.col("pid").alias("id_b"), F.col("cluster_id")
            ),
            "id_b",
        )
        .groupBy("id_a")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .select(F.col("id_a").alias("pid"), "cluster_id")
    )
    # sym stays persisted through result execution (border reads it after
    # this function returns); the registry's _fresh prologue / bench's
    # free_caches owns the release, same contract as the dedup indexes
    return core_clusters.select(
        F.col("pid").alias("point_id"), "cluster_id", F.lit("core").alias("role")
    ).unionAll(
        border.select(
            F.col("pid").alias("point_id"),
            "cluster_id",
            F.lit("border").alias("role"),
        )
    )

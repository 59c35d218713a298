"""Skew-aware equi-join: salting for hot keys (SURVEY §7.5.7).

The reference workload concentrates virtually all events on ~15-100 content
keys (reference generator.py:118 draws content uniformly from the 15-row
seed dim), so at 100 TB a shuffle join on content_id puts entire key
populations on single reducers. The engine's first line of defense is the
broadcast join (the dimension is tiny) and the second is AQE skew-join
splitting (spark.sql.adaptive.skewJoin, on in session.py); this operator is
the third — explicit salting for large⋈large joins where the small-enough
side still fits replication but not broadcast, or where a deterministic
partition fan-out is wanted regardless of runtime stats:

  large side:  salt = pmod(xxhash64(all columns), B)   (content-derived —
               stable under task retry, unlike rand())
  small side:  replicated B× via explode(sequence(0, B-1))
  join on (key, salt) — each hot key now spreads over B reducers.

Results are identical to the plain equi-join (verified by oracle + test);
only the physical distribution changes. Cost: B× duplication of the small
side, so pick B ≈ (hot-key rows / target partition rows), typically 8-64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16

_SALT = "_skew_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    force_shuffle: bool = True,
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on``, salting the large side
    into ``salt_buckets`` sub-keys and replicating the small side to match.

    Supported ``how``: inner / left (left = keep unmatched large rows).
    Output columns: large columns then small's non-key columns (names must
    not collide). ``force_shuffle`` applies a shuffle_hash hint so the
    planner can't broadcast the replicated side — salting a broadcast join
    would be pure overhead; if the small side fits broadcast, just
    broadcast and skip salting entirely.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    collisions = (set(large.columns) & set(small.columns)) - {on}
    if collisions:
        raise ValueError(f"column collision: {sorted(collisions)}")
    b = int(salt_buckets)
    salted_large = large.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(b))
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(b - 1)).cast("array<long>"))
    )
    if force_shuffle:
        replicated_small = replicated_small.hint("shuffle_hash")
    small_vals = [c for c in small.columns if c != on]
    joined = salted_large.join(replicated_small, on=[on, _SALT], how=how)
    return joined.select(*large.columns, *small_vals)

"""DuckDB oracle SQL for every registry query — the driver contract's
``oracle_sql()`` side.

Deliberately formulated *differently* from the Spark plans where a different
formulation exists (e.g. ``row_number() = 1`` windows instead of ``max_by``)
so the comparison is a genuine differential test, not the same code twice
(SURVEY §5 strategy item 1).
"""

from __future__ import annotations

from ..functions.hashing import (
    md5_long_seeded_sql,
    md5_long_sql,
    minhash_constants,
    rolling_fingerprint_sql,
)
from ..operators.dedup import (
    MINHASH_BANDS,
    MAX_SHINGLE_DF_FRAC,
    MINHASH_HASHES,
    SHINGLE_K,
    SIMHASH_BITS,
)
from ..operators.sampling import SPLIT_SEED, TRAIN_PCT, VAL_PCT
from ..operators.similarity import KNN_K, hyperplane_weights
from ..operators.text_analysis import LANG_MARKERS, STOPWORDS
from .cdc_mapping import EVENTS_CTE, VALID_FILTER_SQL, with_enriched, with_versions
from .registry import (
    CORRUPT_MOD,
    COSINE_TAU,
    DELETE_MOD,
    EXCESS_SHIP_QTY,
    JACCARD_THRESHOLD,
    LARGE_ORDER_QTY,
    ORDER_PRIORITY_LATE_DAYS,
    SMALL_QTY_BRAND,
    SMALL_QTY_FRACTION,
    PRICE_BAND_WIDTH,
    PRICE_BANDS,
    SIM_QUERY_VEC_ID,
    SIM_TOPK,
    STRAT_RATE_EN,
    STRAT_RATE_OTHER,
    STRAT_SEED,
)
from .registry import EVENT_TYPES as REG_EVENT_TYPES

# ---------------------------------------------------------- shared fragments

TOKS_CTE = (
    "toks AS (SELECT doc_id, lang, text, "
    "list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents)"
)

# distinct k-token shingles; empty list when < k tokens (mirrors operators.dedup.shingles)
_GRAM = " || ' ' || ".join(f"toks[i+{j}]" for j in range(SHINGLE_K))
SHINGLES_CTE = (
    f"sh AS (SELECT doc_id, CASE WHEN len(toks) >= {SHINGLE_K} THEN "
    f"list_distinct(list_transform(range(1, len(toks) - {SHINGLE_K - 2}), "
    f"i -> {_GRAM})) ELSE [] END AS shingles FROM toks)"
)
EXPLODED_CTE = "ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh)"

# uncapped pair Jaccard — used by the MinHash-LSH oracles, whose verify
# step is TRUE Jaccard over the full shingle sets (LSH candidate cost is
# bounded by banding, so no df cap applies there)
_JACCARD_PAIRS_RAW = """
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM ex GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT doc_a, doc_b, n_common,
           n_common::DOUBLE / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
)"""

# stop-shingle document-frequency cap — MUST stay identical to the Spark
# operator (operators.dedup.MAX_SHINGLE_DF_FRAC): Jaccard is computed over
# the df-filtered shingle sets on both engines. Used by every oracle whose
# Spark twin goes through the shingle SELF-JOIN (ngram_jaccard_pairs).
_JACCARD_PAIRS = f"""
hot AS (
    SELECT shingle FROM ex GROUP BY shingle
    HAVING count(*) > (SELECT count(*) FROM documents) * {MAX_SHINGLE_DF_FRAC}
),
exf AS (
    SELECT ex.doc_id, ex.shingle FROM ex
    ANTI JOIN hot ON ex.shingle = hot.shingle
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM exf GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT doc_a, doc_b, n_common,
           n_common::DOUBLE / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
)"""


def dot_sql(a: str, b: str) -> str:
    """Sequential left-fold double dot product — bit-identical to the Spark
    zip_with+aggregate formulation in operators.similarity.dot."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"

_LATEST_STATS = f"""
SELECT content_id,
       total_events,
       latest_engagement_pct,
       last_event_type,
       last_device,
       content_type,
       content_title,
       last_updated
FROM (
    SELECT content_id,
           engagement_pct AS latest_engagement_pct,
           event_type AS last_event_type,
           device AS last_device,
           content_type,
           content_title,
           count(*) OVER (PARTITION BY content_id) AS total_events,
           max(event_ts) OVER (PARTITION BY content_id) AS last_updated,
           row_number() OVER (
               PARTITION BY content_id
               ORDER BY event_ts DESC, event_id DESC
           ) AS rn
    FROM enriched
    WHERE {VALID_FILTER_SQL}
)
WHERE rn = 1"""


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["cdc_enriched"] = with_enriched("SELECT * FROM enriched")

    sqls["cdc_enriched_valid"] = with_enriched(
        f"SELECT * FROM enriched WHERE {VALID_FILTER_SQL}"
    )

    sqls["cdc_high_engagement"] = with_enriched(
        "SELECT * FROM enriched WHERE engagement_pct >= 50"
    )

    sqls["cdc_enrichment_misses"] = with_enriched(
        """
        SELECT e.* FROM engagement_events e
        WHERE NOT EXISTS (
            SELECT 1 FROM content c WHERE c.id = e.content_id AND c.id < 90
        )"""
    )

    sqls["cdc_leaderboard"] = with_enriched(
        f"""
        SELECT content_id, content_type, content_title, score
        FROM (
            SELECT content_id, content_type, content_title,
                   engagement_pct AS score,
                   row_number() OVER (
                       PARTITION BY content_id
                       ORDER BY event_ts DESC, event_id DESC
                   ) AS rn
            FROM enriched
            WHERE {VALID_FILTER_SQL}
        )
        WHERE rn = 1
        ORDER BY score DESC, content_id
        LIMIT 100"""
    )

    sqls["cdc_content_stats"] = with_enriched(_LATEST_STATS)

    from .registry import DELETE_MOD

    # the streaming leaderboard twin: identical SQL minus the wire-injected
    # deletes (the parser drops after=null records)
    sqls["stream_leaderboard_native"] = with_enriched(
        f"""
        SELECT content_id, content_type, content_title, score
        FROM (
            SELECT content_id, content_type, content_title,
                   engagement_pct AS score,
                   row_number() OVER (
                       PARTITION BY content_id
                       ORDER BY event_ts DESC, event_id DESC
                   ) AS rn
            FROM enriched
            WHERE {VALID_FILTER_SQL} AND event_id % {DELETE_MOD} <> 0
        )
        WHERE rn = 1
        ORDER BY score DESC, content_id
        LIMIT 100"""
    )

    from .registry import APPLY_KEY_MOD, DELETE_MOD as _DM

    sqls["cdc_apply_changelog"] = with_enriched(
        f"""
        SELECT row_key, id, content_id, user_id, event_type, event_ts,
               duration_ms, device, op
        FROM (
            SELECT id % {APPLY_KEY_MOD} AS row_key,
                   id, content_id, user_id, event_type, event_ts,
                   duration_ms, device,
                   CASE WHEN id % {_DM} = 0 THEN 'd'
                        WHEN id % 3 = 0 THEN 'u'
                        ELSE 'c' END AS op,
                   row_number() OVER (
                       PARTITION BY id % {APPLY_KEY_MOD}
                       ORDER BY event_ts DESC, id DESC
                   ) AS rn
            FROM engagement_events
        )
        WHERE rn = 1 AND op <> 'd'"""
    )

    # full recompute over the whole changelog (sequence = id) — the
    # incremental merge must be indistinguishable from this; the state/delta
    # split point is engine-side only and must not appear here
    sqls["cdc_incremental_agg"] = with_enriched(
        f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(coalesce(sum(duration_ms), 0) AS BIGINT) AS sum_duration_ms
        FROM (
            SELECT event_type, duration_ms,
                   CASE WHEN id % {_DM} = 0 THEN 'd'
                        WHEN id % 3 = 0 THEN 'u'
                        ELSE 'c' END AS op,
                   row_number() OVER (
                       PARTITION BY id % {APPLY_KEY_MOD}
                       ORDER BY id DESC
                   ) AS rn
            FROM engagement_events
        )
        WHERE rn = 1 AND op <> 'd'
        GROUP BY event_type
        HAVING count(*) > 0"""
    )

    sqls["cdc_user_engagement"] = with_enriched(
        f"""
        SELECT user_id, content_id, engagement_pct, last_updated
        FROM (
            SELECT user_id, content_id, engagement_pct,
                   max(event_ts) OVER (PARTITION BY user_id, content_id) AS last_updated,
                   row_number() OVER (
                       PARTITION BY user_id, content_id
                       ORDER BY event_ts DESC, event_id DESC
                   ) AS rn
            FROM enriched
            WHERE {VALID_FILTER_SQL}
        )
        WHERE rn = 1"""
    )

    sqls["cdc_minute_window"] = with_enriched(
        f"""
        SELECT date_trunc('minute', event_ts) AS window_start,
               content_id,
               count(*) AS n_events,
               max(engagement_pct) AS max_pct,
               min(engagement_pct) AS min_pct,
               CAST(sum(CAST(engagement_pct AS DECIMAL(18,2))) AS DOUBLE) AS sum_pct
        FROM enriched
        WHERE {VALID_FILTER_SQL}
        GROUP BY 1, 2"""
    )

    # the native streaming minute-window twin: same enriched chain, minus
    # the wire-injected deletes, projected to the streaming output columns
    sqls["stream_minute_window_native"] = with_enriched(
        f"""
        SELECT date_trunc('minute', event_ts) AS window_start,
               content_id,
               count(*) AS n_events,
               max(engagement_pct) AS max_pct
        FROM enriched
        WHERE {VALID_FILTER_SQL} AND event_id % {_DM} <> 0
        GROUP BY 1, 2"""
    )

    sqls["cdc_parse_envelope"] = with_enriched(
        f"SELECT * FROM engagement_events WHERE id % {DELETE_MOD} <> 0"
    )

    sqls["cdc_parse_unwrapped"] = sqls["cdc_parse_envelope"]

    _ASOF_SQL = with_versions(
        """
        SELECT e.id, e.content_id, e.event_ts,
               v.version_ts, v.version_title, v.version_length_seconds
        FROM engagement_events e
        ASOF JOIN versions v
          ON e.content_id = v.content_id AND e.event_ts >= v.version_ts"""
    )
    sqls["cdc_asof_enrich"] = _ASOF_SQL
    # the stateful streaming twin must produce byte-identical results — the
    # strongest check a custom stateful operator can get
    sqls["stream_asof_stateful"] = _ASOF_SQL

    sqls["cdc_dead_letter"] = f"""
        SELECT (event_id % {CORRUPT_MOD} = 0) AS is_corrupt, count(*) AS n
        FROM events
        GROUP BY 1"""

    _dec = "DECIMAL(12,2)"
    _disc_price = f"CAST(l_extendedprice AS {_dec}) * (1 - CAST(l_discount AS {_dec}))"
    sqls["wh_pricing_summary"] = f"""
        SELECT l_returnflag,
               l_linestatus,
               CAST(sum(CAST(l_quantity AS {_dec})) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS {_dec})) AS DOUBLE) AS sum_base_price,
               CAST(sum({_disc_price}) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST({_disc_price} AS DECIMAL(18,4))
                        * (1 + CAST(l_tax AS {_dec}))) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS {_dec})) AS DOUBLE) / count(*) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS {_dec})) AS DOUBLE) / count(*) AS avg_price,
               CAST(sum(CAST(l_discount AS {_dec})) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus"""

    sqls["wh_top_orders"] = f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(sum({_disc_price}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10"""

    sqls["wh_rollup"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n,
               GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

    sqls["wh_cube"] = """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               GROUPING(o_orderstatus, o_orderpriority) AS gid
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)"""

    sqls["wh_regional_revenue"] = f"""
        SELECT n_name,
               CAST(sum({_disc_price}) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name"""

    sqls["wh_semi_anti_subqueries"] = """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')"""

    sqls["wh_outer_join"] = """
        SELECT c_custkey, c_name, o_custkey, n_urgent
        FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
        FULL OUTER JOIN (
            SELECT o_custkey, count(*) AS n_urgent
            FROM orders WHERE o_orderpriority = '1-URGENT'
            GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey"""

    sqls["wh_grouping_sets"] = """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               GROUPING(o_orderstatus, o_orderpriority) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""

    sqls["wh_distinct_agg"] = """
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag"""

    # wh_approx_users: HLL sketches are engine-specific -> no oracle
    # (rows-only check); tests/test_wh_sql.py bounds the estimation error.

    sqls["wh_set_ops"] = """
        ((SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         UNION
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'"""

    sqls["wh_window_frames"] = """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS moving3_sum,
               CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS DOUBLE) AS prev_price,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS order_rank
        FROM orders"""

    sqls["wh_skew_salted_join"] = with_enriched(
        """
        SELECT e.id, e.content_id, e.event_ts,
               c.title AS content_title, c.length_seconds
        FROM engagement_events e
        JOIN content c ON e.content_id = c.id"""
    )

    # ONE shared gap-and-islands CTE chain for BOTH session oracles (batch
    # wh_sessions and the streaming session_window twin) so they cannot
    # drift. Determinism/dtype contract, mirrored by operators/sessions.py:
    #  - base rows CAST ts to micros TIMESTAMP and drop NULL ts, so the
    #    oracle is stable whether the driver wrote MICROS or NANOS parquet
    #    (Spark floors NANOS->MICROS in the loader; DuckDB must match);
    #  - windows ORDER BY ts, event_id — a full tie-break, engine-stable;
    #  - session_seq is CAST(... AS BIGINT): DuckDB's sum(INTEGER) is
    #    HUGEINT, which the pandas fetch path coerces to float64 ("9.0"),
    #    breaking the value hash against Spark's bigint ("9").
    _sessions_cte = """
        WITH ev AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
            FROM events WHERE ts IS NOT NULL
        ),
        flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
        ),
        seq AS (
            SELECT user_id, ts,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
            FROM flagged
        )"""

    sqls["wh_sessions"] = _sessions_cte + """
        SELECT user_id, session_seq,
               min(ts) AS session_start,
               max(ts) AS session_end,
               count(*) AS n_events
        FROM seq
        GROUP BY user_id, session_seq"""

    sqls["stream_sessions_native"] = _sessions_cte + """
        SELECT user_id,
               min(ts) AS session_start,
               count(*) AS n_events
        FROM seq
        GROUP BY user_id, session_seq"""

    # HITS over the user->content engagement graph: the 4-round
    # exact-integer L-infinity-normalized power iteration of
    # operators/graph.py::hits unrolled into chained CTEs. Every CTE is
    # MATERIALIZED and the per-half-round max is a window function
    # (MAX(raw) OVER ()) so each round is referenced exactly once — with
    # plain CTEs + scalar subqueries DuckDB inlines each round twice and
    # the 4-round chain blows up 2^8-fold (observed: the oracle never
    # finishes). Integer semantics are identical to the Spark loop.
    _h_scale, _h_rounds, _h_topk = 10**6, 4, 20
    _h_ctes = "".join(
        f""",
        a{i} AS MATERIALIZED (
            SELECT id, CAST((raw * {_h_scale}) //
                       (MAX(raw) OVER ()) AS BIGINT) AS score
            FROM (
                SELECT e.dst AS id, SUM(h.score) AS raw
                FROM ge e JOIN h{i - 1} h ON h.id = e.src GROUP BY e.dst
            )
        ),
        h{i} AS MATERIALIZED (
            SELECT id, CAST((raw * {_h_scale}) //
                       (MAX(raw) OVER ()) AS BIGINT) AS score
            FROM (
                SELECT e.src AS id, SUM(a.score) AS raw
                FROM ge e JOIN a{i} a ON a.id = e.dst GROUP BY e.src
            )
        )"""
        for i in range(1, _h_rounds + 1)
    )
    sqls["cdc_engagement_hits"] = f"""
        WITH {EVENTS_CTE.strip()},
        ge AS MATERIALIZED (
            SELECT DISTINCT user_id AS src, content_id AS dst
            FROM engagement_events WHERE content_id IS NOT NULL
        ),
        h0 AS MATERIALIZED (
            SELECT DISTINCT src AS id, CAST({_h_scale} AS BIGINT) AS score
            FROM ge
        ){_h_ctes}
        SELECT side, node_id, score, rnk FROM (
            SELECT 'hub' AS side, id AS node_id, score,
                   CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
                       AS rnk
            FROM h{_h_rounds}
            UNION ALL
            SELECT 'auth' AS side, id AS node_id, score,
                   CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
                       AS rnk
            FROM a{_h_rounds}
        ) WHERE rnk <= {_h_topk}"""

    # first/last-touch attribution, step for step with
    # operators/sessions.py::attribution: the same gap-and-islands session
    # assignment, per-session exact-decimal conversion revenue, first/last
    # non-conversion touch by (ts, event_id), 'direct' when none, and the
    # two credit rows per session folded into one (touch, channel) rollup
    sqls["wh_attribution"] = """
        WITH aev AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type, value
            FROM events WHERE ts IS NOT NULL
        ),
        aflag AS (
            SELECT user_id, ts, event_id, event_type, value,
                   CASE WHEN ts - lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM aev
        ),
        aseq AS (
            SELECT user_id, ts, event_id, event_type, value,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
            FROM aflag
        ),
        arev AS (
            SELECT user_id, session_seq,
                   SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS revenue
            FROM aseq GROUP BY user_id, session_seq
        ),
        atouch AS (
            SELECT user_id, session_seq, event_type,
                   row_number() OVER (
                       PARTITION BY user_id, session_seq
                       ORDER BY ts, event_id) AS rn_f,
                   row_number() OVER (
                       PARTITION BY user_id, session_seq
                       ORDER BY ts DESC, event_id DESC) AS rn_l
            FROM aseq WHERE event_type <> 'purchase'
        ),
        asess AS (
            SELECT r.user_id, r.session_seq, r.revenue,
                   COALESCE(f.event_type, 'direct') AS fch,
                   COALESCE(l.event_type, 'direct') AS lch
            FROM arev r
            LEFT JOIN (SELECT * FROM atouch WHERE rn_f = 1) f
              ON f.user_id = r.user_id AND f.session_seq = r.session_seq
            LEFT JOIN (SELECT * FROM atouch WHERE rn_l = 1) l
              ON l.user_id = r.user_id AND l.session_seq = r.session_seq
        ),
        acredit AS (
            SELECT 'first' AS touch, fch AS channel, revenue FROM asess
            UNION ALL
            SELECT 'last' AS touch, lch AS channel, revenue FROM asess
        )
        SELECT touch, channel,
               COUNT(*) AS n_sessions,
               CAST(SUM(revenue) AS DOUBLE) AS revenue
        FROM acredit GROUP BY touch, channel"""

    # streaming dropDuplicatesWithinWatermark over a deterministically
    # doubled source must restore exactly the distinct events
    sqls["stream_dedup_native"] = (
        f"WITH {EVENTS_CTE.strip()}\n"
        "        SELECT id, content_id, event_ts FROM engagement_events"
    )

    # stream_interval_join_native: the watermarked stream-stream interval
    # join emits exactly the batch self-join result (inner join, single
    # micro-batch), so the oracle is the plain bounded self-join
    sqls["cdc_schema_evolution"] = """
        SELECT event_id AS id,
               event_type,
               CASE WHEN event_id % 2 = 1
                    THEN 's' || CAST(event_id AS VARCHAR) END AS session_id,
               event_id % 2 = 1 AS is_v2,
               CAST(NULL AS VARCHAR) AS consumer_only
        FROM events"""

    sqls["stream_interval_join_native"] = """
        WITH e AS (
            SELECT event_id AS id, user_id, ts FROM events WHERE ts IS NOT NULL
        )
        SELECT a.id AS a_id, b.id AS b_id,
               CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
        FROM e a
        JOIN e b ON a.user_id = b.user_id
               AND a.id < b.id
               AND b.ts >= a.ts
               AND b.ts <= a.ts + INTERVAL 5 MINUTE"""

    sqls["wh_cohort_retention"] = """
        WITH ud AS (
            SELECT DISTINCT user_id, cohort_day, day FROM (
                SELECT user_id,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       min(CAST(date_trunc('day', ts) AS TIMESTAMP))
                           OVER (PARTITION BY user_id) AS cohort_day
                FROM events
            )
        )
        SELECT cohort_day, day AS activity_day,
               CAST(count(*) AS BIGINT) AS n_users
        FROM ud GROUP BY 1, 2"""

    sqls["wh_retention_rate"] = """
        WITH ud AS (
            SELECT DISTINCT user_id, cohort_day, day FROM (
                SELECT user_id,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       min(CAST(date_trunc('day', ts) AS TIMESTAMP))
                           OVER (PARTITION BY user_id) AS cohort_day
                FROM events
            )
        ),
        tri AS (
            SELECT cohort_day, day AS activity_day,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM ud GROUP BY 1, 2
        ),
        day0 AS (
            SELECT cohort_day, n_users AS cohort_size
            FROM tri WHERE activity_day = cohort_day
        )
        SELECT t.cohort_day, t.activity_day, t.n_users, d.cohort_size,
               round(t.n_users::DOUBLE / d.cohort_size, 6) AS retention
        FROM tri t JOIN day0 d USING (cohort_day)"""

    sqls["text_ngram_topk"] = f"""
        WITH {TOKS_CTE},
        grams AS (
            SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i+1]))
                       AS bigram
            FROM toks
        )
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM grams GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 50"""

    from ..operators.sampling import _WSAMPLE_MOD, WSAMPLE_K, WSAMPLE_SEED

    _u = (
        f"(({md5_long_seeded_sql('CAST(doc_id AS VARCHAR)', WSAMPLE_SEED)}"
        f" % {_WSAMPLE_MOD})::DOUBLE + 0.5) / {float(_WSAMPLE_MOD)!r}"
    )
    sqls["pipeline_weighted_sample"] = f"""
        WITH keyed AS (
            -- weight > 0 filter matches operators/sampling.py: ln(u)/0 is
            -- an engine-dependent inf/null, so zero-weight rows are
            -- excluded by contract, not by accidental sort position
            SELECT doc_id, n_chars AS weight,
                   ln({_u}) / n_chars AS _k
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, weight, round(_k, 6) + 0.0 AS sample_key
        FROM keyed ORDER BY _k DESC, doc_id LIMIT {WSAMPLE_K}"""

    sqls["wh_funnel"] = """
        WITH t1s AS (
            SELECT user_id, ts, event_type,
                   min(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id) AS t1
            FROM events
        ),
        t2s AS (
            SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                               THEN ts END)
                          OVER (PARTITION BY user_id) AS t2
            FROM t1s
        ),
        t3s AS (
            SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                               THEN ts END)
                          OVER (PARTITION BY user_id) AS t3
            FROM t2s
        ),
        per_user AS (
            SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
            FROM t3s GROUP BY user_id
        )
        SELECT CAST(count(CASE WHEN t1 IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_view,
               CAST(count(CASE WHEN t2 IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_view_click,
               CAST(count(CASE WHEN t3 IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_view_click_purchase
        FROM per_user"""

    sqls["wh_event_transitions"] = """
        SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type,
                   event_type
            FROM events
        )
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2"""

    sqls["wh_value_anomalies"] = """
        WITH by_min AS (
            SELECT event_type, date_trunc('minute', ts) AS minute,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(15,2)) AS v
            FROM events GROUP BY 1, 2
        ),
        roll AS (
            SELECT event_type, minute, v,
                   count(v) OVER w AS n_hist,
                   CAST(sum(v) OVER w AS DOUBLE) AS s,
                   CAST(sum(CAST(v * v AS DECIMAL(31,4))) OVER w AS DOUBLE) AS s2
            FROM by_min
            WINDOW w AS (PARTITION BY event_type ORDER BY minute
                         ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
        ),
        calc AS (
            SELECT event_type, minute, v, n_hist,
                   s / n_hist AS mean,
                   s2 / n_hist - (s / n_hist) * (s / n_hist) AS var
            FROM roll
            WHERE n_hist >= 10
        )
        SELECT event_type, minute, CAST(v AS DOUBLE) AS minute_total,
               round((CAST(v AS DOUBLE) - mean) / sqrt(var), 6) AS z
        FROM calc
        WHERE var > 0
          AND abs((CAST(v AS DOUBLE) - mean) / sqrt(var)) > 3"""

    sqls["wh_value_histogram"] = """
        SELECT bucket,
               CAST(bucket * 20 AS DOUBLE) AS lo,
               CAST((bucket + 1) * 20 AS DOUBLE) AS hi,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM (
            SELECT CAST(least(floor(value / 20.0), 24) AS INTEGER) AS bucket,
                   value
            FROM events
        )
        GROUP BY bucket"""

    sqls["wh_recursive_spine"] = """
        WITH RECURSIVE spine AS (
            SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d,
                   CAST(MAX(CAST(ts AS DATE)) AS DATE) AS mx
            FROM events
            UNION ALL
            SELECT d + 1, mx FROM spine WHERE d < mx
        ),
        daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events
            WHERE extract(day FROM ts) % 7 <> 3
            GROUP BY CAST(ts AS DATE)
        )
        SELECT CAST(spine.d AS TIMESTAMP) AS day,
               COALESCE(daily.n_events, CAST(0 AS BIGINT)) AS n_events,
               COALESCE(daily.sum_value, 0.0) AS sum_value,
               (daily.n_events IS NULL) AS is_gap
        FROM spine LEFT JOIN daily ON spine.d = daily.d"""

    sqls["wh_hourly_events"] = """
        SELECT date_trunc('hour', ts) AS event_hour,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2"""

    # ------------------------------------------------ LLM-pipeline extensions

    _stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    _sum_len = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b)"
    )
    from ..operators.text_analysis import BPE_PATTERN, PUNCT_PATTERN

    sqls["text_stats"] = f"""
        WITH {TOKS_CTE}
        SELECT doc_id, lang, n_chars_actual, n_tokens, n_uniq_tokens,
               avg_token_len, stopword_ratio, punct_ratio, bpe_tokens,
               est_bpe_tokens,
               (n_tokens >= 10 AND avg_token_len >= 2.0 AND avg_token_len <= 10.0
                AND stopword_ratio <= 0.7
                AND coalesce(punct_ratio <= 0.3, FALSE)) AS quality_ok
        FROM (
            SELECT doc_id, lang,
                   CAST(length(text) AS BIGINT) AS n_chars_actual,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
                   {_sum_len}::DOUBLE / len(toks) AS avg_token_len,
                   CAST(len(list_filter(toks, t -> t IN ({_stop}))) AS BIGINT)::DOUBLE
                       / len(toks) AS stopword_ratio,
                   CASE WHEN length(text) > 0 THEN
                       CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS BIGINT)::DOUBLE
                           / length(text)
                   END AS punct_ratio,
                   CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
                       AS bpe_tokens,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
            FROM toks
        )"""

    langs = list(LANG_MARKERS)
    score_exprs = []
    for lang, words in LANG_MARKERS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        score_exprs.append(
            f"CAST(len(list_filter(toks, t -> t IN ({wl}))) AS BIGINT) AS score_{lang}"
        )
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = []
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"score_{lang} > score_{other}")
            elif j > i:
                conds.append(f"score_{lang} >= score_{other}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    _pred = f"CASE {' '.join(branches)} ELSE '{langs[-1]}' END"
    sqls["text_langid"] = f"""
        WITH {TOKS_CTE},
        scored AS (
            SELECT doc_id, lang AS lang_actual, {", ".join(score_exprs)}
            FROM toks
        )
        SELECT doc_id, lang_actual,
               {", ".join(f"score_{lang}" for lang in langs)},
               {_pred} AS lang_predicted,
               ({_pred} = lang_actual) AS is_match
        FROM scored"""

    from ..operators.timeseries import SUBSEQ_K, SUBSEQ_W, znorm_pattern

    _pat = ", ".join(repr(p) for p in znorm_pattern())
    _w = SUBSEQ_W
    from ..operators.timeseries import AUTOCORR_LAGS

    _lags = ", ".join(str(l) for l in AUTOCORR_LAGS)
    sqls["ts_autocorr"] = f"""
        WITH m AS (
            SELECT event_type, date_trunc('minute', ts) AS minute,
                   SUM(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type, l.lag, a.v AS x, b.v AS y
            FROM m a
            CROSS JOIN (SELECT unnest([{_lags}]) AS lag) l
            JOIN m b ON b.event_type = a.event_type
                    AND b.minute = a.minute + to_minutes(CAST(l.lag AS BIGINT))
        )
        SELECT event_type,
               CAST(lag AS BIGINT) AS lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND((CAST(SUM(x * y) AS DOUBLE)
                      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) / COUNT(*))
                     / NULLIF(sqrt((CAST(SUM(x * x) AS DOUBLE)
                             - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) / COUNT(*))
                            * (CAST(SUM(y * y) AS DOUBLE)
                               - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) / COUNT(*))), 0.0),
                     6) + 0.0 AS autocorr
        FROM pairs
        GROUP BY 1, 2"""

    sqls["ts_trend_lines"] = """
        WITH m AS (
            SELECT event_type, date_trunc('minute', ts) AS minute,
                   SUM(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        mm AS (
            SELECT event_type, minute, v,
                   min(minute) OVER (PARTITION BY event_type) AS m0
            FROM m
        ),
        t AS (
            SELECT event_type,
                   CAST(date_diff('minute', m0, minute) AS BIGINT) AS x, v
            FROM mm
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   SUM(v) AS sy,
                   SUM(CAST(x AS DECIMAL(18,0)) * v) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   SUM(v * v) AS syy
            FROM t GROUP BY 1
        ),
        r AS (
            SELECT event_type, n,
                   CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                   CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
                   CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den_y,
                   CAST(sx AS DOUBLE) AS sx_d, CAST(sy AS DOUBLE) AS sy_d
            FROM s
        )
        SELECT event_type, n AS n_minutes,
               ROUND(num / NULLIF(den, 0.0), 6) + 0.0 AS slope_per_minute,
               ROUND((sy_d - (num / NULLIF(den, 0.0)) * sx_d)
                     / CAST(n AS DOUBLE), 6) + 0.0 AS intercept,
               ROUND((num * num) / NULLIF(den * den_y, 0.0), 6) + 0.0 AS r2
        FROM r"""

    from .registry import EQUIDEPTH_BUCKETS

    _qcols = ", ".join(
        f"ROUND(quantile_cont(value, {i / EQUIDEPTH_BUCKETS}), 4) AS q{i}"
        for i in range(1, EQUIDEPTH_BUCKETS)
    )
    _bucket_sum = " + ".join(
        f"CASE WHEN value > q{i} THEN 1 ELSE 0 END"
        for i in range(1, EQUIDEPTH_BUCKETS)
    )
    sqls["wh_equidepth_hist"] = f"""
        WITH b AS (
            SELECT event_type, {_qcols}
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        )
        SELECT e.event_type,
               CAST({_bucket_sum} AS INTEGER) AS bucket,
               CAST(count(*) AS BIGINT) AS n_values
        FROM events e JOIN b USING (event_type)
        WHERE value IS NOT NULL
        GROUP BY 1, 2"""

    sqls["ts_seasonal_profile"] = """
        WITH b AS (
            SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day,
                   CAST(count(*) AS BIGINT) AS n_events,
                   SUM(CAST(value AS DECIMAL(18,2))) AS sv
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT event_type, hour_of_day, n_events,
               ROUND(CAST(sv AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
                   AS avg_value,
               ROUND(CAST(sv AS DOUBLE) / CAST(n_events AS DOUBLE)
                     - CAST(sum(sv) OVER (PARTITION BY event_type) AS DOUBLE)
                       / CAST(sum(n_events) OVER (PARTITION BY event_type)
                              AS DOUBLE), 6)
                   AS deviation_from_type_mean
        FROM b"""

    from ..operators.timeseries import ROBUST_MAX_GAP

    sqls["ts_robust_trend"] = f"""
        WITH m AS (
            SELECT event_type, date_trunc('minute', ts) AS minute,
                   SUM(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   (CAST(b.v AS DOUBLE) - CAST(a.v AS DOUBLE))
                       / CAST(g.g AS DOUBLE) AS slope
            FROM m a
            CROSS JOIN (SELECT unnest(range(1, {ROBUST_MAX_GAP + 1})) AS g) g
            JOIN m b
              ON b.event_type = a.event_type
             AND b.minute = a.minute + to_minutes(CAST(g.g AS BIGINT))
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
        FROM pairs GROUP BY event_type"""

    sqls["ts_subsequence_search"] = f"""
        WITH win AS (
            SELECT user_id, event_id,
                   list(CAST(value AS DOUBLE)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_w - 1} PRECEDING AND CURRENT ROW) AS sub
            FROM events
        ),
        fullw AS (SELECT * FROM win WHERE len(sub) = {_w}),
        wm AS (SELECT user_id, event_id, sub,
                      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), sub),
                                  (a, b) -> a + b) / {_w}.0 AS m
               FROM fullw),
        ws AS (SELECT user_id, event_id, sub, m,
                      sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                               list_transform(sub, x -> (x - m) * (x - m))),
                           (a, b) -> a + b) / {_w}.0) AS sd
               FROM wm),
        d AS (SELECT user_id, event_id,
                     sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                              list_transform(range(1, {_w + 1}),
                                  i -> ((sub[i] - m) / sd - pat[i])
                                       * ((sub[i] - m) / sd - pat[i]))),
                          (a, b) -> a + b)) AS _d
              FROM ws, (SELECT [{_pat}]::DOUBLE[] AS pat) p
              WHERE sd > 0)
        SELECT user_id, event_id, round(_d, 6) AS dist
        FROM d ORDER BY _d, user_id, event_id LIMIT {SUBSEQ_K}"""

    from ..operators.text_analysis import (
        AUDIT_MAX_DUP_LINES,
        AUDIT_MAX_PUNCT,
        AUDIT_MAX_STOPWORD,
        AUDIT_MIN_ENTROPY,
        AUDIT_MIN_TOKENS,
        AUDIT_TOKEN_LEN,
        NONWS_PATTERN as _NONWS,
        PUNCT_PATTERN as _PUNCT,
    )

    _lo, _hi = AUDIT_TOKEN_LEN
    _ent_sql = r"""CASE WHEN len(cs) > 0 THEN
        -(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_sort(list_distinct(cs)),
                c -> (len(list_filter(cs, x -> x = c))::DOUBLE / len(cs))
                     * log2(len(list_filter(cs, x -> x = c))::DOUBLE / len(cs)))),
            (a, b) -> a + b))
        ELSE 0.0 END"""
    sqls["pipeline_filter_audit"] = f"""
        WITH per AS (
            SELECT
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CASE WHEN len(toks) > 0
                     THEN {_sum_len}::DOUBLE / len(toks) END AS avg_len,
                CASE WHEN len(toks) > 0 THEN
                    CAST(len(list_filter(toks, t -> t IN ({_stop}))) AS BIGINT)::DOUBLE
                        / len(toks) END AS stop_ratio,
                CASE WHEN length(text) > 0 THEN
                    CAST(len(regexp_extract_all(text, '{_PUNCT}')) AS BIGINT)::DOUBLE
                        / length(text) END AS punct_ratio,
                {_ent_sql} AS ent,
                CASE WHEN len(lines) > 0
                     THEN 1.0 - len(list_distinct(lines)) / len(lines)
                     ELSE 0.0 END AS dup_frac
            FROM (
                SELECT text,
                       list_filter(string_split(text, ' '), x -> x <> '') AS toks,
                       regexp_extract_all(text, '{_NONWS}') AS cs,
                       list_filter(list_transform(string_split(text, chr(10)),
                                                  x -> trim(x)),
                                   x -> x <> '') AS lines
                FROM documents
            )
        ),
        flags AS (
            SELECT
                CASE WHEN n_tokens < {AUDIT_MIN_TOKENS} THEN 1 ELSE 0 END AS r_too_few_tokens,
                CASE WHEN coalesce(avg_len < {_lo} OR avg_len > {_hi}, TRUE) THEN 1 ELSE 0 END AS r_bad_token_len,
                CASE WHEN coalesce(stop_ratio > {AUDIT_MAX_STOPWORD}, TRUE) THEN 1 ELSE 0 END AS r_high_stopword,
                CASE WHEN coalesce(punct_ratio > {AUDIT_MAX_PUNCT}, TRUE) THEN 1 ELSE 0 END AS r_high_punct,
                CASE WHEN ent < {AUDIT_MIN_ENTROPY} THEN 1 ELSE 0 END AS r_low_entropy,
                CASE WHEN dup_frac > {AUDIT_MAX_DUP_LINES} THEN 1 ELSE 0 END AS r_high_dup_lines
            FROM per
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN r_too_few_tokens + r_bad_token_len
                                  + r_high_stopword + r_high_punct
                                  + r_low_entropy + r_high_dup_lines = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(r_too_few_tokens) AS BIGINT) AS n_too_few_tokens,
               CAST(sum(r_bad_token_len) AS BIGINT) AS n_bad_token_len,
               CAST(sum(r_high_stopword) AS BIGINT) AS n_high_stopword,
               CAST(sum(r_high_punct) AS BIGINT) AS n_high_punct,
               CAST(sum(r_low_entropy) AS BIGINT) AS n_low_entropy,
               CAST(sum(r_high_dup_lines) AS BIGINT) AS n_high_dup_lines
        FROM flags"""

    sqls["text_char_entropy"] = rf"""
        WITH chars AS (
            SELECT doc_id, regexp_extract_all(text, '{_NONWS}') AS cs
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN len(cs) > 0 THEN
                   round(-(list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(list_sort(list_distinct(cs)),
                               c -> (len(list_filter(cs, x -> x = c))::DOUBLE
                                         / len(cs))
                                    * log2(len(list_filter(cs, x -> x = c))::DOUBLE
                                           / len(cs)))),
                       (a, b) -> a + b)), 6)
               ELSE 0.0 END AS char_entropy,
               CAST(len(list_distinct(cs)) AS BIGINT) AS n_uniq_chars
        FROM chars"""

    sqls["text_fingerprints"] = f"""
        SELECT doc_id,
               {rolling_fingerprint_sql("text")} AS fingerprint,
               CAST(length(text) AS BIGINT) AS n_chars_actual
        FROM documents"""

    from ..operators.search import BM25_B, BM25_K1, BM25_QUERY, BM25_TOPK

    _tf = ",\n                   ".join(
        f"CAST(len(list_filter(toks, t -> t = '{t}')) AS BIGINT) AS tf_{t}"
        for t in BM25_QUERY
    )
    _df = ",\n                   ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_QUERY
    )
    # fixed left-to-right sum mirrors the Spark expression exactly
    _score = " + ".join(
        f"ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * ((tf_{t} * ({BM25_K1} + 1.0)) / (tf_{t} + {BM25_K1}"
        f" * (1.0 - {BM25_B} + {BM25_B} * (dl / (sum_dl::DOUBLE / n_docs)))))"
        for t in BM25_QUERY
    )
    _tf_out = ", ".join(f"tf_{t}" for t in BM25_QUERY)
    sqls["search_bm25"] = f"""
        WITH {TOKS_CTE},
        base AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                   {_tf}
            FROM toks
        ),
        stats AS (
            SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
                   {_df}
            FROM base
        )
        SELECT doc_id, {_tf_out}, round(_score, 6) AS score
        FROM (
            SELECT base.*, {_score} AS _score
            FROM base CROSS JOIN stats
        )
        WHERE _score > 0
        ORDER BY _score DESC, doc_id ASC
        LIMIT {BM25_TOPK}"""

    sqls["dedup_exact"] = f"""
        SELECT {md5_long_sql("text")} AS text_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1"""

    sqls["dedup_ngram_jaccard"] = f"""
        WITH {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE}, {_JACCARD_PAIRS.strip()}
        SELECT doc_a, doc_b, n_common, jaccard
        FROM jac
        WHERE jaccard >= {JACCARD_THRESHOLD}"""

    from ..operators.dedup import CONTAINMENT_THRESHOLD

    sqls["dedup_containment"] = f"""
        WITH {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE}, {_JACCARD_PAIRS.strip()}
        SELECT i.doc_a, i.doc_b, i.n_common,
               i.n_common::DOUBLE / sa.n_shingles AS containment_a,
               i.n_common::DOUBLE / sb.n_shingles AS containment_b
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE greatest(i.n_common::DOUBLE / sa.n_shingles,
                       i.n_common::DOUBLE / sb.n_shingles)
              >= {CONTAINMENT_THRESHOLD}"""

    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    consts = minhash_constants(MINHASH_HASHES)
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> xor(h, CAST({consts[i]} AS BIGINT)))) AS sig_{i}"
        for i in range(MINHASH_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {keys}) AS bucket_key FROM sigs".format(
            b=b,
            keys=", ".join(
                f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    sqls["dedup_minhash_lsh"] = f"""
        WITH {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE}, {_JACCARD_PAIRS_RAW.strip()},
        hashed AS (SELECT doc_id,
                          list_transform(shingles, s -> {md5_long_sql('s')}) AS hs
                   FROM sh),
        sigs AS (SELECT doc_id, {sig_exprs} FROM hashed),
        buckets AS ({band_selects}),
        cands AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM buckets a
            JOIN buckets b
              ON a.band = b.band AND a.bucket_key = b.bucket_key
             AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b, v.n_common, v.jaccard
        FROM cands c
        JOIN jac v ON c.doc_a = v.doc_a AND c.doc_b = v.doc_b
        WHERE v.jaccard >= {JACCARD_THRESHOLD}"""

    from .registry import DEDUP_BATCH_MOD

    # same signature/banding chain as dedup_minhash_lsh; candidates are
    # (batch probes index) pairs only — corpus-internal pairs not re-emitted
    sqls["dedup_minhash_incremental"] = f"""
        WITH {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE}, {_JACCARD_PAIRS_RAW.strip()},
        hashed AS (SELECT doc_id,
                          list_transform(shingles, s -> {md5_long_sql('s')}) AS hs
                   FROM sh),
        sigs AS (SELECT doc_id, {sig_exprs} FROM hashed),
        buckets AS ({band_selects}),
        cands AS (
            SELECT DISTINCT b.doc_id AS doc_batch, a.doc_id AS doc_index
            FROM buckets b
            JOIN buckets a
              ON b.band = a.band AND b.bucket_key = a.bucket_key
            WHERE b.doc_id % {DEDUP_BATCH_MOD} = 0
              AND a.doc_id % {DEDUP_BATCH_MOD} <> 0
        )
        SELECT c.doc_batch, c.doc_index, v.n_common, v.jaccard
        FROM cands c
        JOIN jac v
          ON v.doc_a = least(c.doc_batch, c.doc_index)
         AND v.doc_b = greatest(c.doc_batch, c.doc_index)
        WHERE v.jaccard >= {JACCARD_THRESHOLD}"""

    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h & {1 << j}) <> 0)) > len(hs) "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    from ..operators.packing import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        PACK_BUDGET,
        PACK_SEED,
        PACK_SHARDS,
    )

    sqls["pipeline_chunk_pack"] = f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        s AS (
            SELECT doc_id, toks,
                   unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start
            FROM t WHERE len(toks) > 0
        ),
        chunks AS (
            SELECT doc_id * 1048576 + start // {CHUNK_STRIDE} AS chunk_id,
                   array_to_string(list_slice(toks, start + 1,
                                              start + {CHUNK_WINDOW}), ' ') AS text
            FROM s
        ),
        ctoks AS (
            SELECT chunk_id,
                   CAST(({md5_long_seeded_sql("chunk_id", PACK_SEED)})
                        % {PACK_SHARDS} AS INT) AS shard,
                   CAST(len(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS BIGINT) AS n_tokens
            FROM chunks
        ),
        cum AS (
            SELECT chunk_id, shard, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY chunk_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS token_offset
            FROM ctoks
        )
        SELECT chunk_id, shard, n_tokens, token_offset,
               token_offset // {PACK_BUDGET} AS pack_id,
               token_offset % {PACK_BUDGET} AS offset_in_pack
        FROM cum"""

    from ..operators.dedup import (
        WINNOW_G,
        WINNOW_K,
        WINNOW_MAX_DF_FRAC,
        WINNOW_MIN_DF_CAP,
    )

    _win_md5 = md5_long_sql(f"substr(text, i, {WINNOW_K})")
    from ..operators.text_analysis import VOCAB_SIZE

    _VOCAB_CTE = f"""
        tok AS (
            SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS token
            FROM documents
        ),
        vocab AS (
            SELECT CAST(row_number() OVER (ORDER BY freq DESC, token ASC) - 1
                        AS BIGINT) AS token_id,
                   token, freq
            FROM (
                SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
                FROM tok GROUP BY token
                ORDER BY freq DESC, token ASC
                LIMIT {VOCAB_SIZE}
            )
        )"""

    sqls["text_vocab"] = f"""
        WITH {_VOCAB_CTE}
        SELECT token_id, token, freq FROM vocab"""

    sqls["text_vocab_encode"] = f"""
        WITH {_VOCAB_CTE},
        pos AS (
            SELECT doc_id, s.p AS pos, s.t AS token
            FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           list_filter(string_split(text, ' '), x -> x <> ''),
                           (t, p) -> {{'p': p, 't': t}})) AS s
                FROM documents
            )
        ),
        enc AS (
            SELECT p.doc_id, p.pos,
                   COALESCE(v.token_id, {VOCAB_SIZE}) AS tid
            FROM pos p LEFT JOIN vocab v ON p.token = v.token
        )
        SELECT doc_id,
               array_to_string(list(tid ORDER BY pos), '_') AS ids,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN tid = {VOCAB_SIZE} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unk
        FROM enc
        GROUP BY doc_id"""

    # ---- BPE train/encode (round 6: rows-only -> full SQL oracles) ----
    # BPE is iterative, but the merge COUNT is a fixed constant
    # (BPE_NUM_MERGES), so the whole training loop unrolls into a chain
    # of CTE rounds: weighted adjacent-pair counts over the distinct-word
    # state -> argmax (cnt DESC, then (a, b) — DuckDB binary collation ==
    # Spark UTF8 == Python code points) -> leftmost fold-merge applied
    # via list_reduce over a chr(31)-delimited symbol STRING (DuckDB 1.0
    # has no list-accumulator reduce; the sentinel-delimited string is
    # the same device as the fold-dot list_prepend). Early stop (no pair
    # with cnt >= 2) makes best_k empty; the LEFT JOIN then NULLs the
    # merge rule, the CASE never fires, and every later round is a no-op
    # — exactly the Python trainer's break. Assumes chr(31) (ASCII unit
    # separator) never occurs inside a token, which holds for every
    # testdata corpus — and is GUARDED: bvocab_0 raises via error() on the
    # first violating token, so a corpus that breaks the sentinel encoding
    # fails loudly instead of corrupting the differential.
    # string_split(word, '') is per-code-point like
    # Spark's split(word, '') and Python's list(word).
    from ..operators.bpe import BPE_NUM_MERGES

    _BSEP = "chr(31)"

    def _bpe_round(k: int) -> str:
        prev = f"bvocab_{k - 1}"
        return f"""
        bpairs_{k} AS (
            SELECT syms[i] AS a, syms[i+1] AS b, SUM(wcount) AS cnt
            FROM (SELECT wcount, string_split(s, {_BSEP})[2:] AS syms
                  FROM {prev}),
                 unnest(range(1, len(syms))) AS t(i)
            GROUP BY 1, 2
        ),
        bbest_{k} AS (
            SELECT a, b, cnt FROM bpairs_{k}
            WHERE cnt >= 2 ORDER BY cnt DESC, a, b LIMIT 1
        ),
        bvocab_{k} AS (
            SELECT word, wcount,
                   list_reduce(
                       list_prepend('', string_split(s, {_BSEP})[2:]),
                       (acc, x) -> CASE
                           WHEN acc <> ''
                                AND ends_with(acc, {_BSEP} || bbest_{k}.a)
                                AND x = bbest_{k}.b
                           THEN left(acc,
                                     length(acc) - length(bbest_{k}.a) - 1)
                                || {_BSEP} || bbest_{k}.a || bbest_{k}.b
                           ELSE acc || {_BSEP} || x END
                   ) AS s
            FROM {prev} LEFT JOIN bbest_{k} ON TRUE
        )"""

    _BPE_CTES = (
        f"""
        bvocab_0 AS (
            SELECT word, CAST(count(*) AS BIGINT) AS wcount,
                   list_reduce(list_prepend('', string_split(word, '')),
                               (acc, x) -> acc || {_BSEP} || x) AS s
            FROM (SELECT CASE WHEN contains(word, {_BSEP})
                              THEN error('BPE oracle: token contains the '
                                         || 'U+001F sentinel; the '
                                         || 'chr(31)-delimited symbol '
                                         || 'encoding is invalid for this '
                                         || 'corpus')
                              ELSE word END AS word
                  FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                                  x -> x <> '')) AS word
                        FROM documents))
            GROUP BY word
        )"""
        + ","
        + ",".join(_bpe_round(k) for k in range(1, BPE_NUM_MERGES + 1))
    )

    sqls["text_bpe_train"] = (
        "WITH "
        + _BPE_CTES
        + "\n        SELECT * FROM ("
        + " UNION ALL ".join(
            f"SELECT CAST({k - 1} AS BIGINT) AS rank, a, b,"
            f" CAST(cnt AS BIGINT) AS pair_count FROM bbest_{k}"
            for k in range(1, BPE_NUM_MERGES + 1)
        )
        + ") ORDER BY rank"
    )

    sqls["text_bpe_encode"] = (
        "WITH "
        + _BPE_CTES
        + f""",
        benc AS (SELECT word, substr(s, 2) AS flat
                 FROM bvocab_{BPE_NUM_MERGES}),
        btok AS (
            SELECT doc_id, toks[i] AS word, i AS pos
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x <> '')
                             AS toks
                  FROM documents),
                 unnest(range(1, len(toks) + 1)) AS t(i)
        )
        SELECT doc_id,
               string_agg(replace(flat, {_BSEP}, ' '), ' ' ORDER BY pos)
                   AS pieces,
               CAST(SUM(length(flat) - length(replace(flat, {_BSEP}, ''))
                        + 1) AS BIGINT) AS n_pieces,
               CAST(SUM(length(replace(flat, {_BSEP}, ''))) AS BIGINT)
                   AS n_chars
        FROM btok JOIN benc USING (word)
        GROUP BY doc_id"""
    )

    sqls["text_lm_score"] = """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        dg AS (
            SELECT doc_id, s.p AS pos, s.g AS bigram
            FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) >= 2 THEN
                           list_transform(range(1, len(toks)),
                               i -> {'p': i - 1, 'g': toks[i] || ' ' || toks[i+1]})
                       ELSE [] END) AS s
                FROM t
            )
        ),
        bc AS (SELECT bigram, COUNT(*) AS c12 FROM dg GROUP BY bigram),
        uni AS (
            SELECT u.token FROM (SELECT unnest(toks) AS token FROM t) u
        ),
        uc AS (SELECT token, COUNT(*) AS c1 FROM uni GROUP BY token),
        vn AS (SELECT COUNT(DISTINCT token) AS v FROM uni),
        scored AS (
            SELECT dg.doc_id, dg.pos,
                   ln(CAST(bc.c12 + 1 AS DOUBLE)
                      / CAST(uc.c1 + vn.v AS DOUBLE)) AS logp
            FROM dg
            JOIN bc ON dg.bigram = bc.bigram
            JOIN uc ON string_split(dg.bigram, ' ')[1] = uc.token
            CROSS JOIN vn
        )
        SELECT doc_id,
               CAST(len(lp) AS BIGINT) AS n_bigrams,
               ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lp),
                                 (a, x) -> a + x) / len(lp), 6) AS mean_logp
        FROM (
            SELECT doc_id, list(logp ORDER BY pos) AS lp
            FROM scored GROUP BY doc_id
        )"""

    # mirrors operators/classify.py::nb_confusion step for step: the model
    # pivots to a (token -> class-ordered logp list), each document folds
    # the per-position lists elementwise starting FROM the log-prior list
    # (same per-class add order as the Spark zip_with fold), and argmax is
    # the first position of the list max — bit-identical log-likelihoods,
    # bit-identical tie-break toward the lexically smallest class
    sqls["text_nb_lang"] = """
        WITH t AS (
            SELECT doc_id, lang AS label,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        dt AS (
            SELECT doc_id, label, s.p AS pos, s.tok AS token
            FROM (
                SELECT doc_id, label,
                       unnest(list_transform(range(1, len(toks) + 1),
                           i -> {'p': i - 1, 'tok': toks[i]})) AS s
                FROM t
            )
        ),
        ctk AS (SELECT label, token, COUNT(*) AS c FROM dt GROUP BY label, token),
        cls AS (SELECT label, COUNT(*) AS n_tok FROM dt GROUP BY label),
        voc AS (SELECT COUNT(DISTINCT token) AS v FROM dt),
        hdr AS (
            SELECT list(label ORDER BY label) AS class_names,
                   list(ln(CAST(n_docs AS DOUBLE) / CAST(n_all AS DOUBLE))
                        ORDER BY label) AS log_priors
            FROM (
                SELECT label, COUNT(*) AS n_docs,
                       SUM(COUNT(*)) OVER () AS n_all
                FROM t GROUP BY label
            )
        ),
        grid AS (
            SELECT d.token, c2.label AS cand,
                   ln(CAST(COALESCE(k.c, 0) + 1 AS DOUBLE)
                      / CAST(c2.n_tok + 1 * voc.v AS DOUBLE)) AS logp
            FROM (SELECT DISTINCT token FROM dt) d
            CROSS JOIN cls c2
            LEFT JOIN ctk k ON k.label = c2.label AND k.token = d.token
            CROSS JOIN voc
        ),
        garr AS (
            SELECT token, list(logp ORDER BY cand) AS lps
            FROM grid GROUP BY token
        ),
        seqs AS (
            SELECT dt.doc_id, dt.label, list(g.lps ORDER BY dt.pos) AS seq
            FROM dt JOIN garr g ON dt.token = g.token
            GROUP BY dt.doc_id, dt.label
        ),
        lls AS (
            SELECT s.doc_id, s.label, h.class_names,
                   list_reduce(
                       list_prepend(h.log_priors, s.seq),
                       (a, x) -> list_transform(range(1, len(a) + 1),
                                                j -> a[j] + x[j])) AS ll
            FROM seqs s CROSS JOIN hdr h
        ),
        pred AS (
            SELECT doc_id, label,
                   class_names[CAST(list_position(
                       ll, list_aggregate(ll, 'max')) AS INT)] AS pred
            FROM lls
        )
        SELECT label AS true_label, pred AS pred_label,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY 1, 2"""

    sqls["wh_fuzzy_supplier_names"] = """
        WITH vals AS (SELECT DISTINCT s_name AS val FROM supplier),
        vars AS (
            SELECT val, unnest(list_append(
                list_transform(range(1, len(val) + 1),
                    i -> substr(val, 1, i - 1) || substr(val, i + 1)),
                val)) AS var
            FROM vals
        ),
        cand AS (
            SELECT a.val AS val_a, b.val AS val_b
            FROM vars a JOIN vars b ON a.var = b.var AND a.val < b.val
            GROUP BY 1, 2
        )
        SELECT val_a, val_b, CAST(1 AS BIGINT) AS dist
        FROM cand
        WHERE levenshtein(val_a, val_b) = 1"""

    from ..operators.sampling import DSIR_TARGET_SOURCE

    sqls["pipeline_importance_weights"] = f"""
        WITH t AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        dt AS (
            SELECT doc_id, s.p AS pos, s.t AS token
            FROM (
                SELECT doc_id,
                       unnest(list_transform(toks,
                           (t, p) -> {{'p': p, 't': t}})) AS s
                FROM t
            )
        ),
        rc AS (SELECT token, COUNT(*) AS cr FROM dt GROUP BY token),
        tt AS (
            SELECT unnest(toks) AS token FROM t
            WHERE source = '{DSIR_TARGET_SOURCE}'
        ),
        tc AS (SELECT token, COUNT(*) AS ct FROM tt GROUP BY token),
        st AS (
            SELECT (SELECT SUM(cr) FROM rc) AS tot_r,
                   (SELECT COUNT(*) FROM rc) AS v,
                   (SELECT COUNT(*) FROM tt) AS tot_t
        ),
        scored AS (
            SELECT dt.doc_id, dt.pos,
                   ln((COALESCE(tc.ct, 0) + 1)::DOUBLE
                      / (st.tot_t + st.v)::DOUBLE)
                 - ln((rc.cr + 1)::DOUBLE
                      / (st.tot_r + st.v)::DOUBLE) AS lr
            FROM dt
            JOIN rc USING (token)
            LEFT JOIN tc USING (token)
            CROSS JOIN st
        )
        SELECT doc_id,
               CAST(len(l) AS BIGINT) AS n_tokens,
               ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), l),
                                 (a, x) -> a + x), 6) AS log_weight
        FROM (
            SELECT doc_id, list(lr ORDER BY pos) AS l
            FROM scored GROUP BY doc_id
        )"""

    # PII detection/redaction (operators/privacy.py): identical pattern
    # strings drive Spark (Java regex) and DuckDB (RE2) — the pattern set
    # is restricted to the shared syntax subset, so leftmost
    # non-overlapping scans agree. The augmented corpus mirrors
    # registry._pii_augmented_docs exactly.
    from ..operators.privacy import PII_PATTERNS

    _pii_aug = """
        SELECT doc_id,
            text
            || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
                || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN ' call 555-'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
            || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-'
                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                || lpad(CAST(doc_id * 3 % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
            || CASE WHEN doc_id % 17 = 0 THEN ' from 10.'
                || CAST(doc_id % 256 AS VARCHAR) || '.'
                || CAST(doc_id * 3 % 256 AS VARCHAR) || '.'
                || CAST(doc_id * 5 % 256 AS VARCHAR) ELSE '' END
            AS text
        FROM documents"""
    _pii_counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    _pii_total = " + ".join(f"n_{kind}" for kind in PII_PATTERNS)

    sqls["text_pii_stats"] = f"""
        WITH aug AS ({_pii_aug}),
        c AS (SELECT doc_id, {_pii_counts} FROM aug)
        SELECT doc_id, {", ".join("n_" + k for k in PII_PATTERNS)},
               ({_pii_total}) > 0 AS has_pii
        FROM c"""

    # chained stages mirror pii_redact exactly: each pattern counts on
    # the text AFTER the previous replacements (n_redactions = number of
    # replacements actually made, no double count of subsumed spans)
    _stages = ["s0 AS (SELECT doc_id, text, CAST(0 AS BIGINT) AS n FROM aug)"]
    for _i, (_kind, _pat) in enumerate(PII_PATTERNS.items()):
        _stages.append(
            f"s{_i + 1} AS (SELECT doc_id, "
            f"regexp_replace(text, '{_pat}', '[{_kind.upper()}]', 'g') AS text, "
            f"n + CAST(len(regexp_extract_all(text, '{_pat}')) AS BIGINT) AS n "
            f"FROM s{_i})"
        )
    sqls["text_pii_redact"] = f"""
        WITH aug AS ({_pii_aug}),
        {", ".join(_stages)}
        SELECT doc_id, text AS clean_text, n AS n_redactions
        FROM s{len(PII_PATTERNS)}"""

    sqls["text_dedup_lines"] = """
        WITH l AS (
            SELECT doc_id, string_split(text, chr(10)) AS lines FROM documents
        ),
        k AS (
            SELECT doc_id, lines,
                   list_filter(
                       list_transform(range(1, len(lines) + 1),
                           i -> CASE WHEN list_position(lines, lines[i]) = i
                                THEN lines[i] END),
                       x -> x IS NOT NULL) AS kept
            FROM l
        )
        SELECT doc_id,
               array_to_string(kept, chr(10)) AS dedup_text,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(lines) - len(kept) AS BIGINT) AS n_dup_lines_removed
        FROM k"""

    sqls["dedup_substring"] = f"""
        WITH w AS (
            SELECT doc_id,
                   list_transform(range(1, len(text) - {WINNOW_K} + 2),
                                  i -> {_win_md5}) AS wins
            FROM documents WHERE len(text) >= {WINNOW_K}
        ),
        sel AS (
            SELECT doc_id,
                   CASE WHEN len(wins) >= {WINNOW_G} THEN
                       list_distinct(
                           list_transform(range(1, len(wins) - {WINNOW_G} + 2),
                               j -> list_min(
                                        list_slice(wins, j, j + {WINNOW_G} - 1))))
                   ELSE [list_min(wins)] END AS fps
            FROM w
        ),
        fp AS (SELECT doc_id, unnest(fps) AS fingerprint FROM sel),
        tot AS (SELECT count(*) AS n_docs FROM documents),
        hot AS (
            SELECT fingerprint FROM fp, tot
            GROUP BY fingerprint, n_docs
            HAVING count(*) > greatest(n_docs * {WINNOW_MAX_DF_FRAC},
                                       {WINNOW_MIN_DF_CAP})
        ),
        fpc AS (
            SELECT doc_id, fingerprint FROM fp
            WHERE fingerprint NOT IN (SELECT fingerprint FROM hot)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared_fp
        FROM fpc a JOIN fpc b
          ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2"""

    sqls["dedup_simhash"] = f"""
        WITH {TOKS_CTE},
        hashes AS (
            SELECT doc_id,
                   list_transform(list_distinct(toks), t -> {md5_long_sql('t')}) AS hs
            FROM toks
        )
        SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
        FROM hashes"""

    # Banded-Hamming join + verify (operators/multimodal.py:
    # image_dup_pairs) over SQL-expressible 60-bit signature columns —
    # the oracle-checkable twins of the codec-backed mm_image_dedup /
    # mm_audio_dedup (round-4 verdict item 3: everything after the
    # signature stage is plain SQL once hashes are columns). Hashes are
    # positive (60-bit), so DuckDB's arithmetic >> equals Spark's
    # shiftrightunsigned; xor/bit_count are two's-complement-identical.
    from ..operators.multimodal import (
        IMG_DUP_BANDS,
        IMG_DUP_BUCKET_CAP,
        IMG_DUP_MAX_HAMMING,
        TOKEN_ENVELOPE_WINDOWS,
    )

    _bw = 64 // IMG_DUP_BANDS

    def _banded_hamming_sql(sig_ctes: str, signed: bool = False) -> str:
        """sig_ctes must end defining sig(media_id, ahash). With
        ``signed=False`` hashes must be non-negative (60-bit), so plain
        arithmetic >> equals Spark's shiftrightunsigned. ``signed=True``
        (the full-64-bit codec hashes) first lifts the hash to its
        unsigned HUGEINT value so band keys match shiftrightunsigned on
        negative longs too; xor/bit_count are two's-complement-identical
        either way."""
        if signed:
            key = (
                f"CAST(((CASE WHEN ahash < 0 THEN ahash::HUGEINT + "
                f"18446744073709551616 ELSE ahash::HUGEINT END) "
                f">> ({_bw} * t.band)) & {(1 << _bw) - 1} AS BIGINT)"
            )
        else:
            key = f"(ahash >> ({_bw} * t.band)) & {(1 << _bw) - 1}"
        return f"""
        WITH {sig_ctes},
        banded0 AS (
            SELECT media_id, ahash, t.band AS band,
                   {key} AS key
            FROM sig, generate_series(0, {IMG_DUP_BANDS - 1}) AS t(band)
        ),
        kept AS (
            SELECT band, key FROM banded0 GROUP BY band, key
            HAVING count(*) <= {IMG_DUP_BUCKET_CAP}
        ),
        banded AS (
            SELECT b.* FROM banded0 b
            JOIN kept k ON b.band = k.band AND b.key = k.key
        ),
        cands AS (
            SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                            a.ahash AS h_a, b.ahash AS h_b
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.key = b.key
                         AND a.media_id < b.media_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
        FROM cands WHERE bit_count(xor(h_a, h_b)) <= {IMG_DUP_MAX_HAMMING}"""

    from .registry import MM_SQL_SIG_BITS

    _bit_terms60 = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h & {1 << j}) <> 0)) "
        f"> len(hs) THEN {1 << j} ELSE 0 END)"
        for j in range(MM_SQL_SIG_BITS)
    )
    sqls["mm_image_dedup_sql"] = _banded_hamming_sql(f"""{TOKS_CTE},
        hashes AS (
            SELECT doc_id,
                   list_transform(list_distinct(toks), t -> {md5_long_sql('t')}) AS hs
            FROM toks
        ),
        sig AS (
            SELECT doc_id AS media_id, CAST({_bit_terms60} AS BIGINT) AS ahash
            FROM hashes
        )""")

    from ..operators.multimodal import TOKEN_ENVELOPE_RUN

    _nsl = TOKEN_ENVELOPE_WINDOWS + 1
    sqls["mm_audio_dedup_sql"] = _banded_hamming_sql(f"""{TOKS_CTE},
        tt AS (
            SELECT doc_id, unnest(toks) AS tok,
                   generate_subscripts(toks, 1) - 1 AS pos,
                   len(toks) * {TOKEN_ENVELOPE_RUN} AS total
            FROM toks WHERE len(toks) * {TOKEN_ENVELOPE_RUN} >= {_nsl}
        ),
        en AS (
            SELECT doc_id,
                   CAST(floor(((pos * {TOKEN_ENVELOPE_RUN} + r.i) * {_nsl})
                              / total) AS INTEGER) AS slice,
                   {md5_long_sql('tok')} % 256 AS e
            FROM tt, generate_series(0, {TOKEN_ENVELOPE_RUN - 1}) AS r(i)
        ),
        ws AS (
            SELECT doc_id, slice, sum(e) AS es, count(*) AS ns
            FROM en GROUP BY 1, 2
        ),
        lw AS (
            SELECT doc_id, slice, es, ns,
                   lead(es) OVER (PARTITION BY doc_id ORDER BY slice) AS e2,
                   lead(ns) OVER (PARTITION BY doc_id ORDER BY slice) AS n2
            FROM ws
        ),
        sig AS (
            SELECT doc_id AS media_id,
                   CAST(sum(CASE WHEN es * n2 > e2 * ns
                                 THEN (1::BIGINT << slice) ELSE 0 END)
                        AS BIGINT) AS ahash
            FROM lw WHERE slice < {TOKEN_ENVELOPE_WINDOWS}
            GROUP BY doc_id
        )""")

    # Round 7: FULL oracles for the codec-backed paths themselves — the
    # last two rows-only queries leave the set. Both syntheses now hash
    # with the portable md5-60bit convention and both fingerprints use
    # exact integer arithmetic (multimodal.py round-7 notes), so the
    # entire render -> PNG/WAV encode -> decode -> perceptual-hash ->
    # banded-Hamming pipeline is a pure SQL function of the text: the
    # codec round trips are pixel/sample-identity (proven byte-for-byte
    # in tests/test_media_codecs.py), so the oracle models encode+decode
    # as identity and recomputes everything else value-for-value.
    _POW2_64 = "[" + ", ".join(str(1 << i) for i in range(64)) + "]::HUGEINT[]"
    _SIGNED64 = (
        "CASE WHEN {u} >= 9223372036854775808 "
        "THEN {u} - 18446744073709551616 ELSE {u} END"
    )

    # The codec RENDERS tokenize with Python str.split() (any whitespace)
    # while this oracle splits on single spaces; the corpora are
    # space-only, and like the BPE sentinel assumption this one is
    # GUARDED — a document carrying any OTHER character Python's
    # str.isspace() accepts (the class below is exactly that set minus
    # the space — ASCII controls \t\n\v\f\r, the \x1c-\x1f separators,
    # NEL, NBSP, and the Unicode Zs/Zl/Zp spaces; verified exhaustive
    # against chr(i).isspace() in tests/test_python_oracles.py) makes the
    # oracle fail loudly instead of producing a bogus differential.
    _MM_TOKS_CTE = (
        "toks AS (SELECT doc_id, list_filter(string_split("
        "CASE WHEN regexp_matches(text, "
        "'[\\t\\n\\x0B\\x0C\\r\\x{1C}-\\x{1F}\\x{85}\\x{A0}\\x{1680}"
        "\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]') "
        "THEN error('mm oracle: document contains non-space whitespace; "
        "the Python render tokenizes with str.split(), which diverges "
        "from the single-space split here') "
        "ELSE text END, ' '), x -> x <> '') AS toks FROM documents)"
    )

    # image: 16x16 trigram-histogram grid -> px = cnt*255 // peak ->
    # 8x8 nearest downsample picks the even (row, col) cells ->
    # bit (r*8+c) set when px*64 > sum of the 64 sampled px
    _tri_hash = md5_long_sql("(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])")
    sqls["mm_image_dedup"] = _banded_hamming_sql(
        f"""{_MM_TOKS_CTE},
        tri AS (
            SELECT doc_id, {_tri_hash} % 256 AS cell
            FROM toks, unnest(range(1, len(toks) - 1)) AS t(i)
        ),
        grid AS (
            SELECT doc_id, cell, CAST(count(*) AS BIGINT) AS cnt
            FROM tri GROUP BY 1, 2
        ),
        peak AS (SELECT doc_id, max(cnt) AS peak FROM grid GROUP BY 1),
        px AS (
            SELECT g.doc_id,
                   ((g.cell // 16) // 2) * 8 + (g.cell % 16) // 2 AS bit,
                   (g.cnt * 255) // p.peak AS v
            FROM grid g JOIN peak p USING (doc_id)
            WHERE (g.cell // 16) % 2 = 0 AND (g.cell % 16) % 2 = 0
        ),
        tot AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY 1),
        uv AS (
            SELECT px.doc_id,
                   sum(CASE WHEN px.v * 64 > tot.sv
                            THEN ({_POW2_64})[px.bit + 1]
                            ELSE 0::HUGEINT END) AS u
            FROM px JOIN tot USING (doc_id)
            GROUP BY 1
        ),
        sig AS (
            SELECT d.doc_id AS media_id,
                   CAST({_SIGNED64.format(u="COALESCE(uv.u, 0::HUGEINT)")}
                        AS BIGINT) AS ahash
            FROM documents d LEFT JOIN uv ON d.doc_id = uv.doc_id
        )""",
        signed=True,
    )

    # audio: amp(token) = md5_60(token) % 20000 - 10000, 16 constant
    # samples per token, 65 balanced slices (slice = floor(s*65/total)),
    # bit j set when |amp|-sum_j * n_{j+1} > |amp|-sum_{j+1} * n_j;
    # docs under 65 samples yield no fingerprint (sub-slice-count WAVs)
    _WAV_RUN = 16
    _wav_nsl = 65
    _amp = f"abs({md5_long_sql('tok')} % 20000 - 10000)"
    sqls["mm_audio_dedup"] = _banded_hamming_sql(
        f"""{_MM_TOKS_CTE},
        wt AS (
            SELECT doc_id, unnest(toks) AS tok,
                   generate_subscripts(toks, 1) - 1 AS pos,
                   len(toks) * {_WAV_RUN} AS total
            FROM toks WHERE len(toks) * {_WAV_RUN} >= {_wav_nsl}
        ),
        wen AS (
            SELECT doc_id,
                   CAST(((pos * {_WAV_RUN} + r.i) * {_wav_nsl}) // total
                        AS INTEGER) AS slice,
                   {_amp} AS e
            FROM wt, generate_series(0, {_WAV_RUN - 1}) AS r(i)
        ),
        wws AS (
            SELECT doc_id, slice, sum(e) AS es, count(*) AS ns
            FROM wen GROUP BY 1, 2
        ),
        wlw AS (
            SELECT doc_id, slice, es, ns,
                   lead(es) OVER (PARTITION BY doc_id ORDER BY slice) AS e2,
                   lead(ns) OVER (PARTITION BY doc_id ORDER BY slice) AS n2
            FROM wws
        ),
        sig AS (
            SELECT doc_id AS media_id,
                   CAST({_SIGNED64.format(
                       u=f"sum(CASE WHEN es * n2 > e2 * ns "
                         f"THEN ({_POW2_64})[slice + 1] "
                         f"ELSE 0::HUGEINT END)")}
                        AS BIGINT) AS ahash
            FROM wlw WHERE slice < {_wav_nsl - 1}
            GROUP BY doc_id
        )""",
        signed=True,
    )

    sqls["sim_topk_cosine"] = f"""
        WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = {SIM_QUERY_VEC_ID})
        SELECT vec_id, label, cosine_sim
        FROM (
            SELECT vec_id, label,
                   {cosine_sql("embedding", "q_vec")} AS cosine_sim
            FROM embeddings, q
            WHERE vec_id <> {SIM_QUERY_VEC_ID}
        )
        ORDER BY cosine_sim DESC, vec_id
        LIMIT {SIM_TOPK}"""

    # Hyperplane LSH bucket, SELF-SIZED like the Spark side
    # (similarity.balanced_planes): nplanes = smallest p with 4**p >= n
    # (== ceil(log2(n)/2); 4**p is a power of two so the double power is
    # exact, and DuckDB's MIN-over-range lands on the identical integer as
    # Python's ((n-1).bit_length()+1)//2). Weight literals are embedded for
    # _ORACLE_MAX_PLANES planes — enough through n = 4**12 ~ 16.7M vectors,
    # far past any oracle scale (the oracle runs at sf <= 0.1); plane p
    # contributes bit 2**p only while p < nplanes, so the expression
    # evaluates to the exact bucket the Spark side computes at ANY n.
    _ORACLE_MAX_PLANES = 12
    _nplanes = (
        "(SELECT MIN(p) FROM range(0, 32) t(p), "
        "(SELECT count(*) AS n_emb FROM embeddings) WHERE 4.0 ** p >= n_emb)"
    )
    weights = hyperplane_weights(_ORACLE_MAX_PLANES)
    bucket_terms = []
    for p, row in enumerate(weights):
        arr = "([" + ", ".join(f"{float(x)!r}" for x in row) + "]::DOUBLE[])"
        bucket_terms.append(
            f"(CASE WHEN {p} < {_nplanes}"
            f" AND {dot_sql('embedding', arr)} > 0 THEN {1 << p} ELSE 0 END)"
        )
    _bucket = "CAST(" + " + ".join(bucket_terms) + " AS BIGINT)"
    sqls["sim_ann_lsh"] = f"""
        WITH bucketed AS (
            SELECT vec_id, label, embedding, {_bucket} AS bucket
            FROM embeddings
        ),
        q AS (SELECT embedding AS q_vec, bucket AS q_bucket FROM bucketed
              WHERE vec_id = {SIM_QUERY_VEC_ID})
        SELECT vec_id, label, cosine_sim
        FROM (
            SELECT vec_id, label,
                   {cosine_sql("embedding", "q_vec")} AS cosine_sim
            FROM bucketed, q
            WHERE bucket = q_bucket AND vec_id <> {SIM_QUERY_VEC_ID}
        )
        ORDER BY cosine_sim DESC, vec_id
        LIMIT {SIM_TOPK}"""

    def _l2sq_sql(a: str, b: str) -> str:
        return f"({dot_sql(a, a)} + {dot_sql(b, b)} - 2 * {dot_sql(a, b)})"

    from ..operators.similarity import (
        IVF_CENTROID_MOD,
        IVF_COARSE_CELLS,
        IVF_NPROBE,
    )

    # cent is the FIXED query-time coarse codebook (round 6): first
    # IVF_COARSE_CELLS seeds by vec_id rank, the identical capped-seed
    # device as the PQ codebook — with the uncapped growing seed the
    # assignment CROSS JOIN below is O(n^2/29) in both engines.
    sqls["sim_ann_ivf"] = f"""
        WITH cent AS (
            SELECT cell, c_vec FROM (
                SELECT vec_id AS cell, embedding AS c_vec,
                       row_number() OVER (ORDER BY vec_id) AS _rk
                FROM embeddings WHERE vec_id % {IVF_CENTROID_MOD} = 0
            ) WHERE _rk <= {IVF_COARSE_CELLS}
        ),
        q AS (SELECT embedding AS q_vec FROM embeddings
              WHERE vec_id = {SIM_QUERY_VEC_ID}),
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_l2sq_sql("e.embedding", "c.c_vec")}, c.cell
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        qcells AS (
            SELECT cell FROM (
                SELECT c.cell,
                       row_number() OVER (
                           ORDER BY {_l2sq_sql("q.q_vec", "c.c_vec")}, c.cell
                       ) AS rn
                FROM q CROSS JOIN cent c
            ) WHERE rn <= {IVF_NPROBE}
        )
        SELECT vec_id, label, cosine_sim
        FROM (
            SELECT e.vec_id, e.label,
                   {cosine_sql("e.embedding", "q_vec")} AS cosine_sim
            FROM embeddings e
            JOIN assign a ON e.vec_id = a.vec_id
            JOIN qcells qc ON a.cell = qc.cell
            CROSS JOIN q
            WHERE e.vec_id <> {SIM_QUERY_VEC_ID}
        )
        ORDER BY cosine_sim DESC, vec_id
        LIMIT {SIM_TOPK}"""

    # probe masks are [0, 1, 2, 4, ..., 2**(nplanes-1)] — nplanes+1 probes,
    # sized by the same self-sizing rule as the bucket expression above
    _masks_rel = (
        "(SELECT CASE WHEN i = 0 THEN 0"
        " ELSE CAST(2.0 ** (i - 1) AS BIGINT) END AS mask"
        f" FROM range(0, 33) t(i) WHERE i <= {_nplanes}) m"
    )
    sqls["sim_ann_lsh_multiprobe"] = f"""
        WITH bucketed AS (
            SELECT vec_id, label, embedding, {_bucket} AS bucket
            FROM embeddings
        ),
        probes AS (
            SELECT vec_id AS q_id, embedding AS q_vec,
                   xor(bucket, m.mask) AS probe_bucket
            FROM bucketed, {_masks_rel}
            WHERE vec_id = {SIM_QUERY_VEC_ID}
        )
        SELECT vec_id, label, cosine_sim
        FROM (
            SELECT b.vec_id, b.label,
                   {cosine_sql("b.embedding", "q_vec")} AS cosine_sim
            FROM bucketed b JOIN probes p ON b.bucket = p.probe_bucket
            WHERE b.vec_id <> p.q_id
        )
        ORDER BY cosine_sim DESC, vec_id
        LIMIT {SIM_TOPK}"""

    # recall@k of each ANN path vs exact top-k — compose the top-k queries
    # above verbatim (DuckDB allows WITH inside a parenthesized subquery),
    # so this oracle can never drift from theirs
    sqls["sim_ann_recall"] = f"""
        WITH bf AS (SELECT vec_id FROM ({sqls["sim_topk_cosine"]})),
             lsh AS (SELECT vec_id FROM ({sqls["sim_ann_lsh"]})),
             lshmp AS (SELECT vec_id FROM ({sqls["sim_ann_lsh_multiprobe"]})),
             ivf AS (SELECT vec_id FROM ({sqls["sim_ann_ivf"]}))
        SELECT 'lsh' AS method, CAST(count(*) AS BIGINT) AS hits,
               round(count(*)::DOUBLE / {SIM_TOPK}, 6) AS recall_at_k
        FROM lsh JOIN bf USING (vec_id)
        UNION ALL
        SELECT 'lsh_multiprobe', CAST(count(*) AS BIGINT),
               round(count(*)::DOUBLE / {SIM_TOPK}, 6)
        FROM lshmp JOIN bf USING (vec_id)
        UNION ALL
        SELECT 'ivf', CAST(count(*) AS BIGINT),
               round(count(*)::DOUBLE / {SIM_TOPK}, 6)
        FROM ivf JOIN bf USING (vec_id)"""

    sqls["pipeline_domain_mix"] = """
        WITH per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   -- CAST the sum: DuckDB sum over ints is HUGEINT (no
                   -- Spark analog; float64 via pandas) — keep it BIGINT
                   CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT))
                        AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT sum(n_tokens) AS t_tokens, count(*) AS n_sources FROM per
        )
        SELECT source, n_docs, n_tokens,
               round(n_tokens::DOUBLE / t_tokens, 9) AS token_share,
               round((t_tokens::DOUBLE / n_sources) / n_tokens, 9)
                   AS uniform_weight
        FROM per CROSS JOIN tot"""

    from ..operators.similarity import EMBED_DIM, PQ_CENTROID_MOD, PQ_M

    _sd = EMBED_DIM // PQ_M

    # shared PQ CTE chain: per-subspace codebooks from the deterministic
    # centroid seed, per-(vector, subspace) nearest-codebook assignment
    # (ties -> lowest cell), folded in fixed subspace order; seeds_sql is
    # parameterized so the capped IVF-PQ variant shares the exact text
    def _pq_ctes(seeds_sql: str) -> str:
        return f"""
        subs AS (SELECT unnest(range(0, {PQ_M})) AS sub),
        seeds AS ({seeds_sql}),
        cb AS (SELECT cell, sub,
                      list_slice(embedding, sub*{_sd}+1, sub*{_sd}+{_sd}) AS c_sub
               FROM seeds CROSS JOIN subs),
        vecs AS (SELECT vec_id, sub,
                        list_slice(embedding, sub*{_sd}+1, sub*{_sd}+{_sd}) AS v_sub
                 FROM embeddings CROSS JOIN subs),
        dist AS (
            SELECT vec_id, sub, cell, d,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d, cell) AS rn
            FROM (SELECT v.vec_id, v.sub, c.cell,
                         {_l2sq_sql("v.v_sub", "c.c_sub")} AS d
                  FROM vecs v JOIN cb c ON v.sub = c.sub)
        ),
        best AS (SELECT vec_id, sub, cell, d FROM dist WHERE rn = 1)"""

    from ..operators.similarity import (
        IVFPQ_COARSE_CELLS,
        IVFPQ_MAX_CODES,
        PQ_MAX_CODES,
    )

    # capped codebook: first max_codes seeds by vec_id rank — the classic
    # fixed-size PQ codebook, and (round 6) the DEFAULT for the plain PQ
    # queries too: the uncapped every-29th-vector seed grows the codebook
    # with the corpus and the sf1 spot-bench measured the assignment join
    # at 40.8x wall for a 10x data step. PQ_MAX_CODES == IVFPQ_MAX_CODES
    # (256, 8-bit codes), so all three PQ oracles share the identical
    # capped CTE text and can never drift from one another.
    assert PQ_MAX_CODES == IVFPQ_MAX_CODES
    _PQ_CTES_CAP = _pq_ctes(
        f"SELECT cell, embedding FROM ("
        f"SELECT vec_id AS cell, embedding,"
        f" row_number() OVER (ORDER BY vec_id) AS _rk"
        f" FROM embeddings WHERE vec_id % {PQ_CENTROID_MOD} = 0)"
        f" WHERE _rk <= {PQ_MAX_CODES}"
    )

    sqls["sim_pq_encode"] = f"""
        WITH {_PQ_CTES_CAP.strip()}
        SELECT vec_id,
               string_agg(CAST(cell AS VARCHAR), '-' ORDER BY sub) AS codes,
               round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                              list(d ORDER BY sub)),
                                 (a, b) -> a + b) / {EMBED_DIM}, 6) AS recon_mse
        FROM best GROUP BY vec_id"""

    sqls["sim_pq_adc_topk"] = f"""
        WITH {_PQ_CTES_CAP.strip()},
        q AS (SELECT sub, list_slice(embedding, sub*{_sd}+1, sub*{_sd}+{_sd}) AS q_sub
              FROM embeddings CROSS JOIN subs
              WHERE vec_id = {SIM_QUERY_VEC_ID}),
        lut AS (SELECT c.sub, c.cell, {_l2sq_sql("c.c_sub", "q.q_sub")} AS qd
                FROM cb c JOIN q ON c.sub = q.sub),
        appr AS (
            SELECT b.vec_id,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                            list(l.qd ORDER BY b.sub)),
                               (a, x) -> a + x) AS approx
            FROM best b JOIN lut l ON b.sub = l.sub AND b.cell = l.cell
            WHERE b.vec_id <> {SIM_QUERY_VEC_ID}
            GROUP BY b.vec_id
        )
        SELECT vec_id, round(approx, 6) AS approx_l2sq
        FROM appr ORDER BY approx, vec_id LIMIT {SIM_TOPK}"""

    # IVF-PQ composition: the coarse-cell CTEs of sim_ann_ivf restrict the
    # candidate set; the PQ CTE chain + ADC LUT of sim_pq_adc_topk score it.
    # Sharing both CTE texts verbatim means this oracle can never drift
    # from either building block's.
    sqls["sim_ivfpq_topk"] = f"""
        WITH {_PQ_CTES_CAP.strip()},
        cent AS (
            SELECT cell2, c_vec FROM (
                SELECT vec_id AS cell2, embedding AS c_vec,
                       row_number() OVER (ORDER BY vec_id) AS _rk
                FROM embeddings WHERE vec_id % {IVF_CENTROID_MOD} = 0
            ) WHERE _rk <= {IVFPQ_COARSE_CELLS}
        ),
        qv AS (SELECT embedding AS q_vec FROM embeddings
               WHERE vec_id = {SIM_QUERY_VEC_ID}),
        assign AS (
            SELECT vec_id, cell2 FROM (
                SELECT e.vec_id, c.cell2,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_l2sq_sql("e.embedding", "c.c_vec")}, c.cell2
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        qcells AS (
            SELECT cell2 FROM (
                SELECT c.cell2,
                       row_number() OVER (
                           ORDER BY {_l2sq_sql("qv.q_vec", "c.c_vec")}, c.cell2
                       ) AS rn
                FROM qv CROSS JOIN cent c
            ) WHERE rn <= {IVF_NPROBE}
        ),
        cand AS (
            SELECT vec_id FROM assign JOIN qcells USING (cell2)
            WHERE vec_id <> {SIM_QUERY_VEC_ID}
        ),
        q AS (SELECT sub, list_slice(embedding, sub*{_sd}+1, sub*{_sd}+{_sd}) AS q_sub
              FROM embeddings CROSS JOIN subs
              WHERE vec_id = {SIM_QUERY_VEC_ID}),
        lut AS (SELECT c.sub, c.cell, {_l2sq_sql("c.c_sub", "q.q_sub")} AS qd
                FROM cb c JOIN q ON c.sub = q.sub),
        appr AS (
            SELECT b.vec_id,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                            list(l.qd ORDER BY b.sub)),
                               (a, x) -> a + x) AS approx
            FROM best b
            JOIN cand USING (vec_id)
            JOIN lut l ON b.sub = l.sub AND b.cell = l.cell
            GROUP BY b.vec_id
        )
        SELECT vec_id, round(approx, 6) AS approx_l2sq
        FROM appr ORDER BY approx, vec_id LIMIT {SIM_TOPK}"""

    sqls["sim_embedding_dups"] = f"""
        SELECT vec_a, vec_b, cosine_sim
        FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   {cosine_sql("a.embedding", "b.embedding")} AS cosine_sim
            FROM embeddings a
            JOIN embeddings b ON a.vec_id < b.vec_id
        )
        WHERE cosine_sim >= {COSINE_TAU}"""

    # multimodal: the synthesized media bytes are the UTF-8 text, so the
    # oracle derives every feature from strlen(text) (bytes) directly —
    # this checks the whole mapInPandas plumbing end-to-end
    _mt = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
    sqls["mm_decode_features"] = f"""
        SELECT media_id, media_type, n_bytes,
               CAST(16 + n_bytes % 1024 AS INTEGER) AS width,
               CAST(16 + (n_bytes * 7) % 768 AS INTEGER) AS height,
               CAST(CASE WHEN media_type = 'image' THEN 1
                         ELSE 1 + n_bytes % 240 END AS INTEGER) AS n_frames,
               checksum
        FROM (
            SELECT doc_id AS media_id, {_mt} AS media_type,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   md5(text) AS checksum
            FROM documents
        )"""

    sqls["mm_media_stats"] = f"""
        SELECT media_type,
               count(*) AS n_media,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               max(width) AS max_width,
               max(n_frames) AS max_frames
        FROM (
            SELECT {_mt} AS media_type,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(16 + strlen(text) % 1024 AS INTEGER) AS width,
                   CAST(CASE WHEN {_mt} = 'image' THEN 1
                             ELSE 1 + strlen(text) % 240 END AS INTEGER) AS n_frames
            FROM documents
        )
        GROUP BY media_type"""

    sqls["pipeline_clean_corpus"] = f"""
        WITH {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE}, {_JACCARD_PAIRS.strip()},
        stats AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   {_sum_len}::DOUBLE / len(toks) AS avg_token_len,
                   CAST(len(list_filter(toks, t -> t IN ({_stop}))) AS BIGINT)::DOUBLE
                       / len(toks) AS stopword_ratio,
                   CASE WHEN length(text) > 0 THEN
                       CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS BIGINT)::DOUBLE
                           / length(text)
                   END AS punct_ratio
            FROM toks
        ),
        keepers AS (
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY {md5_long_sql("text")}
        ),
        losers AS (
            SELECT DISTINCT doc_b AS doc_id FROM jac
            WHERE jaccard >= {JACCARD_THRESHOLD}
        ),
        surviving AS (
            SELECT s.doc_id, s.n_tokens
            FROM stats s
            JOIN keepers k ON s.doc_id = k.doc_id
            WHERE s.n_tokens >= 10
              AND s.avg_token_len >= 2.0 AND s.avg_token_len <= 10.0
              AND s.stopword_ratio <= 0.7
              AND coalesce(s.punct_ratio <= 0.3, FALSE)
              AND NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = s.doc_id)
        )
        SELECT d.lang,
               count(*) AS n_docs,
               -- DuckDB sum(BIGINT) is HUGEINT, a type Spark lacks and
               -- pandas coerces to float64 — cast back for a stable hash
               CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens
        FROM documents d
        JOIN surviving s ON d.doc_id = s.doc_id
        GROUP BY d.lang"""

    sqls["mm_resize"] = """
        SELECT doc_id AS media_id,
               CAST(224 AS INTEGER) AS width,
               CAST(224 AS INTEGER) AS height,
               CAST(least(strlen(text), 224 * 224 * 3) AS BIGINT) AS out_n_bytes
        FROM documents
        WHERE doc_id % 3 = 0"""

    sqls["mm_frame_sample"] = """
        SELECT media_id,
               CAST(i AS INTEGER) AS frame_idx,
               md5(text || ':' || CAST(i AS VARCHAR)) AS frame_checksum
        FROM (
            SELECT doc_id AS media_id, text,
                   unnest(range(0, 1 + strlen(text) % 240, 30)) AS i
            FROM documents
            WHERE doc_id % 3 = 2
        )"""

    from ..operators.multimodal import (
        VIDEO_DUP_MIN_SHARED,
        VIDEO_FRAME_LEN,
        VIDEO_FRAME_STRIDE,
        VIDEO_SIG_MAX_DF_FRAC,
        VIDEO_SIG_MIN_DF_CAP,
    )

    _fl, _fs = VIDEO_FRAME_LEN, VIDEO_FRAME_STRIDE
    # char-based slicing on both sides (Python slices the decoded chars,
    # substring() slices chars) so the pair is consistent even off-ASCII
    sqls["mm_video_dedup"] = f"""
        WITH v AS (SELECT doc_id AS media_id, text FROM documents
                   WHERE doc_id % 3 = 2),
        sig AS (
            SELECT DISTINCT media_id,
                   md5(substring(text, i*{_fs} + 1, {_fl})) AS frame_sig
            FROM (
                SELECT media_id, text,
                       unnest(range(0,
                           CAST(floor((length(text) - {_fl}) / {_fs})
                                AS BIGINT) + 1)) AS i
                FROM v WHERE length(text) >= {_fl}
            )
        ),
        nv AS (SELECT count(*) AS n FROM v),
        hot AS (
            SELECT frame_sig FROM sig CROSS JOIN nv
            GROUP BY frame_sig, nv.n
            HAVING count(*) > greatest(nv.n * {VIDEO_SIG_MAX_DF_FRAC},
                                       {float(VIDEO_SIG_MIN_DF_CAP)})
        ),
        keep AS (SELECT * FROM sig
                 WHERE frame_sig NOT IN (SELECT frame_sig FROM hot))
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               CAST(count(*) AS BIGINT) AS n_shared_frames
        FROM keep a JOIN keep b
          ON a.frame_sig = b.frame_sig AND a.media_id < b.media_id
        GROUP BY 1, 2
        HAVING count(*) >= {VIDEO_DUP_MIN_SHARED}"""

    # banded multi-table hyperplane LSH (operators/similarity.py:
    # embedding_dup_pairs_lsh): one SELECT per band, keys from the shared
    # deterministic hyperplane family, MinHash-banding candidate shape
    from ..operators.similarity import EMB_LSH_BANDS, EMB_LSH_ROWS

    bw = hyperplane_weights(EMB_LSH_BANDS * EMB_LSH_ROWS)
    band_selects = []
    for b in range(EMB_LSH_BANDS):
        terms = []
        for r in range(EMB_LSH_ROWS):
            row = bw[b * EMB_LSH_ROWS + r]
            arr = "([" + ", ".join(f"{float(x)!r}" for x in row) + "]::DOUBLE[])"
            terms.append(
                f"(CASE WHEN {dot_sql('embedding', arr)} > 0"
                f" THEN {1 << r} ELSE 0 END)"
            )
        key = "CAST(" + " + ".join(terms) + " AS BIGINT)"
        band_selects.append(
            f"SELECT vec_id, {b} AS band, {key} AS bkey FROM embeddings"
        )
    _emb_banded = " UNION ALL ".join(band_selects)
    from ..operators.similarity import EMB_LSH_BUCKET_CAP

    sqls["sim_embedding_dups_lsh"] = f"""
        WITH banded0 AS ({_emb_banded}),
        kept AS (
            SELECT band, bkey FROM banded0 GROUP BY band, bkey
            HAVING count(*) <= {EMB_LSH_BUCKET_CAP}
        ),
        banded AS (
            SELECT b.* FROM banded0 b
            JOIN kept k ON b.band = k.band AND b.bkey = k.bkey
        ),
        cands AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM banded a
            JOIN banded b
              ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
        ),
        nz AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE {dot_sql("embedding", "embedding")} > 0
        )
        SELECT vec_a, vec_b, cosine_sim
        FROM (
            SELECT c.vec_a, c.vec_b,
                   {cosine_sql("ea.embedding", "eb.embedding")} AS cosine_sim
            FROM cands c
            JOIN nz ea ON c.vec_a = ea.vec_id
            JOIN nz eb ON c.vec_b = eb.vec_id
        )
        WHERE cosine_sim >= {COSINE_TAU}"""

    # incremental banded near-dup (operators/similarity.py:
    # embedding_dup_batch_lsh): batch (vec_id % 5 = 4) probes the capped
    # standing index of the rest; corpus- and batch-internal pairs not
    # emitted
    sqls["sim_embedding_dups_incremental"] = f"""
        WITH banded0 AS ({_emb_banded}),
        idx0 AS (SELECT * FROM banded0 WHERE vec_id % 5 <> 4),
        kept AS (
            SELECT band, bkey FROM idx0 GROUP BY band, bkey
            HAVING count(*) <= {EMB_LSH_BUCKET_CAP}
        ),
        idx AS (
            SELECT i.* FROM idx0 i
            JOIN kept k ON i.band = k.band AND i.bkey = k.bkey
        ),
        bat AS (SELECT * FROM banded0 WHERE vec_id % 5 = 4),
        cands AS (
            SELECT DISTINCT b.vec_id AS vec_batch, i.vec_id AS vec_index
            FROM bat b
            JOIN idx i ON b.band = i.band AND b.bkey = i.bkey
        ),
        nz AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE {dot_sql("embedding", "embedding")} > 0
        )
        SELECT vec_batch, vec_index, cosine_sim
        FROM (
            SELECT c.vec_batch, c.vec_index,
                   {cosine_sql("eb.embedding", "ei.embedding")} AS cosine_sim
            FROM cands c
            JOIN nz eb ON c.vec_batch = eb.vec_id
            JOIN nz ei ON c.vec_index = ei.vec_id
        )
        WHERE cosine_sim >= {COSINE_TAU}"""

    # semantic decontamination (operators/similarity.py:
    # semantic_decontaminate): mod-50 bench split probes the capped
    # standing corpus index — the same CTE chain as the incremental path
    # with the split predicate swapped, then a per-corpus-vector rollup
    from ..operators.similarity import SEM_CONTAM_BENCH_MOD

    sqls["sim_decontaminate"] = f"""
        WITH banded0 AS ({_emb_banded}),
        idx0 AS (SELECT * FROM banded0
                 WHERE vec_id % {SEM_CONTAM_BENCH_MOD} <> 0),
        kept AS (
            SELECT band, bkey FROM idx0 GROUP BY band, bkey
            HAVING count(*) <= {EMB_LSH_BUCKET_CAP}
        ),
        idx AS (
            SELECT i.* FROM idx0 i
            JOIN kept k ON i.band = k.band AND i.bkey = k.bkey
        ),
        bat AS (SELECT * FROM banded0
                WHERE vec_id % {SEM_CONTAM_BENCH_MOD} = 0),
        cands AS (
            SELECT DISTINCT b.vec_id AS vec_batch, i.vec_id AS vec_index
            FROM bat b
            JOIN idx i ON b.band = i.band AND b.bkey = i.bkey
        ),
        nz AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE {dot_sql("embedding", "embedding")} > 0
        ),
        hits AS (
            SELECT vec_batch, vec_index, cosine_sim
            FROM (
                SELECT c.vec_batch, c.vec_index,
                       {cosine_sql("eb.embedding", "ei.embedding")} AS cosine_sim
                FROM cands c
                JOIN nz eb ON c.vec_batch = eb.vec_id
                JOIN nz ei ON c.vec_index = ei.vec_id
            )
            WHERE cosine_sim >= {COSINE_TAU}
        )
        SELECT vec_index AS vec_id,
               CAST(count(*) AS BIGINT) AS n_bench_matches,
               max(cosine_sim) AS max_cosine
        FROM hits GROUP BY vec_index"""

    # SemDeDup (operators/similarity.py:semantic_dedup): BALANCED seed-IVF
    # coarse quantizer (first floor(sqrt(n)) seeds by rank — the sqrt
    # sizing that keeps assignment and cell occupancy both O(n^1.5)),
    # then in-cluster lower-id-wins near-dup drops. floor(sqrt()) over
    # DuckDB's IEEE double sqrt matches Python's math.floor(math.sqrt())
    # on the Spark side exactly.
    _balanced_cent = f"""
        cent AS (
            SELECT cell, c_vec FROM (
                SELECT vec_id AS cell, embedding AS c_vec,
                       row_number() OVER (ORDER BY vec_id) AS _rk
                FROM embeddings WHERE vec_id % {IVF_CENTROID_MOD} = 0
            ) WHERE _rk <= GREATEST(1, CAST(floor(sqrt(
                (SELECT count(*) FROM embeddings))) AS BIGINT))
        )"""
    sqls["sim_semantic_dedup"] = f"""
        WITH {_balanced_cent},
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_l2sq_sql("e.embedding", "c.c_vec")}, c.cell
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        normed AS (
            SELECT e.vec_id, a.cell, e.embedding,
                   sqrt({dot_sql("e.embedding", "e.embedding")}) AS norm
            FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
        ),
        sims AS (
            SELECT d.cell, d.vec_id AS drop_id,
                   {dot_sql("d.embedding", "k.embedding")} / (d.norm * k.norm) AS cos
            FROM normed d
            JOIN normed k ON d.cell = k.cell AND k.vec_id < d.vec_id
        )
        SELECT drop_id, cell,
               CAST(COUNT(*) AS BIGINT) AS n_dup_of,
               ROUND(MAX(cos), 6) AS max_cos
        FROM sims
        WHERE cos >= {COSINE_TAU}
        GROUP BY drop_id, cell"""

    from ..operators.similarity import EMB_IVF_NPROBE

    # Two medoid-update refinement rounds of the balanced quantizer, then
    # the final hard assignment (operators/similarity.py::
    # ivf_refine_medoid + registry.q_sim_ivf_refined). Every comparison is
    # either a sequential-fold double (bit-identical in both engines) or
    # exact int64 arithmetic: pair distances are integerized as
    # floor(l2sq * 1e6) BEFORE the per-cell sum, so the medoid election is
    # order-independent. Unrolled: assign(seeds) -> medoid -> assign ->
    # medoid -> final assign.
    def _ivf_assign_cte(name: str, cent: str) -> str:
        return f"""
        {name} AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_l2sq_sql("e.embedding", "c.c_vec")}, c.cell
                       ) AS rn
                FROM embeddings e CROSS JOIN {cent} c
            ) WHERE rn = 1
        )"""

    def _ivf_medoid_cte(name: str, assign: str) -> str:
        return f"""
        {name}_mem AS (
            SELECT a.cell, e.vec_id, e.embedding
            FROM embeddings e JOIN {assign} a ON e.vec_id = a.vec_id
        ),
        {name}_sc AS (
            SELECT x.cell, x.vec_id AS a_id,
                   SUM(CAST(floor(
                       {_l2sq_sql("x.embedding", "y.embedding")} * 1000000.0
                   ) AS BIGINT)) AS score
            FROM {name}_mem x JOIN {name}_mem y ON x.cell = y.cell
            GROUP BY x.cell, x.vec_id
        ),
        {name} AS (
            SELECT s.cell, s.a_id AS medoid_id, e.embedding AS c_vec
            FROM (
                SELECT cell, a_id,
                       row_number() OVER (
                           PARTITION BY cell ORDER BY score, a_id
                       ) AS rn
                FROM {name}_sc
            ) s JOIN embeddings e ON s.a_id = e.vec_id
            WHERE s.rn = 1
        )"""

    sqls["sim_ivf_refined"] = f"""
        WITH {_balanced_cent},
        {_ivf_assign_cte("ra1", "cent").strip()},
        {_ivf_medoid_cte("rm1", "ra1").strip()},
        {_ivf_assign_cte("ra2", "rm1").strip()},
        {_ivf_medoid_cte("rm2", "ra2").strip()},
        {_ivf_assign_cte("ra3", "rm2").strip()}
        SELECT a.vec_id, a.cell, m.medoid_id,
               CAST(count(*) OVER (PARTITION BY a.cell) AS BIGINT)
                   AS cell_size
        FROM ra3 a JOIN rm2 m ON a.cell = m.cell"""

    from ..operators.similarity import EMB_IVF_CELL_CAP

    # 3-probe IVF-blocked near-dup (operators/similarity.py:
    # embedding_dup_pairs_ivf): same BALANCED sqrt-sized quantizer as
    # semantic_dedup, rn <= nprobe, then the round-10 bounded
    # inverted-list scan (crk <= cell_cap: each cell keeps only its
    # EMB_IVF_CELL_CAP members nearest the centroid, ties -> lowest
    # vec_id — never binding at the shipped SFs, measured max occupancy
    # 166 at sf0.1), distinct pairs sharing any surviving probed cell,
    # cosine verify
    sqls["sim_embedding_dups_ivf"] = f"""
        WITH {_balanced_cent},
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (
                           PARTITION BY cell ORDER BY d, vec_id
                       ) AS crk
                FROM (
                    SELECT vec_id, cell, d FROM (
                        SELECT e.vec_id, c.cell,
                               {_l2sq_sql("e.embedding", "c.c_vec")} AS d
                        FROM embeddings e CROSS JOIN cent c
                    ) ds QUALIFY row_number() OVER (
                        PARTITION BY vec_id ORDER BY d, cell
                    ) <= {EMB_IVF_NPROBE}
                )
            ) WHERE crk <= {EMB_IVF_CELL_CAP}
        ),
        normed AS (
            SELECT e.vec_id, a.cell, e.embedding,
                   sqrt({dot_sql("e.embedding", "e.embedding")}) AS norm
            FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
        ),
        cands AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM normed a
            JOIN normed b ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, cosine_sim
        FROM (
            SELECT c.vec_a, c.vec_b,
                   {dot_sql("ea.embedding", "eb.embedding")}
                       / (ea.norm * eb.norm) AS cosine_sim
            FROM cands c
            JOIN (SELECT DISTINCT vec_id, embedding, norm FROM normed
                  WHERE norm > 0) ea
              ON c.vec_a = ea.vec_id
            JOIN (SELECT DISTINCT vec_id, embedding, norm FROM normed
                  WHERE norm > 0) eb
              ON c.vec_b = eb.vec_id
        )
        WHERE cosine_sim >= {COSINE_TAU}"""

    from .registry import IVF_PAIR_MAX_CELLS

    sqls["sim_embedding_dups_ivf_capped"] = f"""
        WITH cent AS (
            SELECT cell, c_vec FROM (
                SELECT vec_id AS cell, embedding AS c_vec,
                       row_number() OVER (ORDER BY vec_id) AS _rk
                FROM embeddings WHERE vec_id % {IVF_CENTROID_MOD} = 0
            ) WHERE _rk <= {IVF_PAIR_MAX_CELLS}
        ),
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_l2sq_sql("e.embedding", "c.c_vec")}, c.cell
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn <= {EMB_IVF_NPROBE}
        ),
        normed AS (
            SELECT e.vec_id, a.cell, e.embedding,
                   sqrt({dot_sql("e.embedding", "e.embedding")}) AS norm
            FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
        ),
        cands AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM normed a
            JOIN normed b ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, cosine_sim
        FROM (
            SELECT c.vec_a, c.vec_b,
                   {dot_sql("ea.embedding", "eb.embedding")}
                       / (ea.norm * eb.norm) AS cosine_sim
            FROM cands c
            JOIN (SELECT DISTINCT vec_id, embedding, norm FROM normed
                  WHERE norm > 0) ea
              ON c.vec_a = ea.vec_id
            JOIN (SELECT DISTINCT vec_id, embedding, norm FROM normed
                  WHERE norm > 0) eb
              ON c.vec_b = eb.vec_id
        )
        WHERE cosine_sim >= {COSINE_TAU}"""

    # norms folded once per vector (same IEEE ops as the Spark _normed path:
    # sqrt of the sequential-fold self-dot, multiplied per pair)
    _NORMED_CTE = (
        f"n AS (SELECT vec_id, embedding, "
        f"sqrt({dot_sql('embedding', 'embedding')}) AS norm FROM embeddings)"
    )
    sqls["sim_knn_join"] = f"""
        WITH {_NORMED_CTE},
        scored AS (
            SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
                   {dot_sql("a.embedding", "b.embedding")} / (a.norm * b.norm)
                       AS cosine_sim
            FROM n a JOIN n b ON a.vec_id <> b.vec_id
        )
        SELECT src_id, nbr_id, cosine_sim,
               row_number() OVER (
                   PARTITION BY src_id ORDER BY cosine_sim DESC, nbr_id
               ) AS nbr_rank
        FROM scored
        QUALIFY nbr_rank <= {KNN_K}"""

    sqls["sim_knn_join_lsh"] = f"""
        WITH bn AS (
            SELECT vec_id, embedding, {_bucket} AS bucket,
                   sqrt({dot_sql('embedding', 'embedding')}) AS norm
            FROM embeddings
        ),
        scored AS (
            SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
                   {dot_sql("a.embedding", "b.embedding")} / (a.norm * b.norm)
                       AS cosine_sim
            FROM bn a JOIN bn b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        )
        SELECT src_id, nbr_id, cosine_sim,
               row_number() OVER (
                   PARTITION BY src_id ORDER BY cosine_sim DESC, nbr_id
               ) AS nbr_rank
        FROM scored
        QUALIFY nbr_rank <= {KNN_K}"""

    # fixed-point integer PageRank over the exact k-NN graph: the 8-round
    # iterative recurrence of operators/graph.py unrolled into chained CTEs.
    # All arithmetic is integer (// here, div in Spark — identical truncation
    # for non-negative operands) so per-node sums are exact and
    # order-independent: the hash matches bit-for-bit with no float anywhere.
    _pr_total, _pr_damp, _pr_iters, _pr_topk = 10**12, 85, 8, 50
    _pr_rounds = "".join(
        f""",
        r{i} AS (
            SELECT nd.id,
                   ({_pr_total} * {100 - _pr_damp}) // (100 * c.n_nodes)
                   + COALESCE(SUM((p.r * {_pr_damp}) // (100 * d.outdeg)), 0)
                       AS r
            FROM pr_nodes nd CROSS JOIN pr_c c
            LEFT JOIN pr_edges e ON e.nbr_id = nd.id
            LEFT JOIN r{i - 1} p ON p.id = e.src_id
            LEFT JOIN pr_deg d ON d.src_id = e.src_id
            GROUP BY nd.id, c.n_nodes
        )"""
        for i in range(1, _pr_iters + 1)
    )
    sqls["sim_knn_pagerank"] = f"""
        WITH pr_bn AS (
            SELECT vec_id, embedding, {_bucket} AS bucket,
                   sqrt({dot_sql('embedding', 'embedding')}) AS norm
            FROM embeddings
        ),
        pr_scored AS (
            SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
                   {dot_sql("a.embedding", "b.embedding")} / (a.norm * b.norm)
                       AS cosine_sim
            FROM pr_bn a JOIN pr_bn b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ),
        pr_edges AS (
            SELECT src_id, nbr_id FROM (
                SELECT src_id, nbr_id,
                       row_number() OVER (
                           PARTITION BY src_id
                           ORDER BY cosine_sim DESC, nbr_id
                       ) AS nbr_rank
                FROM pr_scored
            ) WHERE nbr_rank <= {KNN_K}
        ),
        pr_deg AS (
            SELECT src_id, COUNT(*) AS outdeg FROM pr_edges GROUP BY src_id
        ),
        pr_nodes AS (
            SELECT src_id AS id FROM pr_edges
            UNION
            SELECT nbr_id FROM pr_edges
        ),
        pr_c AS (SELECT COUNT(*) AS n_nodes FROM pr_nodes),
        r0 AS (
            SELECT id, {_pr_total} // c.n_nodes AS r
            FROM pr_nodes CROSS JOIN pr_c c
        ){_pr_rounds}
        SELECT id AS vec_id,
               CAST(r AS BIGINT) AS rank_units,
               CAST((r * 1000000) // {_pr_total} AS BIGINT) AS rank_ppm
        FROM r{_pr_iters}
        ORDER BY r DESC, id
        LIMIT {_pr_topk}"""

    # deterministic synchronous label propagation over the same blocked
    # k-NN edges as sim_knn_pagerank, symmetrized; each round unrolls to
    # one neighbour-label count + one per-node argmax
    from ..operators.graph import LPA_ROUNDS

    _lpa_rounds = "".join(
        f""",
        v{i} AS (
            SELECT e.src AS id, l.lbl, count(*) AS cnt
            FROM lpa_edges e JOIN l{i - 1} l ON e.dst = l.id
            GROUP BY e.src, l.lbl
        ),
        l{i} AS (
            SELECT id, lbl FROM (
                SELECT id, lbl,
                       row_number() OVER (
                           PARTITION BY id ORDER BY cnt DESC, lbl
                       ) AS rn
                FROM v{i}
            ) WHERE rn = 1
        )"""
        for i in range(1, LPA_ROUNDS + 1)
    )
    sqls["sim_knn_communities"] = f"""
        WITH lpa_bn AS (
            SELECT vec_id, embedding, {_bucket} AS bucket,
                   sqrt({dot_sql('embedding', 'embedding')}) AS norm
            FROM embeddings
        ),
        lpa_scored AS (
            SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
                   {dot_sql("a.embedding", "b.embedding")} / (a.norm * b.norm)
                       AS cosine_sim
            FROM lpa_bn a JOIN lpa_bn b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ),
        lpa_knn AS (
            SELECT src_id, nbr_id FROM (
                SELECT src_id, nbr_id,
                       row_number() OVER (
                           PARTITION BY src_id
                           ORDER BY cosine_sim DESC, nbr_id
                       ) AS nbr_rank
                FROM lpa_scored
            ) WHERE nbr_rank <= {KNN_K}
        ),
        lpa_edges AS (
            SELECT src_id AS src, nbr_id AS dst FROM lpa_knn
            UNION
            SELECT nbr_id, src_id FROM lpa_knn
        ),
        l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM lpa_edges){_lpa_rounds}
        SELECT id AS node_id, lbl AS community,
               count(*) OVER (PARTITION BY lbl) AS community_size
        FROM l{LPA_ROUNDS}"""

    # triangles over the same blocked k-NN edges, canonicalized a < b:
    # one wedge join on the middle vertex (a < b < c by construction) and
    # one closing join — each triangle counted exactly once
    sqls["sim_knn_triangles"] = f"""
        WITH tk_bn AS (
            SELECT vec_id, embedding, {_bucket} AS bucket,
                   sqrt({dot_sql('embedding', 'embedding')}) AS norm
            FROM embeddings
        ),
        tk_scored AS (
            SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
                   {dot_sql("a.embedding", "b.embedding")} / (a.norm * b.norm)
                       AS cosine_sim
            FROM tk_bn a JOIN tk_bn b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ),
        tk_knn AS (
            SELECT src_id, nbr_id FROM (
                SELECT src_id, nbr_id,
                       row_number() OVER (
                           PARTITION BY src_id
                           ORDER BY cosine_sim DESC, nbr_id
                       ) AS nbr_rank
                FROM tk_scored
            ) WHERE nbr_rank <= {KNN_K}
        ),
        canon AS (
            SELECT DISTINCT least(src_id, nbr_id) AS a,
                   greatest(src_id, nbr_id) AS b
            FROM tk_knn WHERE src_id <> nbr_id
        ),
        deg AS (
            SELECT node_id, count(*) AS degree FROM (
                SELECT a AS node_id FROM canon
                UNION ALL SELECT b FROM canon
            ) GROUP BY node_id
        ),
        wedges AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM canon e1 JOIN canon e2 ON e1.b = e2.a
            WHERE e1.a < e2.b
        ),
        tris AS (
            SELECT w.a, w.b, w.c
            FROM wedges w JOIN canon e3 ON w.a = e3.a AND w.c = e3.b
        ),
        pn AS (
            SELECT node_id, count(*) AS n_triangles FROM (
                SELECT a AS node_id FROM tris
                UNION ALL SELECT b FROM tris
                UNION ALL SELECT c FROM tris
            ) GROUP BY node_id
        )
        SELECT d.node_id,
               CAST(degree AS BIGINT) AS degree,
               CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles,
               CASE WHEN degree >= 2 THEN
                   ROUND(2.0 * CAST(COALESCE(n_triangles, 0) AS DOUBLE)
                         / (CAST(degree AS DOUBLE)
                            * (CAST(degree AS DOUBLE) - 1.0)), 6)
               END AS clustering_coeff
        FROM deg d LEFT JOIN pn USING (node_id)"""

    # per-community diversity quota: the communities query composed
    # verbatim (can never drift), then the domain_cap rank shape
    from ..operators.graph import DIVERSITY_CAP, DIVERSITY_SEED

    sqls["pipeline_diversity_sample"] = f"""
        SELECT vec_id, community,
               CAST(rank_in_community AS BIGINT) AS rank_in_community
        FROM (
            SELECT node_id AS vec_id, community,
                   row_number() OVER (
                       PARTITION BY community
                       ORDER BY ({md5_long_seeded_sql("node_id", DIVERSITY_SEED)}),
                                node_id
                   ) AS rank_in_community
            FROM ({sqls["sim_knn_communities"]})
        )
        WHERE rank_in_community <= {DIVERSITY_CAP}"""

    # transitive closure of the near-dup pair graph — the recursive-CTE twin
    # of the engine's iterative min-label propagation
    sqls["dedup_clusters"] = f"""
        WITH RECURSIVE {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE},
        {_JACCARD_PAIRS.strip()},
        p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM p
            UNION
            SELECT doc_b, doc_a FROM p
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
        ),
        cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               (doc_id = cluster_id) AS is_keeper
        FROM cc"""

    # quality-aware keeper: the same recursive-CTE closure, argmax by
    # (length DESC, doc_id) instead of min-id
    sqls["pipeline_keep_best"] = f"""
        WITH RECURSIVE {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE},
        {_JACCARD_PAIRS.strip()},
        p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM p
            UNION
            SELECT doc_b, doc_a FROM p
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
        ),
        cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
        sized AS (
            SELECT cc.doc_id, cc.cluster_id,
                   count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
                   length(d.text) AS doc_len,
                   row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY length(d.text) DESC, cc.doc_id
                   ) AS rn
            FROM cc JOIN documents d ON cc.doc_id = d.doc_id
        )
        SELECT cluster_id, cluster_size,
               doc_id AS keep_doc_id,
               CAST(doc_len AS INTEGER) AS keep_len
        FROM sized WHERE rn = 1"""

    # incremental cluster maintenance must converge to exactly the full
    # recompute — same oracle text (the incremental/full identity); the
    # streaming accumulation twin shares the same convergence target
    sqls["dedup_clusters_incremental"] = sqls["dedup_clusters"]
    sqls["stream_clusters_native"] = sqls["dedup_clusters"]

    from ..operators.sampling import SHUFFLE_EXPORT_SEED, SHUFFLE_EXPORT_SHARDS

    # deterministic shuffle-to-shards export
    # (operators/sampling.py::shuffle_to_shards): same seeded-md5 key,
    # shard = key % N, per-shard rank with id tiebreak
    sqls["pipeline_shuffle_export"] = f"""
        WITH keyed AS (
            SELECT doc_id,
                   {md5_long_seeded_sql("CAST(doc_id AS VARCHAR)", SHUFFLE_EXPORT_SEED)}
                       AS shuffle_key
            FROM documents
        )
        SELECT doc_id,
               CAST(shuffle_key % {SHUFFLE_EXPORT_SHARDS} AS INTEGER) AS shard,
               row_number() OVER (
                   PARTITION BY shuffle_key % {SHUFFLE_EXPORT_SHARDS}
                   ORDER BY shuffle_key, doc_id
               ) AS pos,
               shuffle_key
        FROM keyed"""

    sqls["pipeline_split_assign"] = f"""
        WITH b AS (
            SELECT doc_id, lang,
                   ({md5_long_seeded_sql("doc_id", SPLIT_SEED)}) % 100 AS split_bucket
            FROM documents
        )
        SELECT doc_id, lang, split_bucket,
               CASE WHEN split_bucket < {TRAIN_PCT} THEN 'train'
                    WHEN split_bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM b"""

    # different formulation: json_extract_string + FILTER counts
    sqls["wh_payload_json"] = """
        SELECT (json_extract_string(props, '$.k')::INT) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
        FROM events
        GROUP BY 1"""

    # different formulation: conditional aggregation instead of PIVOT
    _pivot_cols = ",\n               ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS \"{t}\""
        for t in REG_EVENT_TYPES
    )
    sqls["wh_pivot"] = f"""
        SELECT user_id % 10 AS user_bucket,
               {_pivot_cols}
        FROM events
        GROUP BY 1"""

    # different formulation: direct long-form counts densified against the
    # bucket × value-list grid (unpivot of a filled pivot keeps 0-cells)
    _types_list = ", ".join(f"'{t}'" for t in REG_EVENT_TYPES)
    sqls["wh_unpivot"] = f"""
        WITH counts AS (
            SELECT user_id % 10 AS user_bucket, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        b AS (SELECT DISTINCT user_id % 10 AS user_bucket FROM events),
        t AS (SELECT unnest([{_types_list}]) AS event_type)
        SELECT b.user_bucket, t.event_type, COALESCE(c.n, 0) AS n
        FROM b CROSS JOIN t
        LEFT JOIN counts c
          ON c.user_bucket = b.user_bucket AND c.event_type = t.event_type"""

    sqls["wh_percentiles"] = """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50_value,
               ROUND(quantile_cont(value, 0.9), 4) AS p90_value,
               ROUND(AVG(value), 4) AS avg_value
        FROM events
        GROUP BY event_type"""

    from .registry import CO_ENGAGE_MIN_USERS, CO_ENGAGE_TOPK

    sqls["wh_co_engagement"] = f"""
        WITH per AS (
            SELECT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS content_id,
                   count(*) AS n_events
            FROM events
            WHERE user_id IS NOT NULL
              AND json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY 1, 2
        ),
        top AS (
            SELECT user_id, content_id FROM (
                SELECT user_id, content_id,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY n_events DESC, content_id
                       ) AS rk
                FROM per
            ) WHERE rk <= {CO_ENGAGE_TOPK}
        )
        SELECT a.content_id AS content_a, b.content_id AS content_b,
               CAST(count(*) AS BIGINT) AS n_common_users
        FROM top a JOIN top b
          ON a.user_id = b.user_id AND a.content_id < b.content_id
        GROUP BY 1, 2
        HAVING count(*) >= {CO_ENGAGE_MIN_USERS}"""

    from ..operators.spatial import (
        COORD_MOD,
        COORD_SCALE,
        SPATIAL_CELL_CAP,
        SPATIAL_EPS,
    )

    _px = md5_long_seeded_sql("CAST(event_id AS VARCHAR)", "px")
    _py = md5_long_seeded_sql("CAST(event_id AS VARCHAR)", "py")

    def _spatial_pairs_sql(_e) -> str:
        # _e: a float literal or an SQL scalar expression string (the
        # adaptive-eps path embeds sqrt(...count...) — verified to produce
        # the bit-identical double the Python side computes)
        return f"""
        WITH pts AS (
            SELECT event_id AS point_id,
                   (({_px}) % {COORD_MOD}) / {COORD_SCALE} AS x,
                   (({_py}) % {COORD_MOD}) / {COORD_SCALE} AS y
            FROM events
        ),
        cells AS (
            SELECT point_id, x, y,
                   CAST(floor(x / ({_e})) AS BIGINT) AS cx,
                   CAST(floor(y / ({_e})) AS BIGINT) AS cy
            FROM pts
        ),
        hot AS (
            SELECT cx, cy FROM cells GROUP BY cx, cy
            HAVING count(*) > {SPATIAL_CELL_CAP}
        ),
        kept AS (SELECT c.* FROM cells c ANTI JOIN hot USING (cx, cy)),
        offs AS (
            SELECT a.dx, b.dy
            FROM (SELECT unnest([-1, 0, 1]::BIGINT[]) AS dx) a
            CROSS JOIN (SELECT unnest([-1, 0, 1]::BIGINT[]) AS dy) b
        ),
        ea AS (
            SELECT point_id AS id_a, x AS xa, y AS ya,
                   cx + dx AS jx, cy + dy AS jy
            FROM kept CROSS JOIN offs
        ),
        eb AS (
            SELECT point_id AS id_b, x AS xb, y AS yb,
                   cx AS jx, cy AS jy
            FROM kept
        )
        SELECT id_a, id_b,
               round(sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)), 6)
                   AS dist
        FROM ea JOIN eb USING (jx, jy)
        WHERE id_a < id_b
          AND (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
              <= ({_e}) * ({_e})"""

    sqls["wh_spatial_join"] = _spatial_pairs_sql(float(SPATIAL_EPS))

    from ..operators.spatial import (
        COORD_AREA,
        DBSCAN_MIN_PTS,
        DBSCAN_TARGET_DEG,
    )

    # density-adaptive eps: the same IEEE expression adaptive_eps computes
    # (sqrt of 2.5 * area / (pi * n)) — verified bit-identical to Python
    _adaptive_eps_sql = (
        f"(SELECT sqrt({DBSCAN_TARGET_DEG} * {COORD_AREA!r}"
        f" / (pi() * count(*))) FROM events)"
    )

    # DBSCAN: the spatial pair SQL composed verbatim, then degree/core,
    # recursive-CTE closure over the core subgraph, min-cluster border
    # attachment — mirroring operators/spatial.py::dbscan exactly
    sqls["wh_dbscan"] = f"""
        WITH RECURSIVE p AS (
            SELECT id_a, id_b FROM ({_spatial_pairs_sql(_adaptive_eps_sql)})
        ),
        sym AS (
            SELECT id_a, id_b FROM p
            UNION ALL
            SELECT id_b, id_a FROM p
        ),
        deg AS (SELECT id_a AS pid, count(*) AS d FROM sym GROUP BY id_a),
        core AS (SELECT pid FROM deg WHERE d >= {DBSCAN_MIN_PTS} - 1),
        ce AS (
            SELECT s.id_a, s.id_b FROM sym s
            JOIN core a ON s.id_a = a.pid
            JOIN core b ON s.id_b = b.pid
        ),
        reach(node, lbl) AS (
            SELECT id_a, id_a FROM ce
            UNION
            SELECT e.id_a, r.lbl FROM ce e JOIN reach r ON e.id_b = r.node
        ),
        cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
        corec AS (
            SELECT c.pid, COALESCE(cc.cluster_id, c.pid) AS cluster_id
            FROM core c LEFT JOIN cc ON c.pid = cc.node
        ),
        borderc AS (
            SELECT s.id_a AS pid, min(k.cluster_id) AS cluster_id
            FROM sym s
            ANTI JOIN core a ON s.id_a = a.pid
            JOIN corec k ON s.id_b = k.pid
            GROUP BY s.id_a
        )
        SELECT pid AS point_id, cluster_id, 'core' AS role FROM corec
        UNION ALL
        SELECT pid, cluster_id, 'border' FROM borderc"""

    from .registry import (
        NEG_AFFINE_STEP,
        NEG_POOL_PCT,
        NEG_SAMPLE_SEED,
        NEG_SAMPLES_K,
    )

    _uh = md5_long_seeded_sql("CAST(user_id AS VARCHAR)", NEG_SAMPLE_SEED)
    sqls["wh_negative_samples"] = f"""
        WITH users AS (
            SELECT user_id, {_uh} AS uh FROM (
                SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
            )
        ),
        ndim AS (SELECT count(*) AS n FROM part),
        content AS (
            SELECT p_partkey AS content_id,
                   row_number() OVER (ORDER BY p_partkey) - 1 AS r
            FROM part
        ),
        inter AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS content_id
            FROM events
            WHERE user_id IS NOT NULL
              AND json_extract_string(props, '$.k') IS NOT NULL
        ),
        cand AS (
            SELECT u.user_id, c.content_id,
                   (u.uh + c.r * {NEG_AFFINE_STEP}) % ndim.n AS pos
            FROM users u CROSS JOIN content c CROSS JOIN ndim
            WHERE (u.uh + c.r * {NEG_AFFINE_STEP}) % ndim.n
                  < ndim.n * {NEG_POOL_PCT} // 100
        ),
        neg AS (
            SELECT cand.user_id, cand.content_id, cand.pos
            FROM cand ANTI JOIN inter USING (user_id, content_id)
        ),
        ranked AS (
            SELECT user_id, content_id,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY pos, content_id
                   ) AS neg_rank
            FROM neg
        )
        SELECT user_id, content_id, CAST(neg_rank AS BIGINT) AS neg_rank
        FROM ranked WHERE neg_rank <= {NEG_SAMPLES_K}"""

    from .registry import CONVERSION_PATTERN, EVENT_LETTER

    _letter_case = (
        "CASE event_type "
        + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in EVENT_LETTER.items())
        + " ELSE NULL END"
    )
    sqls["wh_event_pattern"] = f"""
        WITH lt AS (
            SELECT user_id, ts, event_id, {_letter_case} AS l
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        j AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   string_agg(l, '' ORDER BY ts, event_id) AS journey
            FROM lt GROUP BY user_id
        )
        SELECT user_id, n_events,
               CAST(length(journey) AS INTEGER) AS journey_len,
               CAST(len(regexp_extract_all(journey, '{CONVERSION_PATTERN}'))
                    AS INTEGER) AS n_conversions
        FROM j"""

    sqls["wh_winsorize"] = """
        WITH caps AS (
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.05), 4) AS lo,
                   ROUND(quantile_cont(value, 0.95), 4) AS hi
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               ROUND(value, 4) AS value,
               ROUND(least(greatest(value, lo), hi), 4) AS value_winsorized,
               (value < lo OR value > hi) AS clipped
        FROM events e JOIN caps USING (event_type)
        WHERE value IS NOT NULL"""

    sqls["wh_explode_tokens"] = f"""
        WITH {TOKS_CTE},
        t AS (SELECT unnest(toks) AS token FROM toks)
        SELECT token, COUNT(*) AS n
        FROM t
        GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 50"""

    sqls["wh_scalar_subquery"] = """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                    AS DOUBLE) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 5
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)"""

    # different formulation: arithmetic band assignment instead of a range join
    sqls["wh_range_join"] = f"""
        SELECT LEAST(CAST(FLOOR(l_extendedprice / {PRICE_BAND_WIDTH}) AS INT),
                     {PRICE_BANDS - 1}) AS band,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM lineitem
        WHERE l_extendedprice >= 0
        GROUP BY 1"""

    sqls["wh_returned_items"] = """
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20"""

    sqls["wh_promo_revenue"] = """
        SELECT CAST(ROUND(100 * SUM(CASE WHEN p_type = 'PROMO' THEN rev
                                         ELSE 0 END) / SUM(rev), 4) AS DOUBLE)
                   AS promo_pct,
               CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                    AS DOUBLE) AS promo_revenue,
               CAST(SUM(rev) AS DOUBLE) AS total_revenue
        FROM (SELECT p_type,
                     CAST(l_extendedprice AS DECIMAL(12,2)) *
                     (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-03-01'
                AND l_shipdate < TIMESTAMP '1996-04-01') t"""

    # different formulation: HAVING + IN instead of the aggregate->semi-join
    sqls["wh_large_volume_orders"] = f"""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(CAST(l_quantity AS DECIMAL(12,2)))
                                    > {LARGE_ORDER_QTY})
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100"""

    sqls["wh_ship_delay"] = """
        SELECT o_orderpriority,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(delay AS DECIMAL(18,0)))::DOUBLE
                          / COUNT(*), 4) AS DOUBLE) AS avg_delay_days,
               CAST(MAX(delay) AS INT) AS max_delay_days,
               COUNT(CASE WHEN delay > 365 THEN 1 END) AS n_over_year
        FROM (SELECT o_orderpriority,
                     date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) AS delay
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
        GROUP BY o_orderpriority"""

    # different formulation: self-join on version rank instead of lead()
    sqls["cdc_scd2_dim"] = with_versions("""
        , ranked AS (
            SELECT content_id, version_title, version_length_seconds,
                   version_ts,
                   row_number() OVER (PARTITION BY content_id
                                      ORDER BY version_ts) AS rn
            FROM versions
        )
        SELECT a.content_id, a.version_title, a.version_length_seconds,
               a.version_ts AS valid_from,
               b.version_ts AS valid_to,
               b.version_ts IS NULL AS is_current
        FROM ranked a
        LEFT JOIN ranked b
          ON a.content_id = b.content_id AND b.rn = a.rn + 1""")

    # the streaming SCD2 maintenance must converge to exactly the batch
    # build — same oracle text, so the incremental/full identity is what
    # the differential proves
    sqls["stream_scd2_native"] = sqls["cdc_scd2_dim"]

    from .registry import (
        DORMANT_CODES,
        IMPORTANT_PART_FRACTION,
        LATE_SHIP_DAYS,
        MKT_SHARE_NATION,
        PROFIT_COST_FACTOR,
        TOPN_PER_GROUP,
        TRADE_NATION_A,
        TRADE_NATION_B,
    )

    sqls["wh_customer_distribution"] = """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""

    # different formulation: scalar-subquery MAX instead of the 1-row join
    sqls["wh_top_supplier"] = """
        WITH revenue0 AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                       (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue0 ON s_suppkey = l_suppkey
        WHERE total = (SELECT MAX(total) FROM revenue0)
        ORDER BY s_suppkey"""

    # different formulation: correlated-min subquery instead of agg+join-back
    sqls["wh_min_cost_supplier"] = """
        WITH unit AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem WHERE l_quantity > 0
            GROUP BY l_partkey, l_suppkey),
        eligible AS (
            SELECT l_partkey, unit_cost, s_acctbal, s_name, n_name
            FROM unit
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM eligible e JOIN part ON e.l_partkey = p_partkey
        WHERE p_type = 'LARGE' AND p_size <= 25
          AND unit_cost = (SELECT MIN(e2.unit_cost) FROM eligible e2
                           WHERE e2.l_partkey = e.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100"""

    sqls["wh_nation_trade_volume"] = f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '{TRADE_NATION_A}' AND
                n2.n_name = '{TRADE_NATION_B}')
            OR (n1.n_name = '{TRADE_NATION_B}' AND
                n2.n_name = '{TRADE_NATION_A}'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3"""

    sqls["wh_market_share"] = f"""
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               CAST(SUM(CASE WHEN supp_nation = '{MKT_SHARE_NATION}'
                             THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END)
                    AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
               CAST(SUM(rev) AS DOUBLE) AS total_revenue
        FROM (SELECT o_orderdate, n2.n_name AS supp_nation,
                     CAST(l_extendedprice AS DECIMAL(12,2)) *
                     (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01') t
        GROUP BY o_year
        ORDER BY o_year"""

    sqls["wh_product_profit"] = f"""
        SELECT n_name AS nation,
               CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (1 - CAST(l_discount AS DECIMAL(12,2)))
                        - CAST(l_quantity AS DECIMAL(12,2)) *
                          CAST(p_retailprice AS DECIMAL(12,2)) *
                          CAST({PROFIT_COST_FACTOR} AS DECIMAL(3,1)))
                    AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC"""

    # different formulation: HAVING vs scalar subquery instead of 1-row join
    sqls["wh_important_parts"] = f"""
        WITH scoped AS (
            SELECT p_partkey AS pk,
                   CAST(l_quantity AS DECIMAL(12,2)) *
                   CAST(p_retailprice AS DECIMAL(12,2)) AS val
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE')
        SELECT pk AS p_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
        FROM scoped
        GROUP BY pk
        HAVING SUM(val) > (SELECT SUM(val) FROM scoped) *
                          CAST({IMPORTANT_PART_FRACTION} AS DECIMAL(6,4))
        ORDER BY part_value DESC, p_partkey"""

    # different formulation: NOT IN subquery instead of the left-anti join
    sqls["wh_supplier_part_variety"] = """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 1000)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

    sqls["wh_disjunctive_join"] = """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
               AND l_quantity BETWEEN 20 AND 40)"""

    # different formulation: correlated EXISTS / NOT EXISTS instead of the
    # decorrelated semi/anti joins
    sqls["wh_late_suppliers"] = f"""
        SELECT s_suppkey, s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
          AND date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l1.l_shipdate AS DATE)) > {LATE_SHIP_DAYS}
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1
              FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND date_diff('day', CAST(o3.o_orderdate AS DATE),
                              CAST(l3.l_shipdate AS DATE)) > {LATE_SHIP_DAYS})
        GROUP BY s_suppkey, s_name
        ORDER BY numwait DESC, s_suppkey"""

    from ..operators.dedup import CONTAM_BENCH_MOD, CONTAM_MIN_SHARED
    from ..operators.text_analysis import (
        DUP_LINE_MAX_FRAC,
        TOP_BIGRAM_MAX_FRAC,
    )

    sqls["text_repetition"] = f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(list_transform(string_split(text, chr(10)),
                                              x -> trim(x)),
                               x -> x <> '') AS lines,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents),
        lb AS (
            SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
                   CASE WHEN len(lines) > 0
                        THEN 1.0 - len(list_distinct(lines)) / len(lines)
                        ELSE 0.0 END AS dup_line_frac,
                   t
            FROM base),
        bi AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS gram
            FROM lb),
        gc AS (
            SELECT doc_id, CAST(MAX(n) AS DOUBLE) / SUM(n) AS tbf
            FROM (SELECT doc_id, gram, COUNT(*) AS n FROM bi
                  GROUP BY doc_id, gram) c
            GROUP BY doc_id)
        SELECT l.doc_id, n_lines, dup_line_frac,
               COALESCE(tbf, 0.0) AS top_bigram_frac,
               (dup_line_frac <= {DUP_LINE_MAX_FRAC}
                AND COALESCE(tbf, 0.0) <= {TOP_BIGRAM_MAX_FRAC})
                   AS repetition_ok
        FROM lb l LEFT JOIN gc ON l.doc_id = gc.doc_id"""

    _bench_pred = (
        f"{md5_long_seeded_sql('CAST(doc_id AS VARCHAR)', 'bench')}"
        f" % {CONTAM_BENCH_MOD} = 0"
    )
    sqls["pipeline_decontaminate"] = f"""
        WITH {TOKS_CTE}, {SHINGLES_CTE}, {EXPLODED_CTE},
        bench_ids AS (SELECT doc_id FROM documents WHERE {_bench_pred}),
        bg AS (SELECT DISTINCT shingle FROM ex
               WHERE doc_id IN (SELECT doc_id FROM bench_ids))
        SELECT doc_id, COUNT(*) AS n_shared_grams
        FROM ex
        WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)
          AND shingle IN (SELECT shingle FROM bg)
        GROUP BY doc_id
        HAVING COUNT(*) >= {CONTAM_MIN_SHARED}"""

    sqls["wh_customer_quantiles"] = """
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                              RANGE BETWEEN 100 PRECEDING
                                        AND 100 FOLLOWING) AS peers_100
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)"""

    from .registry import PROFILE_COLUMNS

    sqls["profile_embeddings"] = f"""
        WITH n AS (
            SELECT embedding,
                   sqrt({dot_sql("embedding", "embedding")}) AS norm,
                   len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) > 0
                       AS has_nan
            FROM embeddings
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_vec,
               CAST(MIN(len(embedding)) AS BIGINT) AS dim_min,
               CAST(MAX(len(embedding)) AS BIGINT) AS dim_max,
               CAST(SUM(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nan_vec,
               CAST(SUM(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_norm,
               ROUND(MIN(norm), 6) AS min_norm,
               ROUND(MAX(norm), 6) AS max_norm,
               CAST(SUM(CAST(norm AS DECIMAL(25,6))) AS DOUBLE) AS sum_norm
        FROM n"""

    sqls["profile_documents"] = "\n        UNION ALL\n".join(
        f"""
        SELECT '{c}' AS "column", COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM documents"""
        for c in PROFILE_COLUMNS
    )

    # drift report: the profile text per column, once per snapshot half
    def _prof_half(pred: str, suffix: str) -> str:
        return "\n            UNION ALL\n".join(
            f"""
            SELECT '{c}' AS "column", COUNT(*) AS rows_{suffix},
                   CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS nulls_{suffix},
                   COUNT(DISTINCT {c}) AS distinct_{suffix},
                   CAST(MIN({c}) AS VARCHAR) AS min_{suffix},
                   CAST(MAX({c}) AS VARCHAR) AS max_{suffix}
            FROM documents WHERE {pred}"""
            for c in PROFILE_COLUMNS
        )

    sqls["profile_drift"] = f"""
        WITH po AS ({_prof_half("doc_id % 2 = 0", "old")}),
        pn AS ({_prof_half("doc_id % 2 = 1", "new")})
        SELECT po."column", rows_old, rows_new, nulls_old, nulls_new,
               distinct_old, distinct_new,
               distinct_new - distinct_old AS distinct_delta,
               (NOT (min_old IS NOT DISTINCT FROM min_new))
               OR (NOT (max_old IS NOT DISTINCT FROM max_new))
                   AS range_changed
        FROM po JOIN pn ON po."column" = pn."column" """

    from ..sources.generator import (
        DEVICES,
        DURATION_BANDS,
        EVENT_WEIGHTS,
        TRAILING_WINDOW_S,
    )
    from .registry import GEN_CONTENT_N, GEN_WORKLOAD_N

    def _h(expr: str, seed: str) -> str:
        return md5_long_seeded_sql(f"CAST({expr} AS VARCHAR)", seed)

    def _uuidish(expr: str, seed: str) -> str:
        hx = f"md5('{seed}' || CAST({expr} AS VARCHAR))"
        return (
            f"concat_ws('-', substr({hx},1,8), substr({hx},9,4), "
            f"substr({hx},13,4), substr({hx},17,4), substr({hx},21,12))"
        )

    def _u(expr: str, seed: str) -> str:
        return f"(CAST({_h(expr, seed)} % 1000000 AS DOUBLE) / 1000000)"

    _etype_case = "CASE"
    _acc = 0.0
    _items = list(EVENT_WEIGHTS.items())
    for _name, _w in _items[:-1]:
        _acc += _w
        _etype_case += f" WHEN {_u('i', 'events:etype')} < {_acc!r} THEN '{_name}'"
    _etype_case += f" ELSE '{_items[-1][0]}' END"
    _devices = ", ".join(f"'{d}'" for d in DEVICES)
    _dur_case = "CASE"
    for _name, (_lo, _hi) in DURATION_BANDS.items():
        _dur_case += (
            f" WHEN event_type = '{_name}' THEN CAST(FLOOR(length_seconds * 1000"
            f" * ({_lo!r} + dur_u * {_hi - _lo!r})) AS INT)"
        )
    _dur_case += " ELSE NULL END"
    sqls["gen_workload"] = f"""
        WITH content AS (
            SELECT {_uuidish('t.i', 'content:id')} AS cid,
                   CAST(180 + {_h('t.i', 'content:len')} % 5221 AS INT)
                       AS length_seconds
            FROM (SELECT unnest(range({GEN_CONTENT_N})) AS i) t),
        dim AS (
            SELECT cid, length_seconds,
                   row_number() OVER (
                       ORDER BY {md5_long_seeded_sql('cid', 'dimorder')}
                                % 1099511627776, cid) - 1 AS idx
            FROM content),
        ev AS (
            SELECT t.i AS id,
                   CAST({_h('t.i', 'events:content')} % {GEN_CONTENT_N} AS INT)
                       AS pick,
                   {_uuidish(_h('t.i', 'events:user') + ' % 10000',
                             'events:userid')} AS user_id,
                   {_etype_case} AS event_type,
                   CAST({_h('t.i', 'events:ts')} % {TRAILING_WINDOW_S} AS INT)
                       AS ts_offset_s,
                   {_u('t.i', 'events:dur')} AS dur_u,
                   list_extract([{_devices}],
                                CAST({_h('t.i', 'events:device')} % 6 + 1
                                     AS INT)) AS device
            FROM (SELECT unnest(range({GEN_WORKLOAD_N})) AS i) t)
        SELECT id, cid AS content_id, user_id, event_type, ts_offset_s,
               {_dur_case} AS duration_ms, device
        FROM ev JOIN dim ON pick = idx"""

    _codes = ", ".join(f"'{c}'" for c in DORMANT_CODES)
    sqls["wh_dormant_customers"] = f"""
        WITH scoped AS (
            SELECT c_custkey, c_acctbal,
                   substring(c_name, -1, 1) AS cntrycode
            FROM customer
            WHERE substring(c_name, -1, 1) IN ({_codes}))
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   AS totacctbal
        FROM scoped
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                                       AS DOUBLE) / COUNT(*)
                           FROM scoped WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY cntrycode
        ORDER BY cntrycode"""

    # different formulation: QUALIFY instead of the subquery rank filter
    sqls["wh_topn_per_group"] = f"""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC,
                                                o_orderkey ASC) AS INT)
                   AS rank_in_cust
        FROM orders
        QUALIFY rank_in_cust <= {TOPN_PER_GROUP}"""

    sqls["sim_quantize_int8"] = """
        WITH scaled AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                                           x -> abs(x::DOUBLE))) / 127 AS scale
            FROM embeddings
        )
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS n_dims,
               scale,
               array_to_string(
                   CASE WHEN scale > 0
                        THEN list_transform(embedding,
                                            x -> CAST(round(x::DOUBLE / scale) AS INT))
                        ELSE list_transform(embedding, x -> 0) END,
                   '_') AS q_codes,
               CASE WHEN scale > 0
                    THEN list_max(list_transform(embedding,
                         x -> abs(round(x::DOUBLE / scale) * scale - x::DOUBLE)))
                    ELSE list_max(list_transform(embedding,
                                                 x -> abs(x::DOUBLE))) END
                   AS max_abs_err
        FROM scaled"""

    from ..operators.text_analysis import EMAIL_PATTERN, URL_PATTERN, WS_PATTERN

    sqls["text_clean"] = f"""
        WITH stripped AS (
            SELECT doc_id, lang, text,
                   regexp_replace(regexp_replace(text, '{URL_PATTERN}', ' ', 'g'),
                                  '{EMAIL_PATTERN}', ' ', 'g') AS s
            FROM documents
        )
        SELECT doc_id, lang,
               lower(trim(regexp_replace(s, '{WS_PATTERN}', ' ', 'g')))
                   AS clean_text,
               CAST(length(text) AS INT) AS n_chars_raw,
               CAST(length(trim(regexp_replace(s, '{WS_PATTERN}', ' ', 'g')))
                    AS INT) AS n_chars_clean,
               CAST(len(regexp_extract_all(text, '{URL_PATTERN}')) AS BIGINT)
                   AS n_urls,
               CAST(len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS BIGINT)
                   AS n_emails
        FROM stripped"""

    from ..operators.packing import PACK_BUDGET, PACK_SEED, PACK_SHARDS

    sqls["pipeline_pack_sequences"] = f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(({md5_long_seeded_sql("doc_id", PACK_SEED)})
                        % {PACK_SHARDS} AS INT) AS shard,
                   CAST(len(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS token_offset
            FROM toks
        )
        SELECT doc_id, shard, n_tokens, token_offset,
               token_offset // {PACK_BUDGET} AS pack_id,
               token_offset % {PACK_BUDGET} AS offset_in_pack
        FROM cum"""

    from ..operators.packing import CHUNK_STRIDE, CHUNK_WINDOW

    sqls["pipeline_chunk_documents"] = f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        s AS (
            SELECT doc_id, toks,
                   unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(start AS BIGINT) AS start_tok,
               CAST(len(list_slice(toks, start + 1, start + {CHUNK_WINDOW}))
                    AS BIGINT) AS n_tokens,
               array_to_string(list_slice(toks, start + 1, start + {CHUNK_WINDOW}),
                               ' ') AS chunk_text
        FROM s"""

    # T5 span corruption, step for step with operators/masking.py: block
    # flags from the seeded md5 draw, lag-window span starts, running-sum
    # sentinel numbering, and NULL-safe ordered reassembly (DuckDB's list()
    # skips NULL inputs like every aggregate — an all-NULL group yields NULL,
    # not [], so the assembled strings COALESCE to '' to match Spark)
    _mask_expr = md5_long_sql(
        "'span' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos // 3 AS VARCHAR)"
    )
    _mask_flag = f"({_mask_expr} % 100) < 15"
    sqls["pipeline_span_corrupt"] = f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        p AS (
            SELECT doc_id, s.p AS pos, s.tok AS token
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) + 1),
                           i -> {{'p': i - 1, 'tok': toks[i]}})) AS s
                FROM t WHERE len(toks) > 0
            )
        ),
        f AS (
            SELECT doc_id, pos, token, {_mask_flag} AS flag
            FROM p
        ),
        w AS (
            SELECT *,
                   flag AND NOT COALESCE(
                       lag(flag) OVER (PARTITION BY doc_id ORDER BY pos),
                       FALSE) AS is_start
            FROM f
        ),
        s AS (
            SELECT *,
                   SUM(CASE WHEN is_start THEN 1 ELSE 0 END) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) - 1 AS span_id
            FROM w
        ),
        pieces AS (
            SELECT doc_id, pos, flag, is_start,
                   CASE WHEN NOT flag THEN token
                        WHEN is_start THEN '<extra_id_' || span_id || '>'
                   END AS piece_in,
                   CASE WHEN is_start
                            THEN '<extra_id_' || span_id || '> ' || token
                        WHEN flag THEN token
                   END AS piece_tgt
            FROM s
        ),
        g AS (
            SELECT doc_id,
                   COUNT(*) AS n_tokens,
                   SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS n_masked,
                   SUM(CASE WHEN is_start THEN 1 ELSE 0 END) AS n_spans,
                   COALESCE(array_to_string(list_filter(
                       list(piece_in ORDER BY pos), x -> x IS NOT NULL),
                       ' '), '') AS input_text,
                   COALESCE(array_to_string(list_filter(
                       list(piece_tgt ORDER BY pos), x -> x IS NOT NULL),
                       ' '), '') AS target_core
            FROM pieces GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_masked AS BIGINT) AS n_masked,
               CAST(n_spans AS BIGINT) AS n_spans,
               input_text,
               CASE WHEN target_core = ''
                    THEN '<extra_id_0>'
                    ELSE target_core || ' <extra_id_' || n_spans || '>'
               END AS target_text
        FROM g"""

    sqls["wh_forecast_revenue"] = """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN
              CAST('0.05' AS DECIMAL(12,2)) AND CAST('0.07' AS DECIMAL(12,2))
          AND l_quantity < 24"""

    # different formulation: correlated EXISTS instead of the semi join
    sqls["wh_order_priority"] = f"""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND CAST(l.l_shipdate AS DATE) >
                            CAST(o.o_orderdate AS DATE)
                            + INTERVAL {ORDER_PRIORITY_LATE_DAYS} DAY)
        GROUP BY o_orderpriority"""

    # different formulation: correlated scalar subquery instead of the
    # decorrelated per-part aggregate join
    sqls["wh_small_qty_revenue"] = f"""
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 4)
                    AS DOUBLE) AS avg_yearly,
               COUNT(*) AS n_small
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{SMALL_QTY_BRAND}'
          AND CAST(l.l_quantity AS DECIMAL(12,2)) <
              (SELECT CAST('{SMALL_QTY_FRACTION}' AS DECIMAL(12,2)) *
                      AVG(CAST(l2.l_quantity AS DECIMAL(12,2)))
               FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)"""

    # different formulation: IN subqueries instead of the semi-join chain
    sqls["wh_excess_shipments"] = f"""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%green%')
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {EXCESS_SHIP_QTY})
        ORDER BY s_suppkey"""

    sqls["pipeline_snapshot_diff"] = f"""
        WITH v1 AS (
            SELECT doc_id, {md5_long_sql("text")} AS h1
            FROM documents WHERE doc_id % 17 <> 0
        ),
        v2 AS (
            SELECT doc_id,
                   {md5_long_sql("CASE WHEN doc_id % 13 = 0 THEN 'v2 ' || text ELSE text END")} AS h2
            FROM documents
        )
        SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
               CASE WHEN v1.h1 IS NULL THEN 'added'
                    WHEN v2.h2 IS NULL THEN 'removed'
                    WHEN v1.h1 <> v2.h2 THEN 'changed' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        WHERE (CASE WHEN v1.h1 IS NULL THEN 'added'
                    WHEN v2.h2 IS NULL THEN 'removed'
                    WHEN v1.h1 <> v2.h2 THEN 'changed' END) IS NOT NULL"""

    from ..operators.sampling import DOMAIN_CAP, DOMAIN_CAP_SEED

    sqls["pipeline_domain_cap"] = f"""
        SELECT doc_id, domain, CAST(rank_in_domain AS BIGINT) AS rank_in_domain
        FROM (
            SELECT doc_id, source AS domain,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY ({md5_long_seeded_sql("doc_id", DOMAIN_CAP_SEED)}),
                                doc_id
                   ) AS rank_in_domain
            FROM documents
        )
        WHERE rank_in_domain <= {DOMAIN_CAP}"""

    sqls["pipeline_sample_stratified"] = f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE ({md5_long_seeded_sql("doc_id", STRAT_SEED)}) % 100 <
              (CASE WHEN lang = 'en' THEN {STRAT_RATE_EN}
                    ELSE {STRAT_RATE_OTHER} END)"""

    sqls["dedup_lsh_measure"] = f"""
        WITH truth AS (SELECT doc_a, doc_b FROM ({sqls["dedup_ngram_jaccard"]})),
        lsh AS (SELECT doc_a, doc_b, 1 AS _hit FROM ({sqls["dedup_minhash_lsh"]}))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
               CAST(COALESCE(SUM(_hit), 0) AS BIGINT) AS n_found,
               ROUND(CAST(COALESCE(SUM(_hit), 0) AS DOUBLE) / COUNT(*), 6)
                   AS recall
        FROM truth LEFT JOIN lsh USING (doc_a, doc_b)"""

    sqls["pipeline_dedup_report"] = f"""
        WITH ex AS (SELECT * FROM ({sqls["dedup_exact"]})),
        exact_losers AS (
            SELECT d.doc_id
            FROM documents d
            JOIN ex ON {md5_long_sql("d.text")} = ex.text_hash
            WHERE d.doc_id <> ex.keep_doc_id
        ),
        near_losers AS (
            SELECT DISTINCT doc_b AS doc_id
            FROM ({sqls["dedup_ngram_jaccard"]})
        )
        SELECT doc_id, 'exact' AS reason FROM exact_losers
        UNION ALL
        SELECT doc_id, 'near' AS reason FROM near_losers
        WHERE doc_id NOT IN (SELECT doc_id FROM exact_losers)"""

    from ..operators.sampling import LANG_BALANCE_SEED
    from ..operators.text_analysis import TFIDF_TOP_K

    sqls["text_tfidf_terms"] = f"""
        WITH base AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS term
            FROM documents
        ),
        tfreq AS (
            SELECT doc_id, term, count(*) AS tf FROM base GROUP BY 1, 2
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tfreq GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tfreq.doc_id, tfreq.term,
                   CAST(tfreq.tf AS BIGINT) AS tf,
                   CAST(dfreq.df AS BIGINT) AS df,
                   ROUND(CAST(tfreq.tf AS DOUBLE)
                         * ln(CAST(n_docs + 1 AS DOUBLE)
                              / CAST(dfreq.df + 1 AS DOUBLE)), 6) AS score
            FROM tfreq JOIN dfreq USING (term), nd
        )
        SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
            FROM scored
        )
        WHERE rnk <= {TFIDF_TOP_K}"""

    sqls["text_ngram_diversity"] = """
        WITH t AS (
            SELECT source,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        g AS (
            SELECT source, 1 AS n, unnest(toks) AS gram FROM t
            UNION ALL
            SELECT source, 2,
                   unnest(CASE WHEN len(toks) >= 2 THEN
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                   ELSE []::VARCHAR[] END)
            FROM t
            UNION ALL
            SELECT source, 3,
                   unnest(CASE WHEN len(toks) >= 3 THEN
                       list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE []::VARCHAR[] END)
            FROM t
        ),
        occ AS (
            SELECT source, n, gram, count(*) AS occ FROM g GROUP BY 1, 2, 3
        )
        SELECT source, CAST(n AS BIGINT) AS n,
               CAST(sum(occ) AS BIGINT) AS total_ngrams,
               CAST(count(*) AS BIGINT) AS distinct_ngrams,
               ROUND(CAST(count(*) AS DOUBLE) / CAST(sum(occ) AS DOUBLE), 6)
                   AS diversity
        FROM occ GROUP BY 1, 2"""

    sqls["pipeline_lang_balance"] = f"""
        WITH fl AS (
            SELECT min(cnt) AS floor_n
            FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)
        ),
        r AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ({md5_long_seeded_sql("doc_id", LANG_BALANCE_SEED)}),
                                doc_id
                   ) AS rank_in_lang
            FROM documents
        )
        SELECT doc_id, lang, CAST(rank_in_lang AS BIGINT) AS rank_in_lang
        FROM r, fl WHERE rank_in_lang <= floor_n"""

    from ..operators.dedup import CDC_DIVISOR, CDC_GRAM

    _cdc_gram_md5 = md5_long_sql(f"substr(text, CAST(i AS INT), {CDC_GRAM})")
    _cdc_chunks_sql = f"""
        WITH b AS (
            SELECT doc_id, text, len(text) AS n,
                   CASE WHEN len(text) >= {CDC_GRAM} THEN
                       list_transform(
                           list_filter(range(1, len(text) - {CDC_GRAM} + 2),
                                       i -> ({_cdc_gram_md5}) % {CDC_DIVISOR} = 0),
                           i -> i + {CDC_GRAM} - 1)
                   ELSE []::BIGINT[] END AS cuts0
            FROM documents WHERE len(text) >= 1
        ),
        c AS (
            SELECT doc_id, text,
                   CASE WHEN len(cuts0) = 0 OR cuts0[-1] <> n
                        THEN list_append(cuts0, n)
                        ELSE cuts0 END AS cuts
            FROM b
        ),
        ch AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(cuts) + 1),
                       j -> struct_pack(
                           chunk_idx := j - 1,
                           chunk := substr(text,
                               CAST(CASE WHEN j = 1 THEN 1
                                         ELSE cuts[j-1] + 1 END AS INT),
                               CAST(cuts[j] - CASE WHEN j = 1 THEN 0
                                                   ELSE cuts[j-1] END AS INT))
                       ))) AS s
            FROM c
        )
        SELECT doc_id, CAST(s.chunk_idx AS BIGINT) AS chunk_idx,
               {md5_long_sql("s.chunk")} AS chunk_hash,
               CAST(len(s.chunk) AS BIGINT) AS chunk_len
        FROM ch"""

    sqls["dedup_cdc_chunks"] = _cdc_chunks_sql

    sqls["dedup_cdc_report"] = f"""
        WITH chtbl AS ({_cdc_chunks_sql}),
        sh AS (
            SELECT chunk_hash FROM chtbl
            GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
        ),
        fl AS (
            SELECT chtbl.doc_id, chtbl.chunk_len,
                   CASE WHEN sh.chunk_hash IS NOT NULL THEN 1 ELSE 0 END
                       AS is_shared
            FROM chtbl LEFT JOIN sh ON chtbl.chunk_hash = sh.chunk_hash
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(is_shared) AS BIGINT) AS n_shared_chunks,
               CAST(sum(chunk_len) AS BIGINT) AS total_chars,
               CAST(sum(is_shared * chunk_len) AS BIGINT) AS shared_chars,
               ROUND(CAST(sum(is_shared * chunk_len) AS DOUBLE)
                     / CAST(sum(chunk_len) AS DOUBLE), 6) AS dup_ratio
        FROM fl GROUP BY doc_id"""

    from ..operators.text_analysis import BOILERPLATE_MAX_DF_FRAC

    _boiler_aug = """
        aug AS (
            SELECT doc_id, concat_ws(chr(10),
                CASE WHEN doc_id % 2 = 0
                     THEN 'subscribe to our newsletter today' END,
                text,
                CASE WHEN doc_id % 5 = 0
                     THEN 'all rights reserved by the publisher' END,
                CASE WHEN doc_id % 7 = 3
                     THEN 'editor note ' || CAST(doc_id % 4 AS VARCHAR) END
            ) AS text
            FROM documents
        )"""

    sqls["text_boilerplate_strip"] = f"""
        WITH {_boiler_aug},
        l2 AS (
            SELECT doc_id, s.pos AS pos, s.line AS line
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ls) + 1),
                           i -> struct_pack(pos := i, line := ls[i]))) AS s
                FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                      FROM aug)
            )
        ),
        nd AS (SELECT count(*) AS n FROM documents),
        hot AS (
            SELECT line
            FROM (SELECT line, count(DISTINCT doc_id) AS df
                  FROM l2 GROUP BY line), nd
            WHERE df > n * {BOILERPLATE_MAX_DF_FRAC}
        ),
        kept AS (
            SELECT doc_id, pos, line FROM l2
            WHERE line NOT IN (SELECT line FROM hot)
        ),
        tot AS (SELECT doc_id, count(*) AS n_lines FROM l2 GROUP BY 1),
        reasm AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY 1
        )
        SELECT tot.doc_id,
               COALESCE(reasm.clean_text, '') AS clean_text,
               CAST(tot.n_lines AS BIGINT) AS n_lines,
               CAST(tot.n_lines - COALESCE(reasm.n_kept, 0) AS BIGINT)
                   AS n_boilerplate_removed
        FROM tot LEFT JOIN reasm USING (doc_id)"""

    from ..operators.sampling import TEMP_ALPHA

    sqls["pipeline_temperature_mix"] = f"""
        WITH counts AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ),
        tot AS (SELECT sum(n_docs) AS n_total FROM counts),
        scored AS (
            SELECT lang, n_docs,
                   CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share_raw,
                   CAST(ROUND(pow(CAST(n_docs AS DOUBLE)
                                  / CAST(n_total AS DOUBLE), {TEMP_ALPHA}), 9)
                        AS DECIMAL(20,10)) AS w
            FROM counts, tot
        ),
        denom AS (SELECT sum(w) AS d FROM scored)
        SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
               ROUND(share_raw, 6) AS share,
               ROUND(CAST(w AS DOUBLE) / CAST(d AS DOUBLE), 6) AS p_sample,
               ROUND(CAST(w AS DOUBLE) / CAST(d AS DOUBLE) / share_raw, 6)
                   AS boost
        FROM scored, denom"""

    from .registry import DEDUP_BATCH_MOD

    sqls["dedup_cdc_incremental"] = f"""
        WITH chtbl AS ({_cdc_chunks_sql}),
        batch AS (
            SELECT * FROM chtbl WHERE doc_id % {DEDUP_BATCH_MOD} = 0
        ),
        idx AS (
            SELECT DISTINCT chunk_hash FROM chtbl
            WHERE doc_id % {DEDUP_BATCH_MOD} <> 0
        ),
        fl AS (
            SELECT batch.doc_id, batch.chunk_len,
                   CASE WHEN idx.chunk_hash IS NOT NULL THEN 1 ELSE 0 END
                       AS is_known
            FROM batch LEFT JOIN idx ON batch.chunk_hash = idx.chunk_hash
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(is_known) AS BIGINT) AS n_known_chunks,
               CAST(sum(chunk_len) AS BIGINT) AS total_chars,
               CAST(sum(is_known * chunk_len) AS BIGINT) AS known_chars,
               ROUND(CAST(sum(is_known * chunk_len) AS DOUBLE)
                     / CAST(sum(chunk_len) AS DOUBLE), 6) AS dup_ratio
        FROM fl GROUP BY doc_id"""

    sqls["text_quality_buckets"] = f"""
        WITH lm AS ({sqls["text_lm_score"]})
        SELECT lm.doc_id, d.lang, lm.mean_logp,
               (['head', 'middle', 'tail'])[
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY lm.mean_logp DESC, lm.doc_id)
               ] AS bucket
        FROM lm JOIN documents d ON lm.doc_id = d.doc_id"""

    from ..operators.dedup import CONTAM_BENCH_MOD as _CBM

    _funnel_bench = (
        f"{md5_long_seeded_sql('CAST(doc_id AS VARCHAR)', 'bench')} % {_CBM} = 0"
    )
    sqls["pipeline_curation_funnel"] = f"""
        WITH qids AS (
            SELECT doc_id FROM ({sqls["text_stats"]}) WHERE quality_ok
        ),
        kids AS (
            SELECT keep_doc_id AS doc_id FROM ({sqls["dedup_exact"]})
        ),
        lids AS (
            SELECT DISTINCT doc_b AS doc_id
            FROM ({sqls["dedup_ngram_jaccard"]})
        ),
        bids AS (SELECT doc_id FROM documents WHERE {_funnel_bench}),
        cids AS (
            SELECT doc_id FROM ({sqls["pipeline_decontaminate"]})
        ),
        fl AS (
            SELECT d.doc_id, d.lang,
                   CASE WHEN d.doc_id IN (SELECT doc_id FROM qids)
                        THEN 1 ELSE 0 END AS fq,
                   CASE WHEN d.doc_id IN (SELECT doc_id FROM kids)
                        THEN 1 ELSE 0 END AS fk,
                   CASE WHEN d.doc_id IN (SELECT doc_id FROM lids)
                        THEN 0 ELSE 1 END AS keep_nl,
                   CASE WHEN d.doc_id IN (SELECT doc_id FROM bids)
                        THEN 0 ELSE 1 END AS keep_nb,
                   CASE WHEN d.doc_id IN (SELECT doc_id FROM cids)
                        THEN 0 ELSE 1 END AS keep_nc
            FROM documents d
        ),
        stages AS (
            SELECT count(*) AS s0, sum(fq) AS s1, sum(fq * fk) AS s2,
                   sum(fq * fk * keep_nl) AS s3,
                   sum(fq * fk * keep_nl * keep_nb * keep_nc) AS s4
            FROM fl
        ),
        bal AS (
            SELECT min(n) * count(*) AS s5
            FROM (SELECT lang, count(*) AS n FROM fl
                  WHERE fq = 1 AND fk = 1 AND keep_nl = 1
                    AND keep_nb = 1 AND keep_nc = 1
                  GROUP BY lang)
        )
        SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
               CAST(s0 AS BIGINT) AS n_docs FROM stages
        UNION ALL SELECT 1, 'quality', CAST(s1 AS BIGINT) FROM stages
        UNION ALL SELECT 2, 'exact_dedup', CAST(s2 AS BIGINT) FROM stages
        UNION ALL SELECT 3, 'near_dedup', CAST(s3 AS BIGINT) FROM stages
        UNION ALL SELECT 4, 'decontaminated', CAST(s4 AS BIGINT) FROM stages
        UNION ALL SELECT 5, 'lang_balanced', CAST(s5 AS BIGINT) FROM bal"""

    sqls["sim_centroid_drift"] = f"""
        WITH ex AS (
            SELECT label, s.pos AS pos, s.val AS val
            FROM (
                SELECT label,
                       unnest(list_transform(range(1, len(embedding) + 1),
                           i -> struct_pack(pos := i - 1,
                                            val := embedding[i]))) AS s
                FROM embeddings
            )
        ),
        sums AS (
            SELECT label, pos,
                   sum(CAST(val AS DECIMAL(20,10))) AS sm,
                   count(*) AS n
            FROM ex GROUP BY label, pos
        ),
        cents AS (
            SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
                   list_transform(
                       list_sort(list(struct_pack(pos := pos,
                           m := ROUND(CAST(sm AS DOUBLE) / n, 9)))),
                       s -> s.m) AS centroid
            FROM sums GROUP BY label
        )
        SELECT a.label AS label_a, b.label AS label_b,
               a.n_vecs AS n_a, b.n_vecs AS n_b,
               ROUND(CASE WHEN sqrt({dot_sql('a.centroid', 'a.centroid')}) > 0
                           AND sqrt({dot_sql('b.centroid', 'b.centroid')}) > 0
                          THEN {cosine_sql('a.centroid', 'b.centroid')}
                     END, 6) AS centroid_cosine
        FROM cents a JOIN cents b ON a.label < b.label"""

    sqls["wh_quality_audit"] = """
        WITH o AS (
            SELECT COUNT(*) AS den,
                   SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS c0,
                   SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS c1,
                   SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS c2,
                   SUM(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1992-01-01'
                                                AND TIMESTAMP '2001-12-31'
                            THEN 1 ELSE 0 END) AS c3,
                   COUNT(DISTINCT o_orderkey)
                       FILTER (WHERE o_orderkey IS NOT NULL) AS u0
            FROM orders
        ),
        l AS (
            SELECT COUNT(*) AS den,
                   SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS c0,
                   SUM(CASE WHEN l_discount >= 0 AND l_discount <= 1
                            THEN 1 ELSE 0 END) AS c1,
                   SUM(CASE WHEN l_quantity BETWEEN 1 AND 50
                            THEN 1 ELSE 0 END) AS c2,
                   SUM(CASE WHEN l_returnflag IN ('R','A','N')
                            THEN 1 ELSE 0 END) AS c3,
                   COUNT(DISTINCT (l_orderkey, l_linenumber))
                       FILTER (WHERE l_orderkey IS NOT NULL
                               AND l_linenumber IS NOT NULL) AS u0
            FROM lineitem
        ),
        ref AS (
            SELECT (SELECT COUNT(*) FROM lineitem) AS den,
                   (SELECT COUNT(*) FROM lineitem li
                     WHERE li.l_orderkey IN (SELECT o_orderkey FROM orders)) AS num
        ),
        raw AS (
            SELECT 'orders' AS table_name, 'complete:o_custkey' AS constraint_name,
                   c0 AS num, den FROM o
            UNION ALL SELECT 'orders', 'domain:o_orderstatus', c1, den FROM o
            UNION ALL SELECT 'orders', 'bounds:o_totalprice>0', c2, den FROM o
            UNION ALL SELECT 'orders', 'bounds:o_orderdate', c3, den FROM o
            UNION ALL SELECT 'orders', 'unique:o_orderkey', u0, den FROM o
            UNION ALL SELECT 'lineitem', 'complete:l_orderkey', c0, den FROM l
            UNION ALL SELECT 'lineitem', 'bounds:l_discount', c1, den FROM l
            UNION ALL SELECT 'lineitem', 'bounds:l_quantity', c2, den FROM l
            UNION ALL SELECT 'lineitem', 'domain:l_returnflag', c3, den FROM l
            UNION ALL SELECT 'lineitem', 'unique:l_orderkey,l_linenumber', u0, den FROM l
            UNION ALL SELECT 'lineitem', 'ref:l_orderkey', num, den FROM ref
        )
        SELECT table_name, constraint_name,
               CAST(num AS BIGINT) AS metric_num,
               CAST(den AS BIGINT) AS metric_den,
               ROUND(CAST(num AS DOUBLE) * 100.0 / CAST(den AS DOUBLE), 4) AS pct_ok,
               CAST(CASE WHEN num = den THEN 1 ELSE 0 END AS INTEGER) AS passed
        FROM raw"""

    # KMV theta sketch set algebra (operators/sketches.py::kmv_setops):
    # identical deterministic hash sample + integer estimators; HUGEINT is
    # DuckDB's native exact wide integer (Spark runs the same multiply in
    # DECIMAL(38,0))
    from ..operators.sketches import KMV_HASH_SPACE, KMV_K

    _kmv_est = (
        f"CAST((CAST({KMV_K} - 1 AS HUGEINT) * {KMV_HASH_SPACE})"
        " // {kth} AS BIGINT)"
    )
    # Portable Bloom membership gate (operators/sketches.py::bloom_bits/
    # bloom_membership + plans/registry.py::q_sketch_bloom_filter): same
    # md5 bit family, every probe verdict reproduced, false negatives
    # pinned at exactly zero. SELF-SIZED like the Spark side
    # (sketches.bloom_params): m = the smallest power of two >=
    # 8 * distinct build keys (floor 64; 2**b is exact in a double), k =
    # GREATEST(1, (m * 693147) // (n * 1000000)) — ln(2) in integer ppm,
    # so no cross-engine float-rounding risk; both land on the identical
    # (m, k), which the output row asserts. The hash series is a fixed
    # 0..30 range filtered by j < k (the sizing band keeps k <= 11;
    # DuckDB's generate_series cannot take a lateral column bound).
    from .registry import BLOOM_PROBE_SPAN

    _bloom_prm = """
        prm AS (
            SELECT n, m,
                   CASE WHEN n = 0 THEN 1
                        ELSE GREATEST(1, (m * 693147) // (n * 1000000))
                   END AS k
            FROM (
                SELECT n,
                       (SELECT CAST(2.0 ** MIN(b) AS BIGINT)
                        FROM range(6, 63) t(b)
                        WHERE 2.0 ** b >= 8 * n) AS m
                FROM (SELECT count(*) AS n FROM ev)
            )
        )"""
    _bloom_bit_sql = (
        md5_long_sql(
            "'bloom|' || CAST(t.j AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)"
        )
        + " % prm.m"
    )
    sqls["sketch_bloom_filter"] = f"""
        WITH ev AS (
            SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
        ),
        {_bloom_prm},
        bits AS (
            SELECT DISTINCT {_bloom_bit_sql} AS bit
            FROM ev, prm, generate_series(0, 30) AS t(j)
            WHERE t.j < prm.k
        ),
        probes AS (
            SELECT range AS user_id FROM range(0, {BLOOM_PROBE_SPAN})
        ),
        pj AS (
            SELECT user_id, {_bloom_bit_sql} AS bit
            FROM probes, prm, generate_series(0, 30) AS t(j)
            WHERE t.j < prm.k
        ),
        verd AS (
            SELECT p.user_id,
                   count(b.bit) = (SELECT k FROM prm) AS maybe_present
            FROM pj p LEFT JOIN bits b ON p.bit = b.bit
            GROUP BY p.user_id
        ),
        truthed AS (
            SELECT v.maybe_present,
                   CASE WHEN e.user_id IS NULL THEN 0 ELSE 1 END AS t
            FROM verd v LEFT JOIN ev e ON v.user_id = e.user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_probes,
               CAST((SELECT count(*) FROM bits) AS BIGINT) AS n_set_bits,
               CAST(sum(CASE WHEN maybe_present THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_maybe_present,
               CAST(sum(t) AS BIGINT) AS n_true_present,
               CAST(sum(CASE WHEN maybe_present AND t = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_false_positives,
               CAST(sum(CASE WHEN NOT maybe_present AND t = 1 THEN 1 ELSE 0
                   END) AS BIGINT) AS n_false_negatives,
               (SELECT CAST(m AS BIGINT) FROM prm) AS bloom_m,
               (SELECT CAST(k AS BIGINT) FROM prm) AS bloom_k
        FROM truthed"""

    sqls["sketch_kmv_setops"] = f"""
        WITH d AS (
            SELECT DISTINCT event_type AS grp,
                   {md5_long_sql('CAST(user_id AS VARCHAR)')} AS h
            FROM events
        ),
        sk AS (
            SELECT grp, h FROM (
                SELECT grp, h,
                       row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
                FROM d
            ) WHERE rn <= {KMV_K}
        ),
        stats AS (
            SELECT grp, count(*) AS n_kept, max(h) AS kth FROM sk GROUP BY grp
        ),
        g AS (
            SELECT grp,
                   CASE WHEN n_kept < {KMV_K} THEN n_kept
                        ELSE {_kmv_est.format(kth="kth")} END AS est_distinct,
                   CASE WHEN n_kept < {KMV_K} THEN {KMV_HASH_SPACE}
                        ELSE kth END AS theta
            FROM stats
        ),
        pairs AS (
            SELECT a.grp AS type_a, a.est_distinct AS est_a,
                   a.theta AS theta_a,
                   b.grp AS type_b, b.est_distinct AS est_b,
                   b.theta AS theta_b
            FROM g a JOIN g b ON a.grp < b.grp
        ),
        merged AS (
            SELECT DISTINCT p.type_a, p.type_b, s.h
            FROM pairs p JOIN sk s ON s.grp = p.type_a OR s.grp = p.type_b
        ),
        u AS (
            SELECT type_a, type_b, count(*) AS u_kept, max(h) AS u_kth
            FROM (
                SELECT type_a, type_b, h,
                       row_number() OVER (
                           PARTITION BY type_a, type_b ORDER BY h
                       ) AS rn
                FROM merged
            ) WHERE rn <= {KMV_K}
            GROUP BY type_a, type_b
        ),
        common AS (
            SELECT p.type_a, p.type_b, count(*) AS x_common
            FROM pairs p
            JOIN sk sa ON sa.grp = p.type_a
            JOIN sk sb ON sb.grp = p.type_b AND sb.h = sa.h
            WHERE sa.h < least(p.theta_a, p.theta_b)
            GROUP BY p.type_a, p.type_b
        )
        SELECT p.type_a, p.type_b, p.est_a, p.est_b,
               CASE WHEN u.u_kept < {KMV_K} THEN u.u_kept
                    ELSE {_kmv_est.format(kth="u_kth")} END AS est_union,
               CAST(COALESCE(
                   (CAST(c.x_common AS HUGEINT) * {KMV_HASH_SPACE})
                       // least(p.theta_a, p.theta_b),
                   0) AS BIGINT) AS est_intersect
        FROM pairs p
        JOIN u USING (type_a, type_b)
        LEFT JOIN common c USING (type_a, type_b)"""

    # streaming KMV accumulation converges to exactly the batch sketch
    # (mergeability identity) — same oracle text
    sqls["stream_kmv_native"] = sqls["sketch_kmv_setops"]

    # streaming exact-dedup state converges to exactly the batch rebuild
    # (min/count mergeability) — same oracle text
    sqls["stream_dedup_state_native"] = sqls["dedup_exact"]

    from ..operators.sketches import HLL_ALPHA, HLL_M, HLL_P, HLL_W

    _hll_suf = f"(h >> {HLL_P}) & ((1::BIGINT << {HLL_W}) - 1)"
    sqls["sketch_hll_users"] = f"""
        WITH h AS (
            SELECT event_type,
                   {md5_long_sql('CAST(user_id AS VARCHAR)')} AS h
            FROM events WHERE user_id IS NOT NULL
        ),
        r AS (
            SELECT event_type,
                   CAST(h & {HLL_M - 1} AS INTEGER) AS register,
                   CASE WHEN ({_hll_suf}) = 0 THEN {HLL_W + 1}
                        ELSE {HLL_W + 1} - length(bin({_hll_suf}))
                   END AS rho
            FROM h
        ),
        regs AS (
            SELECT event_type, register, MAX(rho) AS max_rho
            FROM r GROUP BY event_type, register
        ),
        per AS (
            SELECT event_type AS scope,
                   CAST(COUNT(*) AS BIGINT) AS n_registers,
                   {HLL_ALPHA * HLL_M * HLL_M!r}
                       / (({HLL_M} - COUNT(*))
                          + SUM(pow(2.0, -max_rho))) AS raw_est,
                   {HLL_M} - COUNT(*) AS v
            FROM regs GROUP BY event_type
        ),
        mregs AS (
            SELECT register, MAX(max_rho) AS max_rho FROM regs GROUP BY register
        ),
        rawests AS (
            SELECT scope, n_registers, raw_est, v FROM per
            UNION ALL
            SELECT 'ALL',
                   CAST(COUNT(*) AS BIGINT),
                   {HLL_ALPHA * HLL_M * HLL_M!r}
                       / (({HLL_M} - COUNT(*))
                          + SUM(pow(2.0, -max_rho))),
                   {HLL_M} - COUNT(*)
            FROM mregs
        ),
        ests AS (
            SELECT scope, n_registers,
                   CASE WHEN raw_est <= 2.5 * {HLL_M} AND v > 0
                        THEN ROUND({float(HLL_M)!r} * ln({float(HLL_M)!r} / v), 4)
                        ELSE ROUND(raw_est, 4)
                   END AS est_distinct
            FROM rawests
        ),
        exacts AS (
            SELECT event_type AS scope,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
            FROM events WHERE user_id IS NOT NULL GROUP BY event_type
            UNION ALL
            SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events WHERE user_id IS NOT NULL
        )
        SELECT e.scope, e.n_registers, e.est_distinct, x.exact_distinct,
               ROUND((e.est_distinct - x.exact_distinct) * 100.0
                     / x.exact_distinct, 4) AS rel_err_pct
        FROM ests e JOIN exacts x ON e.scope = x.scope"""

    # wh_approx_users: the per-type slice of the portable-HLL pipeline
    # above (registers -> raw estimate -> linear-counting correction),
    # aliased to the dashboard shape.
    sqls["wh_approx_users"] = f"""
        WITH h AS (
            SELECT event_type,
                   {md5_long_sql('CAST(user_id AS VARCHAR)')} AS h
            FROM events WHERE user_id IS NOT NULL
        ),
        r AS (
            SELECT event_type,
                   CAST(h & {HLL_M - 1} AS INTEGER) AS register,
                   CASE WHEN ({_hll_suf}) = 0 THEN {HLL_W + 1}
                        ELSE {HLL_W + 1} - length(bin({_hll_suf}))
                   END AS rho
            FROM h
        ),
        regs AS (
            SELECT event_type, register, MAX(rho) AS max_rho
            FROM r GROUP BY event_type, register
        ),
        per AS (
            SELECT event_type,
                   {HLL_ALPHA * HLL_M * HLL_M!r}
                       / (({HLL_M} - COUNT(*))
                          + SUM(pow(2.0, -max_rho))) AS raw_est,
                   {HLL_M} - COUNT(*) AS v
            FROM regs GROUP BY event_type
        )
        SELECT event_type,
               CASE WHEN raw_est <= 2.5 * {HLL_M} AND v > 0
                    THEN ROUND({float(HLL_M)!r} * ln({float(HLL_M)!r} / v), 4)
                    ELSE ROUND(raw_est, 4)
               END AS approx_users
        FROM per"""

    from ..operators.sketches import HIST_BINS
    from .registry import APPROX_PCT_QUANTILES

    _apq = ", ".join(f"({float(q)!r})" for q in APPROX_PCT_QUANTILES)
    sqls["wh_approx_percentiles"] = f"""
        WITH st AS (
            SELECT MIN(CAST(value AS DOUBLE)) AS lo,
                   (MAX(CAST(value AS DOUBLE)) - MIN(CAST(value AS DOUBLE)))
                       / {float(HIST_BINS)!r} AS width
            FROM events WHERE value IS NOT NULL
        ),
        b AS (
            SELECT event_type, lo, width,
                   LEAST(CASE WHEN width > 0
                              THEN CAST(floor((CAST(value AS DOUBLE) - lo)
                                              / width) AS BIGINT)
                              ELSE 0 END,
                         {HIST_BINS - 1}) AS bin
            FROM events, st WHERE value IS NOT NULL
        ),
        regs AS (
            SELECT event_type, bin, lo, width, COUNT(*) AS cnt
            FROM b GROUP BY event_type, bin, lo, width
        ),
        cum AS (
            SELECT event_type, bin, lo, width, cnt,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin)
                       AS cum,
                   SUM(cnt) OVER (PARTITION BY event_type) AS total
            FROM regs
        ),
        q AS (SELECT CAST(quantile AS DOUBLE) AS quantile
              FROM (VALUES {_apq}) t(quantile)),
        est AS (
            SELECT event_type, quantile,
                   ROUND(lo + width * (CAST(bin AS DOUBLE)
                         + (ceil(quantile * CAST(total AS DOUBLE))
                            - CAST(cum - cnt AS DOUBLE))
                           / CAST(cnt AS DOUBLE)),
                         4) AS est_value
            FROM cum, q
            WHERE (cum - cnt) < ceil(quantile * CAST(total AS DOUBLE))
              AND ceil(quantile * CAST(total AS DOUBLE)) <= cum
        )
        SELECT event_type,
               MAX(CASE WHEN quantile = 0.5 THEN est_value END)
                   AS p50_approx,
               MAX(CASE WHEN quantile = 0.9 THEN est_value END)
                   AS p90_approx
        FROM est GROUP BY event_type"""

    from ..operators.sketches import CMS_PORT_DEPTH, CMS_PORT_WIDTH
    from .registry import HEAVY_HITTER_RECENT

    _cms_cell = md5_long_sql(
        "'cms' || CAST(d AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)"
    )
    sqls["wh_heavy_hitters"] = f"""
        WITH depths AS (
            SELECT unnest(range({CMS_PORT_DEPTH})) AS d
        ),
        cells AS (
            SELECT d, {_cms_cell} % {CMS_PORT_WIDTH} AS cell
            FROM events CROSS JOIN depths WHERE user_id IS NOT NULL
        ),
        counters AS (
            SELECT d, cell, COUNT(*) AS cnt FROM cells GROUP BY d, cell
        ),
        cands AS (
            SELECT DISTINCT user_id FROM events
            WHERE user_id IS NOT NULL
              AND ts >= TIMESTAMP '{HEAVY_HITTER_RECENT}'
        ),
        probes AS (
            SELECT user_id, d, {_cms_cell} % {CMS_PORT_WIDTH} AS cell
            FROM cands CROSS JOIN depths
        )
        SELECT user_id,
               CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est_count
        FROM probes LEFT JOIN counters USING (d, cell)
        GROUP BY user_id"""

    from ..operators.timeseries import ANOM_MIN_N, ANOM_WINDOW, ANOM_Z

    sqls["ts_anomaly"] = f"""
        WITH m AS (
            SELECT event_type, date_trunc('minute', ts) AS minute,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        w AS (
            SELECT event_type, minute, cnt,
                   COUNT(*) OVER tw AS n,
                   SUM(cnt) OVER tw AS s,
                   SUM(cnt * cnt) OVER tw AS ss
            FROM m
            WINDOW tw AS (PARTITION BY event_type ORDER BY minute
                          ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, minute, cnt,
               CAST(n AS BIGINT) AS trailing_n,
               ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS trailing_mean,
               CASE WHEN n * ss - s * s > 0
                    THEN ROUND(CAST(n * cnt - s AS DOUBLE)
                               / sqrt(CAST(n * ss - s * s AS DOUBLE)), 4)
               END AS z_score
        FROM w
        WHERE n >= {ANOM_MIN_N}
          AND CASE WHEN n * ss - s * s = 0 THEN n * cnt - s <> 0
                   ELSE (n * cnt - s) * (n * cnt - s)
                        > {ANOM_Z * ANOM_Z} * (n * ss - s * s) END"""

    # the streaming twin aggregates the SAME minute counts through a
    # watermarked windowed stream, so the batch oracle applies verbatim
    sqls["stream_anomaly_native"] = sqls["ts_anomaly"]

    from ..operators.similarity import HARDNEG_FALSE_NEG_TAU, HARDNEG_K

    sqls["sim_hard_negatives"] = f"""
        WITH bn AS (
            SELECT vec_id, label, embedding, {_bucket} AS bucket,
                   sqrt({dot_sql('embedding', 'embedding')}) AS norm
            FROM embeddings
        ),
        scored AS (
            SELECT a.vec_id AS src_id, a.label AS src_label,
                   b.vec_id AS nbr_id, b.label AS nbr_label,
                   {dot_sql("a.embedding", "b.embedding")} / (a.norm * b.norm)
                       AS cosine_sim
            FROM bn a JOIN bn b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
             AND a.label <> b.label
        )
        SELECT src_id, src_label, nbr_id, nbr_label, cosine_sim,
               row_number() OVER (
                   PARTITION BY src_id ORDER BY cosine_sim DESC, nbr_id
               ) AS nbr_rank
        FROM scored
        WHERE cosine_sim < {HARDNEG_FALSE_NEG_TAU!r}
        QUALIFY nbr_rank <= {HARDNEG_K}"""

    from ..operators.sketches import HIST_BINS, HIST_QUANTILES

    _hq = ", ".join(f"({float(q)!r})" for q in HIST_QUANTILES)
    sqls["sketch_hist_quantiles"] = f"""
        WITH st AS (
            SELECT MIN(CAST(value AS DOUBLE)) AS lo,
                   (MAX(CAST(value AS DOUBLE)) - MIN(CAST(value AS DOUBLE)))
                       / {float(HIST_BINS)!r} AS width
            FROM events WHERE value IS NOT NULL
        ),
        b AS (
            SELECT event_type, lo, width,
                   LEAST(CASE WHEN width > 0
                              THEN CAST(floor((CAST(value AS DOUBLE) - lo)
                                              / width) AS BIGINT)
                              ELSE 0 END,
                         {HIST_BINS - 1}) AS bin
            FROM events, st WHERE value IS NOT NULL
        ),
        regs AS (
            SELECT event_type, bin, lo, width, COUNT(*) AS cnt
            FROM b GROUP BY event_type, bin, lo, width
        ),
        allregs AS (
            SELECT 'ALL' AS scope, bin, lo, width, SUM(cnt) AS cnt FROM regs
            GROUP BY bin, lo, width
            UNION ALL
            SELECT event_type, bin, lo, width, cnt FROM regs
        ),
        cum AS (
            SELECT scope, bin, lo, width, cnt,
                   SUM(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY scope) AS total
            FROM allregs
        ),
        q AS (SELECT CAST(quantile AS DOUBLE) AS quantile
              FROM (VALUES {_hq}) t(quantile))
        SELECT scope, quantile,
               ROUND(lo + width * (CAST(bin AS DOUBLE)
                     + (ceil(quantile * CAST(total AS DOUBLE))
                        - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)),
                     4) AS est_value,
               CAST(total AS BIGINT) AS n_rows
        FROM cum, q
        WHERE (cum - cnt) < ceil(quantile * CAST(total AS DOUBLE))
          AND ceil(quantile * CAST(total AS DOUBLE)) <= cum"""

    from ..operators.sampling import BUDGET_MULT, EPOCH_CAP

    sqls["pipeline_token_budget"] = f"""
        WITH {TOKS_CTE},
        tk AS (
            SELECT lang, CAST(SUM(len(toks)) AS BIGINT) AS tokens_avail
            FROM toks GROUP BY lang
        ),
        counts AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ),
        tot AS (SELECT sum(n_docs) AS n_total FROM counts),
        scored AS (
            SELECT lang,
                   CAST(ROUND(pow(CAST(n_docs AS DOUBLE)
                                  / CAST(n_total AS DOUBLE), {TEMP_ALPHA}), 9)
                        AS DECIMAL(20,10)) AS w
            FROM counts, tot
        ),
        dn AS (SELECT sum(w) AS d FROM scored),
        probs AS (
            SELECT lang, ROUND(CAST(w AS DOUBLE) / CAST(d AS DOUBLE), 6)
                       AS p_sample
            FROM scored, dn
        ),
        base AS (
            SELECT t.lang, tokens_avail, p_sample,
                   CAST(tokens_avail AS DOUBLE) * {EPOCH_CAP!r} AS cap_tokens,
                   CAST(tokens_avail AS DOUBLE) * {EPOCH_CAP!r} / p_sample AS r
            FROM tk t JOIN probs p USING (lang)
            WHERE p_sample > 0
        ),
        totals AS (
            SELECT SUM(cap_tokens) AS sum_cap,
                   SUM(CAST(p_sample AS DECIMAL(18,6))) AS sum_p,
                   LEAST(CAST(SUM(tokens_avail) AS DOUBLE) * {BUDGET_MULT!r},
                         SUM(cap_tokens)) AS budget
            FROM base
        ),
        ranked AS (
            SELECT base.*, totals.*,
                   SUM(cap_tokens) OVER (ORDER BY r, lang) - cap_tokens
                       AS cum_cap_before,
                   SUM(CAST(p_sample AS DECIMAL(18,6)))
                       OVER (ORDER BY r, lang)
                       - CAST(p_sample AS DECIMAL(18,6)) AS cum_p_before,
                   lag(r) OVER (ORDER BY r, lang) AS r_prev
            FROM base, totals
        ),
        lam AS (
            SELECT (budget - cum_cap_before)
                   / CAST(sum_p - cum_p_before AS DOUBLE) AS lam_star
            FROM ranked
            WHERE (budget - cum_cap_before)
                  / CAST(sum_p - cum_p_before AS DOUBLE) <= r
              AND (r_prev IS NULL
                   OR (budget - cum_cap_before)
                      / CAST(sum_p - cum_p_before AS DOUBLE) >= r_prev)
            ORDER BY r, lang LIMIT 1
        )
        SELECT lang, tokens_avail, p_sample,
               ROUND(LEAST(lam_star * p_sample, cap_tokens), 2)
                   AS tokens_alloc,
               ROUND(LEAST(lam_star * p_sample, cap_tokens)
                     / CAST(tokens_avail AS DOUBLE), 4) AS epochs,
               CAST(CASE WHEN lam_star * p_sample >= cap_tokens
                         THEN 1 ELSE 0 END AS INTEGER) AS capped
        FROM base, lam"""

    from ..operators.similarity import projection_matrix

    def _rp_arr(row):
        return "([" + ", ".join(f"{float(x)!r}" for x in row) + "]::DOUBLE[])"

    _remb = (
        "["
        + ", ".join(dot_sql("embedding", _rp_arr(r)) for r in projection_matrix())
        + "]"
    )
    sqls["sim_random_projection"] = f"""
        WITH red AS (
            SELECT vec_id, embedding, {_remb} AS remb FROM embeddings
        ),
        q AS (
            SELECT embedding AS q_emb, remb AS q_remb FROM red
            WHERE vec_id = {SIM_QUERY_VEC_ID}
        ),
        scored AS (
            SELECT vec_id,
                   {cosine_sql('remb', 'q_remb')} AS rc,
                   {cosine_sql('embedding', 'q_emb')} AS fc
            FROM red, q WHERE vec_id <> {SIM_QUERY_VEC_ID}
        ),
        rt AS (
            SELECT vec_id, rc, fc,
                   row_number() OVER (ORDER BY rc DESC, vec_id) AS nbr_rank
            FROM scored
            QUALIFY nbr_rank <= {SIM_TOPK}
        ),
        et AS (
            SELECT vec_id FROM scored ORDER BY fc DESC, vec_id
            LIMIT {SIM_TOPK}
        )
        SELECT nbr_rank, rt.vec_id,
               ROUND(rc, 6) AS reduced_cosine,
               ROUND(fc, 6) AS full_cosine,
               CAST(CASE WHEN et.vec_id IS NOT NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS in_exact_topk
        FROM rt LEFT JOIN et ON rt.vec_id = et.vec_id"""

    from ..operators.privacy import K_ANON_K

    sqls["wh_k_anonymity"] = f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   floor(c_acctbal / 1000.0) AS bal_band,
                   COUNT(*) AS class_size
            FROM customer
            GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 1000.0)
        )
        SELECT CAST(class_size AS BIGINT) AS class_size,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(class_size * COUNT(*) AS BIGINT) AS n_rows,
               CAST(CASE WHEN class_size < {K_ANON_K} THEN 1 ELSE 0 END
                    AS INTEGER) AS below_k
        FROM classes
        GROUP BY class_size"""

    sqls["wh_entity_resolution"] = """
        WITH RECURSIVE vals AS (SELECT DISTINCT s_name AS val FROM supplier),
        vars AS (
            SELECT val, unnest(list_append(
                list_transform(range(1, len(val) + 1),
                    i -> substr(val, 1, i - 1) || substr(val, i + 1)),
                val)) AS var
            FROM vals
        ),
        cand AS (
            SELECT a.val AS val_a, b.val AS val_b
            FROM vars a JOIN vars b ON a.var = b.var AND a.val < b.val
            GROUP BY 1, 2
        ),
        p AS (SELECT val_a, val_b FROM cand
              WHERE levenshtein(val_a, val_b) = 1),
        edges AS (
            SELECT val_a AS src, val_b AS dst FROM p
            UNION SELECT val_b, val_a FROM p
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
        ),
        cc AS (SELECT node AS val, MIN(lbl) AS cid FROM reach GROUP BY node),
        labeled AS (
            SELECT v.val, COALESCE(cc.cid, v.val) AS cid
            FROM vals v LEFT JOIN cc ON v.val = cc.val
        ),
        canon AS (
            SELECT cid, MIN(val) AS entity_id,
                   CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM labeled GROUP BY cid
        )
        SELECT l.val AS name, c.entity_id, c.cluster_size,
               CAST(CASE WHEN l.val = c.entity_id THEN 1 ELSE 0 END
                    AS INTEGER) AS is_canonical
        FROM labeled l JOIN canon c ON l.cid = c.cid"""

    # defense-in-depth contamination dashboard: composes the three
    # verified detector texts verbatim (can never drift); the semantic
    # detector is the incremental banded chain with the SAME seeded bench
    # predicate applied to vec_id
    _bench_vec_pred = (
        f"{md5_long_seeded_sql('CAST(vec_id AS VARCHAR)', 'bench')}"
        f" % {CONTAM_BENCH_MOD} = 0"
    )
    sqls["pipeline_contamination_report"] = f"""
        WITH sem AS (
            WITH banded0 AS ({_emb_banded}),
            idx0 AS (SELECT * FROM banded0 WHERE NOT ({_bench_vec_pred})),
            kept AS (
                SELECT band, bkey FROM idx0 GROUP BY band, bkey
                HAVING count(*) <= {EMB_LSH_BUCKET_CAP}
            ),
            idx AS (
                SELECT i.* FROM idx0 i
                JOIN kept k ON i.band = k.band AND i.bkey = k.bkey
            ),
            bat AS (SELECT * FROM banded0 WHERE {_bench_vec_pred}),
            cands AS (
                SELECT DISTINCT b.vec_id AS vec_batch, i.vec_id AS vec_index
                FROM bat b
                JOIN idx i ON b.band = i.band AND b.bkey = i.bkey
            ),
            nz AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE {dot_sql("embedding", "embedding")} > 0
            )
            SELECT DISTINCT vec_index AS doc_id
            FROM (
                SELECT c.vec_index,
                       {cosine_sql("eb.embedding", "ei.embedding")} AS cosine_sim
                FROM cands c
                JOIN nz eb ON c.vec_batch = eb.vec_id
                JOIN nz ei ON c.vec_index = ei.vec_id
            )
            WHERE cosine_sim >= {COSINE_TAU}
        ),
        hits AS (
            SELECT doc_id, 'ngram' AS mode
            FROM ({sqls["pipeline_decontaminate"]})
            UNION ALL
            SELECT DISTINCT
                   CASE WHEN ({_bench_pred.replace("doc_id", "doc_a")})
                        THEN doc_b ELSE doc_a END AS doc_id,
                   'substring' AS mode
            FROM ({sqls["dedup_substring"]})
            WHERE ({_bench_pred.replace("doc_id", "doc_a")})
                  <> ({_bench_pred.replace("doc_id", "doc_b")})
            UNION ALL
            SELECT doc_id, 'semantic' FROM sem
        )
        SELECT doc_id,
               max(CASE WHEN mode = 'ngram' THEN 1 ELSE 0 END) = 1
                   AS ngram_hit,
               max(CASE WHEN mode = 'substring' THEN 1 ELSE 0 END) = 1
                   AS substring_hit,
               max(CASE WHEN mode = 'semantic' THEN 1 ELSE 0 END) = 1
                   AS semantic_hit
        FROM hits GROUP BY doc_id"""

    return sqls

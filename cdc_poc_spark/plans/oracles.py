"""DuckDB oracle SQL for every registry query — the driver contract's
``oracle_sql()`` side.

Deliberately formulated *differently* from the Spark plans where a different
formulation exists (e.g. ``row_number() = 1`` windows instead of ``max_by``)
so the comparison is a genuine differential test, not the same code twice
(SURVEY §5 strategy item 1).
"""

from __future__ import annotations

from .cdc_mapping import VALID_FILTER_SQL, with_enriched
from .registry import CORRUPT_MOD, DELETE_MOD

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

    sqls["cdc_parse_envelope"] = with_enriched(
        f"SELECT * FROM engagement_events WHERE id % {DELETE_MOD} <> 0"
    )

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

    sqls["wh_hourly_events"] = """
        SELECT date_trunc('hour', ts) AS event_hour,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2"""

    return sqls

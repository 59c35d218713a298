"""Local mirror of the driver's t2 gate: every registry query must
hash-match its DuckDB oracle at sf0.001 (the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from cdc_poc_spark.plans import diffcheck
from cdc_poc_spark.plans.oracles import oracle_sql
from cdc_poc_spark.plans.registry import queries

NAMES = sorted(queries().keys())


def test_every_query_has_oracle_or_is_flagged():
    missing = [n for n in NAMES if n not in oracle_sql()]
    # rows-only entries are allowed but must be deliberate — keep the list here
    # (the wh_approx_* trio moved OFF this list in round 4: the registry now
    # runs the portable deterministic sketches — HLL registers / equi-width
    # histogram / md5 CMS counters — whose estimates the oracle reproduces
    # bit-for-bit; the engine-internal HLL++/GK/count_min_sketch fast paths
    # remain as library functions with error-bound tests in test_wh_sql.py)
    # Round 7: the rows-only set is EMPTY — mm_image_dedup/mm_audio_dedup
    # (the last two members) gained full oracles once their render specs
    # moved to the portable md5-60bit hash and their fingerprints to
    # exact integer arithmetic; the codec encode/decode round trips are
    # pixel/sample-identity (tests/test_media_codecs.py), so the oracles
    # model them as identity and recompute everything else.
    allowed_rows_only: set[str] = set()
    assert set(missing) <= allowed_rows_only


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    con = diffcheck.duckdb_connection(sf_dir)
    r = diffcheck.compare_one(spark, con, name, sf_dir)
    assert r.ok, f"{name}: {r.detail}; sample mismatches: {r.mismatches}"

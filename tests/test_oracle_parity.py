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
    # sim_ivf_refined: iterative Lloyd refinement (k-means) — invariants
    # asserted in tests/test_ivf.py instead
    # mm_image_dedup: PNG render->decode->aHash round-trip is not
    # SQL-expressible; hash/band/join correctness asserted against
    # constructed duplicate images in tests/test_multimodal.py
    # text_bpe_train / text_bpe_encode: BPE merge learning is genuinely
    # iterative (each merge depends on all previous — no single SQL pass);
    # exactness held by the pure-Python reference differential in
    # tests/test_bpe.py
    allowed_rows_only: set[str] = {
        "sim_ivf_refined",
        "mm_image_dedup",
        "mm_audio_dedup",
        "text_bpe_train",
        "text_bpe_encode",
    }
    assert set(missing) <= allowed_rows_only


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    con = diffcheck.duckdb_connection(sf_dir)
    r = diffcheck.compare_one(spark, con, name, sf_dir)
    assert r.ok, f"{name}: {r.detail}; sample mismatches: {r.mismatches}"

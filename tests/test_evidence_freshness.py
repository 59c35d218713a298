"""Static tests for scripts/evidence_freshness.py — the symbol-level
slice extractor that derives the driver verification window. No Spark,
no git-history access: everything runs against the working tree."""

from __future__ import annotations

import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "evidence_freshness", os.path.join(HERE, "scripts", "evidence_freshness.py")
)
ef = importlib.util.module_from_spec(_spec)
sys.modules["evidence_freshness"] = ef
_spec.loader.exec_module(ef)


def test_resolve_relative_imports():
    cur = "cdc_poc_spark.plans.registry"
    assert ef._resolve_from("operators", 2, cur) == "cdc_poc_spark.operators"
    assert ef._resolve_from(None, 1, cur) == "cdc_poc_spark.plans"
    assert ef._resolve_from("cdc_mapping", 1, cur) == "cdc_poc_spark.plans.cdc_mapping"
    assert ef._resolve_from("x.y", 0, cur) == "x.y"


def test_registry_index_maps_queries_and_aliases():
    view = ef.TreeView(None)
    reg = view.index(ef.REGISTRY_MOD)
    assert reg is not None
    assert reg.raw_queries["dedup_exact"] == "q_dedup_exact"
    # `from ..operators import dedup` -> module alias
    assert reg.mod_alias["dedup"] == "cdc_poc_spark.operators.dedup"
    # `from ..sources.testdata import load_table` -> symbol source
    assert reg.name_src["load_table"] == ("cdc_poc_spark.sources.testdata", "load_table")


def test_query_slice_tracks_cross_module_symbols():
    view = ef.TreeView(None)
    s = ef.query_slice(view, "dedup_exact")
    assert s is not None
    keys = set(s)
    # the q_ function itself, its operator callee, and the shared loader
    assert "sym:cdc_poc_spark.plans.registry:q_dedup_exact" in keys
    assert "sym:cdc_poc_spark.operators.dedup:exact_dups" in keys
    assert "sym:cdc_poc_spark.sources.testdata:load_table" in keys
    # symbol granularity: an unrelated helper in the same module must NOT
    # be in the slice (additive churn elsewhere can't mark this stale)
    assert "sym:cdc_poc_spark.operators.dedup:minhash_lsh_dups" not in keys
    assert not any(k == "mod:cdc_poc_spark.operators.dedup" for k in keys)


def test_query_slice_differs_between_queries():
    view = ef.TreeView(None)
    a = ef.query_slice(view, "dedup_exact")
    b = ef.query_slice(view, "dedup_clusters")
    assert a is not None and b is not None
    assert set(a) != set(b)
    # dedup_clusters executes connected_components; dedup_exact doesn't
    cc = "sym:cdc_poc_spark.operators.clustering:connected_components"
    assert cc in b and cc not in a


def test_every_registry_query_slices_cleanly():
    view = ef.TreeView(None)
    reg = view.index(ef.REGISTRY_MOD)
    assert reg is not None
    assert len(reg.raw_queries) >= 190
    for qname in reg.raw_queries:
        s = ef.query_slice(view, qname)
        assert s, f"empty slice for {qname}"
        assert all(v != "ABSENT" for v in s.values()), f"absent module in {qname}"


def test_prologue_seeded_in_every_slice():
    """ADVICE r8: the driver executes _fresh(fn) via the queries()
    assembly, and _fresh calls session.free_caches — shared prologue in
    every query's executed surface, so it must be in every slice."""
    view = ef.TreeView(None)
    for qname in ("dedup_exact", "wh_pricing_summary"):
        s = ef.query_slice(view, qname)
        assert s is not None
        assert "sym:cdc_poc_spark.plans.registry:_fresh" in s
        assert "sym:cdc_poc_spark.session:free_caches" in s
        assert "prologue:cdc_poc_spark.plans.registry:queries" in s


def test_slice_diff_prologue_waiver_is_exact():
    key = "prologue:cdc_poc_spark.plans.registry:queries"
    r6 = "5af48d581e8d043c3361c67194ba45c1"
    r7 = "6873cdc86145d8170f60dea134d357d3"
    base = {"sym:m:f": "x"}
    # the one hand-reviewed ordering-only refactor is equivalent ...
    assert ef.slice_diff({**base, key: r7}, {**base, key: r6}) == []
    # ... any unreviewed prologue change marks the query stale
    assert ef.slice_diff({**base, key: "00" * 16}, {**base, key: r6}) == [key]
    # ... and a _fresh/free_caches body change is never waived
    fk = "sym:cdc_poc_spark.plans.registry:_fresh"
    assert ef.slice_diff({**base, fk: "a"}, {**base, fk: "b"}) == [fk]


def test_suggest_window_shape():
    rows = [
        {"query": f"q{i}", "evidence_round": 3 + i % 4, "stale": []}
        for i in range(60)
    ]
    rows[7]["stale"] = ["sym:x:y"]
    win = ef.suggest_window(rows)
    assert len(win) == ef.WINDOW_SIZE == 50
    assert win[0] == "q7"  # stale first
    assert len(set(win)) == 50


def test_stale_queries_are_staged_in_driver_window():
    """Standing invariant: at any commit, every query the freshness audit
    marks stale must sit in the CURRENT _DRIVER_WINDOW — i.e. the next
    driver round re-proves everything whose code/oracle changed since its
    last green row. (After that round's CORRECTNESS lands, the stale set
    empties; between rounds this is exactly 'staging is complete'.)"""
    import subprocess

    import pytest

    git = subprocess.run(
        ["git", "rev-parse", "--git-dir"], cwd=HERE, capture_output=True
    )
    if git.returncode != 0:
        pytest.skip("no git history available")
    rows = ef.audit()
    stale = {r["query"] for r in rows if r["stale"]}
    import re

    reg_text = open(
        os.path.join(HERE, "cdc_poc_spark", "plans", "registry.py")
    ).read()
    m = re.search(r"_DRIVER_WINDOW = \[(.*?)\]", reg_text, re.S)
    assert m
    window = set(re.findall(r'"([^"]+)"', m.group(1)))
    unstaged = stale - window
    assert not unstaged, (
        f"{len(unstaged)} stale queries not in _DRIVER_WINDOW: "
        f"{sorted(unstaged)} — regenerate the window with "
        f"scripts/evidence_freshness.py --window"
    )

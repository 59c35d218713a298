"""Token-budget water-filling allocation
(operators/sampling.py::token_budget_allocation)."""

from __future__ import annotations

import pytest

from cdc_poc_spark.operators.sampling import token_budget_allocation
from cdc_poc_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def alloc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        token_budget_allocation(docs).collect(),
        token_budget_allocation(docs, budget_mult=10.0).collect(),
    )


def test_budget_fully_spent(alloc):
    rows, _ = alloc
    total_avail = sum(r.tokens_avail for r in rows)
    spent = sum(r.tokens_alloc for r in rows)
    # budget = 3x corpus (< the 4-epoch ceiling) -> spent to rounding error
    assert abs(spent - 3.0 * total_avail) < 1.0 * len(rows)


def test_epoch_cap_respected(alloc):
    for rows in alloc:
        for r in rows:
            assert r.epochs <= 4.0 + 1e-6, r


def test_temperature_upweights_low_resource(alloc):
    rows, _ = alloc
    smallest = min(rows, key=lambda r: r.tokens_avail)
    largest = max(rows, key=lambda r: r.tokens_avail)
    assert smallest.epochs >= largest.epochs


def test_overbudget_saturates_every_language(alloc):
    _, rows = alloc
    # 10x corpus budget > 4-epoch ceiling: clamped, everyone capped
    for r in rows:
        assert r.capped == 1
        assert abs(r.epochs - 4.0) < 1e-6


def test_capped_languages_are_low_resource_prefix(alloc):
    rows, _ = alloc
    # water-filling caps the languages with the smallest saturation point
    # r_l = cap*T_l/p_l first: capped set must be a prefix in r order
    byr = sorted(rows, key=lambda r: 4.0 * r.tokens_avail / r.p_sample)
    flags = [r.capped for r in byr]
    assert flags == sorted(flags, reverse=True)

"""Span corruption (operators/masking.py): differential against a pure-
Python reference of the identical seeded recurrence, the T5 reconstruction
guarantee, and the one-shuffle plan shape."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_poc_spark.operators.masking import (
    MASK_BLOCK,
    MASK_NOISE_PCT,
    span_corrupt,
)


def _flag(doc_id: int, pos: int) -> bool:
    h = hashlib.md5(f"span{doc_id}:{pos // MASK_BLOCK}".encode()).hexdigest()
    return int(h[:15], 16) % 100 < MASK_NOISE_PCT


def _ref(doc_id: int, toks: list[str]) -> dict:
    pieces_in, pieces_tgt, span = [], [], -1
    prev = False
    for p, tok in enumerate(toks):
        f = _flag(doc_id, p)
        if f and not prev:
            span += 1
            pieces_in.append(f"<extra_id_{span}>")
            pieces_tgt.append(f"<extra_id_{span}> {tok}")
        elif f:
            pieces_tgt.append(tok)
        else:
            pieces_in.append(tok)
        prev = f
    n_spans = span + 1
    tgt = " ".join(pieces_tgt)
    closing = f"<extra_id_{n_spans}>"
    return {
        "n_tokens": len(toks),
        "n_masked": sum(_flag(doc_id, p) for p in range(len(toks))),
        "n_spans": n_spans,
        "input_text": " ".join(pieces_in),
        "target_text": f"{tgt} {closing}" if tgt else closing,
    }


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        (3, "single"),
        (7, " ".join(f"tok{i}" for i in range(40))),
    ]
    out = {r["doc_id"]: r.asDict() for r in span_corrupt(_docs(spark, rows)).collect()}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        exp = _ref(doc_id, toks)
        got = out[doc_id]
        for k, v in exp.items():
            assert got[k] == v, (doc_id, k, got[k], v)


def test_empty_and_whitespace_docs_are_dropped(spark):
    out = span_corrupt(_docs(spark, [(1, ""), (2, "   "), (3, "x y")]))
    assert [r["doc_id"] for r in out.collect()] == [3]


@settings(max_examples=15, deadline=None)
@given(
    doc_id=st.integers(min_value=0, max_value=10**6),
    toks=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=60),
)
def test_reconstruction_property(spark, doc_id, toks):
    """T5 invariant: substituting span i's target tokens back into the
    input at sentinel i reproduces the original token sequence."""
    out = span_corrupt(_docs(spark, [(doc_id, " ".join(toks))])).collect()[0]
    spans: dict[int, list[str]] = {}
    cur = None
    for piece in out["target_text"].split(" "):
        m = re.fullmatch(r"<extra_id_(\d+)>", piece)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(piece)
    assert set(spans.pop(out["n_spans"])) == set()  # closing sentinel is empty
    rebuilt: list[str] = []
    for piece in out["input_text"].split(" "):
        m = re.fullmatch(r"<extra_id_(\d+)>", piece)
        rebuilt.extend(spans[int(m.group(1))] if m else [piece])
    assert rebuilt == toks
    assert out["n_masked"] == sum(len(v) for v in spans.values())


def test_single_shuffle_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = span_corrupt(docs)._jdf.queryExecution().executedPlan().toString()
    # posexplode is map-side; lag window, running-sum window and the final
    # reassembly groupBy must all reuse ONE doc_id hash exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan

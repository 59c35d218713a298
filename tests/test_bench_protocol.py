"""Pure-python tests for the bench harness's batched-protocol plumbing
(no Spark session): batch slicing must exactly partition the query list,
and the spread checker must gate correctly."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


bench = _load("bench_mod", os.path.join(HERE, "bench.py"))
bb = _load("bench_batched", os.path.join(HERE, "scripts", "bench_batched.py"))


def test_batch_slices_partition_exactly():
    names = bench.BENCH_QUERIES
    for n in (1, 2, 4, 7):
        slices = [bench.batch_slice(names, i, n) for i in range(n)]
        flat = [q for s in slices for q in s]
        assert flat == names  # order preserved, nothing lost or doubled
        assert max(len(s) for s in slices) - min(len(s) for s in slices) <= 1


def test_spread_check_gates(tmp_path):
    import pytest

    a = {"queries": {f"q{i}": 1.0 for i in range(20)}}
    b = {"queries": {f"q{i}": 1.0 for i in range(20)}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    bb.check(str(pa), str(pb))  # identical runs pass
    # 3/20 queries outside 1.25x -> 85% < 90% gate -> SystemExit
    for q in ("q0", "q1", "q2"):
        b["queries"][q] = 2.0
    pb.write_text(json.dumps(b))
    with pytest.raises(SystemExit):
        bb.check(str(pa), str(pb))


def test_scale_validation_refuses_wrong_sf():
    import pytest

    sections = [
        {"sf": 0.001, "batch": "0/1", "queries": {"q": 1.0},
         "_subprocess_wall_s": 1.0}
    ]
    stream = {"sf": 0.001, "batch": "stream",
              "stream": {"events": 1000}, "_subprocess_wall_s": 1.0}
    with pytest.raises(SystemExit, match="SCALE VALIDATION"):
        bb._assemble("/root/testdata/sf0.1", sections, stream, 100_000, None, 3)


def test_check_writes_artifact_with_both_fractions(tmp_path):
    """ADVICE r8: the written record must carry the ratio-only AND the
    deadbanded fractions plus every deadband-excused row, so the gate's
    loosening is visible in the artifact, not only on stdout."""
    a = {"queries": {f"q{i}": 1.0 for i in range(10)}}
    b = {"queries": {f"q{i}": 1.0 for i in range(10)}}
    # q0: 3.3x ratio but |delta| 0.46s < 0.5s deadband -> excused
    a["queries"]["q0"], b["queries"]["q0"] = 0.2, 0.66
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    art = tmp_path / "check.json"
    bb.check(str(pa), str(pb), artifact=str(art))
    rec = json.loads(art.read_text())
    assert rec["passed"] is True
    assert rec["ratio_only"]["ok"] == 9 and rec["gated"]["ok"] == 10
    assert rec["ratio_only"]["fraction"] < rec["gated"]["fraction"]
    assert [e["query"] for e in rec["deadband_excused"]] == ["q0"]
    assert rec["excused_over_3x"] == 1
    assert rec["gate"]["deadband_s"] == bb.SPREAD_DEADBAND_S


def test_assemble_without_stream_section():
    """--no-stream (conf A/Bs): assembly must skip stream validation and
    record stream/generator as None."""
    sections = [
        {"sf": 0.1, "batch": "0/1", "queries": {"q": 1.0},
         "_subprocess_wall_s": 1.0}
    ]
    payload = bb._assemble("/root/testdata/sf0.1", sections, None, 100_000, None, 3)
    assert payload["stream"] is None and payload["generator"] is None
    assert payload["n_queries"] == 1
    assert payload["protocol"] == "batched-fresh-jvm-1-minof3"

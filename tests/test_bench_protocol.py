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

"""Arrow-vectorized twins of the interpreted higher-order vector folds.

The embedding operators phrase every dot product as
``aggregate(zip_with(a, b, x*y), 0.0, acc+x)`` — exact, engine-portable,
and the form the DuckDB oracles replicate literal-for-literal. But Spark
evaluates higher-order lambdas INTERPRETED (they never enter whole-stage
codegen), so a 64-plane banded-LSH signature costs ~64 array allocations
plus ~8k boxed lambda invocations per row; profiled at sf0.1 that made
the two banded embedding queries the slowest in the whole bench (6s/10s
for 2000 vectors of dim 64 — pure expression-evaluation overhead).

These kernels compute the SAME doubles, vectorized across an Arrow batch:
products first, then a sequential left fold in element order —
``acc = (((0.0 + p_0) + p_1) + ...)`` — replayed as one numpy vector add
per element index, so every row's accumulation order (and therefore IEEE
rounding) is identical to the interpreted fold and to the SQL oracles.
``tests/test_properties.py::test_fold_kernels_bit_identical`` holds the
two implementations equal on hypothesis-generated vectors.

Scale note: this is the documented "drop to Arrow when the built-in form
can't express it EFFICIENTLY" case — the lambda forms are semantically
fine but 10-100x off in constant factor; a BLAS-shaped batch kernel is
how a 1000-executor deployment would run the projection anyway. The
boundary is measured, not assumed: the kernel wins where one input row
funds MANY folds (the 64-plane signature: 6s/10s -> ~2s at sf0.1) and
loses where a pair row funds ONE fold and the vectors must be Arrow-
serialized just for the kernel (candidate verification and the IVF
assignment crossJoin both A/B'd slower — those sites keep the
interpreted fold, with in-code notes). Null
contract: a null ELEMENT inside a vector reaches numpy as NaN, so the
kernel returns NaN where the lambda fold would return null — embeddings
are non-null by schema, and the ragged/null-VECTOR rows fall back to an
exact scalar fold that preserves null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _stack(series: pd.Series, dim: int) -> np.ndarray | None:
    """(n, dim) float64 matrix when every row is a dense dim-vector,
    else None (caller falls back to the exact scalar fold)."""
    vals = series.to_numpy()
    try:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vals])
    except (ValueError, TypeError):
        return None
    if m.ndim != 2 or m.shape[1] != dim:
        return None
    return m


def _seq_fold_rows(products: np.ndarray) -> np.ndarray:
    """Per-row sequential left fold of a (n, dim) product matrix: one
    float64 add per element index, in index order — the rounding-exact
    replay of ``aggregate(..., 0.0, acc+x)``. (np.sum would use pairwise
    summation: different rounding, different bits.)"""
    acc = np.zeros(products.shape[0], dtype=np.float64)
    for d in range(products.shape[1]):
        acc = acc + products[:, d]
    return acc


def _scalar_dot(a, b) -> float | None:
    if a is None or b is None or len(a) != len(b):
        return None  # zip_with pads with null -> fold yields null
    s = 0.0
    for x, y in zip(a, b):
        s = s + float(x) * float(y)
    return s


def fold_dot(a: Column, b: Column, dim: int) -> Column:
    """Vectorized pair dot product, bit-identical to
    ``similarity.dot`` (the zip_with+aggregate fold). ``dim`` is the
    expected vector width; rows that don't match fall back to the exact
    scalar fold (preserving the lambda form's null semantics)."""

    @F.pandas_udf("double")
    def _dot(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if len(sa) == 0:
            return pd.Series([], dtype="float64")
        ma, mb = _stack(sa, dim), _stack(sb, dim)
        if ma is not None and mb is not None:
            return pd.Series(_seq_fold_rows(ma * mb))
        return pd.Series(
            [_scalar_dot(x, y) for x, y in zip(sa, sb)], dtype="float64"
        )

    return _dot(a, b)


def banded_keys(vec: Column, weights: list[list[int]], rows: int) -> Column:
    """array<long> of ``len(weights)//rows`` band keys for one vector:
    plane p's projection is the sequential fold of v·w_p (identical
    doubles to ``similarity.lsh_bucket``'s per-plane ``dot``), bit p of
    band b is ``proj_{b*rows+p} > 0`` — the banded hyperplane signature
    computed in one Arrow pass instead of bands*rows interpreted lambda
    aggregates. NaN projections contribute 0 bits, matching
    ``F.when(proj > 0, ...)``'s false branch."""
    planes = len(weights)
    bands = planes // rows
    dim = len(weights[0])
    # (dim, planes) so the d-loop broadcasts one row of weights at a time
    wt = np.asarray(weights, dtype=np.float64).T.copy()

    @F.pandas_udf("array<long>")
    def _keys(sv: pd.Series) -> pd.Series:
        n = len(sv)
        if n == 0:
            return pd.Series([], dtype="object")
        m = _stack(sv, dim)
        if m is None:  # ragged batch: exact per-row scalar folds
            out = []
            for v in sv:
                if v is None or len(v) != dim:
                    out.append(None)
                    continue
                projs = [_scalar_dot(v, wt[:, p]) for p in range(planes)]
                out.append(
                    [
                        sum(
                            (1 << p)
                            for p in range(rows)
                            if projs[b * rows + p] > 0
                        )
                        for b in range(bands)
                    ]
                )
            return pd.Series(out, dtype="object")
        # per (row, plane) the adds happen in element order d — the same
        # left fold as the lambda form, vectorized across rows AND planes
        acc = np.zeros((n, planes), dtype=np.float64)
        for d in range(dim):
            acc = acc + m[:, d : d + 1] * wt[d : d + 1, :]
        bits = acc > 0  # NaN > 0 is False, like the when() false branch
        pows = np.asarray([1 << p for p in range(rows)], dtype=np.int64)
        keys = np.zeros((n, bands), dtype=np.int64)
        for b in range(bands):
            keys[:, b] = bits[:, b * rows : (b + 1) * rows].astype(np.int64) @ pows
        return pd.Series(list(keys))

    return _keys(vec)

"""BPE encode flatness probe — round-6 verdict item 4's 'Done' gate.

Measures ENCODE-ONLY wall time (training excluded: merges are trained
once at the deepest setting and prefixes reused) at 10/20/40 merges for
both encode paths:

- greedy  — the merge-rank greedy default (operators/bpe.py::
  _greedy_pieces): per-word cost bounded by word length, so encode time
  should be FLAT in the merge count;
- folds   — the fused sequential fold chain: O(merge groups) passes, so
  time grows with the merge count (kept as the differential twin).

The gate: greedy's 40-merge time <= 1.5x its 10-merge time (flat), and
greedy matches folds row-for-row at every depth (the trained-list
greedy/sequential equivalence, re-asserted on the real corpus).

Usage: python scripts/bpe_flatness.py [--sf /root/testdata/sf0.1]
Run ALONE on a settled machine, like every timing probe in scripts/.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from cdc_poc_spark.operators import bpe  # noqa: E402
from cdc_poc_spark.session import free_caches, get_spark  # noqa: E402
from cdc_poc_spark.sources.testdata import load_table  # noqa: E402

DEPTHS = (10, 20, 40)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark(
        "bpe-flatness", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf, "documents")
    merges_all, _ = bpe.train_merges(docs, num_merges=max(DEPTHS))
    print(f"trained {len(merges_all)} merges once (train excluded from "
          "encode timings)", file=sys.stderr)

    rows = []
    for depth in DEPTHS:
        merges = merges_all[:depth]
        times = {}
        for method in ("greedy", "folds"):
            # warmup compile at sf0.001, then timed run
            free_caches(spark)
            bpe.encode(
                load_table(spark, "/root/testdata/sf0.001", "documents"),
                merges, method=method,
            ).count()
            free_caches(spark)
            t0 = time.perf_counter()
            bpe.encode(docs, merges, method=method).count()
            times[method] = time.perf_counter() - t0
        g = {r.doc_id: r.pieces
             for r in bpe.encode(docs, merges).collect()}
        f = {r.doc_id: r.pieces
             for r in bpe.encode(docs, merges, method="folds").collect()}
        match = g == f
        rows.append((depth, times["greedy"], times["folds"], match))
        print(f"{depth} merges: greedy {times['greedy']:.2f}s, "
              f"folds {times['folds']:.2f}s, greedy==folds: {match}",
              file=sys.stderr)

    print("\n| merges | greedy encode | fold-chain encode | match |")
    print("|---|---|---|---|")
    for d, tg, tf, ok in rows:
        print(f"| {d} | {tg:.2f}s | {tf:.2f}s | {ok} |")
    flat = rows[-1][1] <= 1.5 * rows[0][1]
    if not all(ok for *_, ok in rows):
        print("DIFFERENTIAL FAILED: greedy != folds", file=sys.stderr)
        sys.exit(1)
    if not flat:
        print(f"FLATNESS GATE FAILED: greedy {rows[-1][1]:.2f}s at "
              f"{DEPTHS[-1]} merges > 1.5x {rows[0][1]:.2f}s at "
              f"{DEPTHS[0]}", file=sys.stderr)
        sys.exit(1)
    print(f"\nflatness gate OK: greedy {rows[0][1]:.2f}s -> "
          f"{rows[-1][1]:.2f}s over {DEPTHS[0]}->{DEPTHS[-1]} merges",
          file=sys.stderr)


if __name__ == "__main__":
    main()

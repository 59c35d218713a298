"""Scoped DuckDB differential under the hostile-TZ driver simulation —
the per-change correctness gate the optimization rounds run after every
batch of edits (full-suite pytest runs the sf0.001 sweep; this targets
the CONSUMERS of changed code at the driver's sf, in one JVM).

Usage:
  TZ=Pacific/Kiritimati python scripts/diffcheck_scoped.py \
      --sf-dir /root/testdata/sf0.01 ts_robust_trend wh_dbscan ...
  (no names = every registry query)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    os.environ.setdefault("TZ", "Pacific/Kiritimati")
    time.tzset()
    from cdc_poc_spark.plans import diffcheck
    from cdc_poc_spark.session import get_spark

    spark = get_spark(
        "diffcheck-scoped", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    results = diffcheck.run_all(spark, args.sf_dir, names=args.names or None)
    bad = [r for r in results if not r.ok]
    for r in results:
        mark = "OK " if r.ok else "FAIL"
        print(f"{mark} {r.name} spark_rows={r.spark_rows} {r.detail or ''}")
    print(
        f"{len(results) - len(bad)}/{len(results)} OK in "
        f"{time.perf_counter() - t0:.1f}s at {args.sf_dir}"
    )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

"""Quantify the bench "session drift" tax — round-5 verdict item 6.

Rounds 2-4 showed a broad ~13% round-over-round wobble on UNTOUCHED
queries whenever the 140+-query bench shared one JVM. The suspected
mechanism is generated-class churn: Spark's whole-stage-codegen class
cache holds `spark.sql.codegen.cache.maxEntries` entries (default 100),
and a 143-plan session compiles far more generated classes than that —
later queries pay re-compilation (and the JIT churn that follows) for
plans that were already hot earlier in the session.

Method: measure a fixed PROBE set (the five queries the round-4 verdict
flagged as drifted, none touched since round 3) three ways in one
process:

  fresh   — first thing after warmup in a new JVM
  churned — immediately after running the full bench list once
  again   — a second churned pass (separates eviction cost, which
            re-paying compilation makes persistent, from one-off JIT)

and print per-query ratios. Run once with the default cache and once
with the raised cache to see the fix (session.py ships 1500 entries
PAIRED with -XX:ReservedCodeCacheSize=768m — a naive 4000-entry raise
over the stock 240 MB code cache drove long sessions into
compilation-disabled interpreter fallback; see PARITY.md's
bench-session note):

  python scripts/bench_drift.py                  # session.py conf (1500)
  python scripts/bench_drift.py --cache 100      # the old default

The sf0.1 numbers land in PARITY.md's bench-session note.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from cdc_poc_spark.plans.registry import queries  # noqa: E402
from cdc_poc_spark.session import free_caches, get_spark  # noqa: E402

PROBES = [
    "text_bpe_encode",
    "wh_value_anomalies",
    "wh_late_suppliers",
    "text_bpe_train",
    "text_nb_lang",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--cache", default=None,
                    help="override spark.sql.codegen.cache.maxEntries")
    args = ap.parse_args()
    extra = {"spark.ui.showConsoleProgress": "false"}
    if args.cache:
        extra["spark.sql.codegen.cache.maxEntries"] = args.cache
    spark = get_spark("bench-drift", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    print("codegen cache entries:",
          spark.conf.get("spark.sql.codegen.cache.maxEntries"),
          file=sys.stderr)
    reg = queries(fresh=False)

    def measure(tag: str) -> dict[str, float]:
        out = {}
        for n in PROBES:
            free_caches(spark)
            t0 = time.perf_counter()
            reg[n](spark, args.base).count()
            out[n] = time.perf_counter() - t0
        print(f"{tag}: " + ", ".join(f"{n}={t:.2f}s" for n, t in out.items()))
        return out

    # same warmup policy as bench.py: compile the big families once small
    for n in PROBES:
        reg[n](spark, "/root/testdata/sf0.001").count()
    fresh = measure("fresh  ")

    from bench import BENCH_QUERIES  # noqa: E402 — the real session shape

    t0 = time.perf_counter()
    for n in BENCH_QUERIES:
        if n in reg:
            free_caches(spark)
            reg[n](spark, args.base).count()
    print(f"(bench list once: {time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    churned = measure("churned")
    again = measure("again  ")
    rows = []
    for n in PROBES:
        rows.append((n, fresh[n], churned[n], again[n],
                     churned[n] / fresh[n], again[n] / fresh[n]))
    print("\n| probe query | fresh | churned | again | churned/fresh | again/fresh |")
    print("|---|---|---|---|---|---|")
    for n, f, c, a, rc, ra in rows:
        print(f"| {n} | {f:.2f}s | {c:.2f}s | {a:.2f}s | {rc:.2f} | {ra:.2f} |")
    med = sorted(r[4] for r in rows)[len(rows) // 2]
    print(f"\nmedian churned/fresh: {med:.2f}")


if __name__ == "__main__":
    main()

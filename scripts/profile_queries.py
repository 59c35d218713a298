"""Round-9 optimization profiler — per-query isolated measurement.

For each named registry query (default: all bench queries), in ONE session
with the bench's exact configuration:
  * free caches outside the timed region (bench protocol),
  * time the query build + action; action defaults to the bench's count()
    so numbers are comparable to BENCH_r08, --noop switches to the noop
    sink (computes every column, guide §1.4) for isolation work,
  * write the pre-execution `.explain("formatted")` to --plans-dir
    (plans/r09/<query>_<tag>.txt) and count Exchange / join-strategy /
    Python-eval nodes into the JSON summary.

Usage:
  python scripts/profile_queries.py --queries mm_image_dedup_sql wh_dbscan \
      --tag before --out /tmp/prof_before.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_string(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "nested_loop_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "python_evals": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "sorts": len(re.findall(r"^\(\d+\) Sort\b", plan, re.M)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="time the noop sink instead of count()")
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r09"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from cdc_poc_spark.plans.registry import queries, setup_hooks
    from cdc_poc_spark.session import free_caches, get_spark

    spark = get_spark("r09-profiler", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries(fresh=False)
    names = args.queries or list(reg)
    os.makedirs(args.plans_dir, exist_ok=True)

    hooks = setup_hooks()
    if not args.no_warmup:
        for n in names:
            if n in hooks:
                hooks[n](spark, args.sf_dir)
            try:
                reg[n](spark, "/root/testdata/sf0.001").count()
            except Exception as e:  # noqa: BLE001
                print(f"warmup {n}: {e}", file=sys.stderr)
    else:
        for n in names:
            if n in hooks:
                hooks[n](spark, args.sf_dir)

    results = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"r09-profile:{n}")
        times = []
        plan = None
        for _ in range(max(1, args.reps)):
            free_caches(spark)
            t0 = time.perf_counter()
            df = reg[n](spark, args.sf_dir)
            if plan is None:
                plan = plan_string(df)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.perf_counter() - t0, 3))
        with open(os.path.join(args.plans_dir, f"{n}_{args.tag}.txt"), "w") as f:
            f.write(plan)
        results[n] = {"min_s": min(times), "times_s": times, **plan_stats(plan)}
        print(json.dumps({n: results[n]}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "action": "noop" if args.noop else "count",
                       "reps": args.reps, "results": results}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

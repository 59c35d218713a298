"""sf10 (100x) scale probe — round-9 verdict item 2.

The 100 TB posture has so far rested on alphas fitted to 1x-8x curves
plus one 10x full sweep (sf1_bench). This probe converts the
extrapolation into a measurement at a 100x data step: it generates a
one-off sf10-scale corpus with the same in-repo seeded generators the
sf1 sweep uses (fresh draws in the shipped schemas — the dup/near-dup
population scales the way a real corpus's does, not id-offset replicas)
and measures the six highest-alpha / highest-cost paths the round-8
verdict named, one FRESH JVM per query, sf0.1 and sf10 timed in the
same JVM so the ratio is same-session:

  dedup_substring             winnowing pair path     (curve alpha 0.86)
  dedup_minhash_lsh           banded LSH pair path    (curve alpha 0.82)
  sim_embedding_dups_ivf      balanced IVF pair path  (curve alpha 0.54)
  sim_ivfpq_topk              IVF-PQ ADC top-k        (curve alpha 1.02)
  wh_dbscan                   grid eps-join + CC      (curve alpha 0.24)
  pipeline_contamination_report  3-detector composite (no curve row)

wh_dbscan is the headline: at 100x the eps-graph exceeds the 2^22-edge
driver-CC cap (operators/clustering.py:139 — the capped count refuses
the fast path), so this is the first MEASURED run of the distributed
label-propagation CC loop on a graph that genuinely exceeds the cap,
not a forced-strategy probe. The measured edge count is recorded as
evidence.

Alphas quoted above are the latest committed run-of-record curve
(PARITY.md round 7 table + round 8 re-measured cells); predicted ratio
for a 100x step is 100^alpha. The curve alphas for the text/embedding
pair ops are OUTPUT-INCLUSIVE upper bounds (replica-sibling caveat in
scripts/scaling_curve.py) while this corpus scales by fresh draws, so
measured ratios BELOW prediction are expected; far above means the
extrapolation was wrong.

Memory evidence: each per-query JVM's peak RSS (VmHWM of the java
process) is recorded after the sf10 run, against the host's 128 GiB.

Usage:
  python scripts/sf10_probe.py [--out-dir /tmp/sf10] [--mult 100]
         [--record sf10_probe_r09.json]
  python scripts/sf10_probe.py --single <query>   # internal, one JVM
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"
SF01_ROWS = {"events": 100_000, "documents": 5_000, "embeddings": 2_000}
DRIVER_CC_CAP = 1 << 22  # operators/clustering.py driver fast-path cap

# query -> fitted alpha from the committed scaling curve (None = no row)
PROBES: dict[str, float | None] = {
    "dedup_substring": 0.86,
    "dedup_minhash_lsh": 0.82,
    "sim_embedding_dups_ivf": 0.54,
    "sim_ivfpq_topk": 1.02,
    "wh_dbscan": 0.24,
    "pipeline_contamination_report": None,
}


def _generate(out_dir: str, mult: int) -> None:
    from cdc_poc_spark.session import get_spark
    from cdc_poc_spark.sources import generator as G

    spark = get_spark(
        "sf10-gen", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    gens = {
        "events": lambda: G.gen_testdata_events(spark, SF01_ROWS["events"] * mult),
        "documents": lambda: G.gen_documents(spark, SF01_ROWS["documents"] * mult),
        "embeddings": lambda: G.gen_embeddings(spark, SF01_ROWS["embeddings"] * mult),
    }
    for name, fn in gens.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(path):
            t0 = time.perf_counter()
            fn().write.parquet(path)
            print(
                f"generated {name} x{mult}: {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
    # scale validation (the r7 idle-record lesson, structural ever since):
    # refuse to measure anything whose input is not the scale claimed
    import duckdb

    for name, base in SF01_ROWS.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        n = duckdb.sql(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
        if n != base * mult:
            raise SystemExit(
                f"SCALE VALIDATION FAILED: {name} has {n} rows, expected "
                f"{base * mult}; delete {out_dir} and rerun"
            )
    spark.stop()


def _java_peak_rss_gib() -> float | None:
    """Peak RSS (VmHWM) of the largest live java process, in GiB."""
    best = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        best = max(best, int(line.split()[1]))  # kB
        except OSError:
            continue
    return round(best / (1024 * 1024), 2) if best else None


def _single(qname: str, out_dir: str) -> None:
    from cdc_poc_spark.plans.registry import queries
    from cdc_poc_spark.session import free_caches, get_spark

    spark = get_spark(
        "sf10-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = queries(fresh=False)[qname]
    # untimed: compile the plan at sf0.001 (bench.py's warmup policy)
    fn(spark, SF001).count()
    free_caches(spark)
    t0 = time.perf_counter()
    rows_small = fn(spark, SF01).count()
    t_small = time.perf_counter() - t0
    free_caches(spark)
    t0 = time.perf_counter()
    rows_big = fn(spark, out_dir).count()
    t_big = time.perf_counter() - t0
    rec = {
        "query": qname,
        "sf01_s": round(t_small, 2),
        "sf10_s": round(t_big, 2),
        "ratio": round(t_big / t_small, 1),
        "rows_sf01": rows_small,
        "rows_sf10": rows_big,
        "peak_jvm_rss_gib": _java_peak_rss_gib(),
    }
    if qname == "wh_dbscan":
        # evidence for the headline claim: count the eps-graph edges the
        # sf10 run clustered — past the driver cap, connected_components'
        # capped count refuses the fast path and the DISTRIBUTED loop ran
        from cdc_poc_spark.operators import spatial
        from cdc_poc_spark.sources.testdata import load_table

        free_caches(spark)
        pts = spatial.synthesize_points(load_table(spark, out_dir, "events"))
        edges = spatial.grid_distance_join(pts).count()
        rec["sf10_edges"] = edges
        rec["exceeds_driver_cap"] = edges > DRIVER_CC_CAP
    print("RESULT " + json.dumps(rec))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/sf10")
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--record", default=None)
    ap.add_argument(
        "--only", default=None, help="comma-separated subset of PROBES to run"
    )
    ap.add_argument("--single", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.single:
        _single(args.single, args.out_dir)
        return
    _generate(args.out_dir, args.mult)
    results = []
    probes = (
        {q: PROBES[q] for q in args.only.split(",")} if args.only else PROBES
    )
    for qname in probes:
        t0 = time.perf_counter()
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--single",
                qname,
                "--out-dir",
                args.out_dir,
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"probe {qname} failed (rc {proc.returncode})")
        line = next(
            ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
        )
        rec = json.loads(line[len("RESULT "):])
        rec["jvm_wall_s"] = round(time.perf_counter() - t0, 1)
        alpha = probes[qname]
        rec["curve_alpha"] = alpha
        rec["predicted_ratio"] = round(args.mult**alpha, 1) if alpha else None
        results.append(rec)
        print(
            f"{qname}: sf0.1 {rec['sf01_s']}s -> x{args.mult} {rec['sf10_s']}s "
            f"({rec['ratio']}x; predicted "
            f"{rec['predicted_ratio'] or '-'}x; peak JVM RSS "
            f"{rec['peak_jvm_rss_gib']} GiB)",
            file=sys.stderr,
        )
    print("\n| query | sf0.1 | sf10 (100x) | ratio | 100^alpha | peak RSS |")
    print("|---|---|---|---|---|---|")
    for r in results:
        pred = f"{r['predicted_ratio']}x" if r["predicted_ratio"] else "—"
        print(
            f"| {r['query']} | {r['sf01_s']}s | {r['sf10_s']}s | "
            f"{r['ratio']}x | {pred} | {r['peak_jvm_rss_gib']} GiB |"
        )
    if args.record:
        merged = {"mult": args.mult, "results": results}
        if args.only and os.path.exists(args.record):
            # partial re-run (--only): merge over the prior record so the
            # file always carries the full probe set
            with open(args.record) as f:
                prior = json.load(f)
            if prior.get("mult") == args.mult:
                keep = [
                    r
                    for r in prior["results"]
                    if r["query"] not in {x["query"] for x in results}
                ]
                merged["results"] = keep + results
        with open(args.record, "w") as f:
            json.dump(merged, f, indent=1)
            f.write("\n")
        print(f"wrote {args.record}", file=sys.stderr)


if __name__ == "__main__":
    main()

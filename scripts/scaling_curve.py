"""Empirical scaling curve for the candidate-generation-heavy operators.

Correctness runs at small SF prove answers; this probe measures how wall
time GROWS with corpus size — the evidence that the banded/blocked/prefix
candidate generation is sub-quadratic in practice, not just on paper. The
corpus is scaled by unioning doc_id-offset replicas whose text gets one
replica-distinct token appended. CAVEAT on reading the alphas: one
appended token barely moves a multi-hundred-shingle Jaccard, so replica
SIBLINGS of the same base doc remain genuine near-dups — the TRUE output
of the text pair ops grows ~m^2 (verified in the rows printout), and
their measured alphas are therefore upper bounds that include
output-size growth, not pure algorithm cost. The embedding replicas get
a per-replica circular dimension shift, which decorrelates more but not
fully at a permissive tau. Ops whose output grows linearly (dedup_exact,
simhash, topk) isolate the algorithmic exponent cleanly.

Usage: python scripts/scaling_curve.py [--base /root/testdata/sf0.1]
Prints a markdown table + per-op scaling exponent alpha where
t ~ size^alpha (alpha from the 1x->8x endpoints).

(An earlier version nudged every replica dimension by the SAME constant;
the coherent shift made cross-replica vectors genuinely similar at the
query tau — quadratic TRUE output, measuring data not algorithm — and,
as a bonus, collapsed LSH signatures into one mega bucket, which is how
the bucket-cap guard in embedding_dup_pairs_lsh got added. Replicas now
get a per-replica CIRCULAR DIMENSION SHIFT: within-replica cosines are
preserved exactly (so true-pair count grows exactly linearly) while
cross-replica pairs decorrelate.)
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cdc_poc_spark.operators import (  # noqa: E402
    bpe,
    classify,
    dedup,
    similarity,
    text_analysis,
)
from cdc_poc_spark.session import free_caches, get_spark  # noqa: E402
from cdc_poc_spark.sources.testdata import load_table  # noqa: E402

REPLICAS = (1, 2, 4, 8)

# see main(): ops with linear TRUE output whose fitted exponent is a clean
# algorithmic signal, guarded against sub-quadratic regressions
GUARD_ALPHA = 1.3
LINEAR_OUTPUT_OPS = {
    "dedup_exact",
    "simhash",
    "ann_lsh_topk",
    "bpe_train (10 merges)",
    "nb_classify",
    "cdc_chunk_report",
    "tfidf_topk",
    "ngram_diversity",
    "ivfpq_topk",
    "knn_communities (LPA)",
    "video_dedup (frame sigs)",
    "semantic_decontaminate",
    "spatial_join (grid)",
    "dbscan (grid+CC)",
    "hll_registers (sketch)",
    "cms_counters (sketch)",
    # r5: balanced sqrt-sized quantizer made both IVF pair legs O(n^1.5)
    # by construction — guarded alongside the banded LSH default path.
    # (semantic_dedup runs at its strict default tau, so replica siblings
    # decorrelate and output stays linear; dups_ivf at tau 0.4 carries
    # some output growth like embedding_dups_lsh, whose measured 0.72
    # shows the guard headroom absorbs it.)
    "embedding_dups_ivf (3-probe)",
    "semantic_dedup (IVF)",
}


def scaled_docs(spark, sf_dir: str, m: int):
    base = load_table(spark, sf_dir, "documents")
    n = base.agg(F.max("doc_id")).first()[0] + 1
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replicatok{i}")).alias("text"),
            "lang",
            "source",
        )
        for i in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_vecs(spark, sf_dir: str, m: int):
    base = load_table(spark, sf_dir, "embeddings")
    n = base.agg(F.max("vec_id")).first()[0] + 1
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, idx: F.element_at(
                    F.col("embedding"),
                    ((idx + F.lit(i * 7)) % F.size("embedding") + 1).cast(
                        "int"
                    ),
                ),
            ).alias("embedding"),
            "label",
        )
        for i in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


OPS = {
    "dedup_exact": lambda d, v: dedup.exact_dups(d),
    "ngram_jaccard (prefix)": lambda d, v: dedup.ngram_jaccard_pairs(d, 0.8),
    "containment (prefix)": lambda d, v: dedup.containment_pairs(d, 0.9),
    "minhash_lsh": lambda d, v: dedup.minhash_lsh_dups(d, 0.8),
    "winnow_substring": lambda d, v: dedup.substring_dup_pairs(d),
    "simhash": lambda d, v: dedup.simhash(d),
    "ann_lsh_topk": lambda d, v: similarity.ann_lsh_topk(v, 17, 10),
    "embedding_dups_lsh (8x8 banded)": lambda d, v: similarity.embedding_dup_pairs_lsh(v, 0.4),
    # balanced sqrt-sized quantizer (r5 default); the two single-horn
    # alternatives stay measured for the A/B record
    "embedding_dups_ivf (3-probe)": lambda d, v: similarity.embedding_dup_pairs_ivf(v, 0.4),
    "embedding_dups_ivf (growing cells)": lambda d, v: similarity.embedding_dup_pairs_ivf(
        v, 0.4, max_cells=None
    ),
    "embedding_dups_ivf (capped 32)": lambda d, v: similarity.embedding_dup_pairs_ivf(
        v, 0.4, max_cells=32
    ),
    "semantic_dedup (IVF)": lambda d, v: similarity.semantic_dedup(v),
    # iterative/closed-form trainers (r3): corpus-sized work only at the
    # boundary aggregates — expect ~linear-or-flat
    "bpe_train (10 merges)": lambda d, v: bpe.train_merges(d)[1],
    "nb_classify": lambda d, v: classify.nb_confusion(d),
    # r3 curation ops: chunk report joins on the duplicate-sized shared-
    # hash set (expect ~linear); tfidf is two hash aggs + a token-key
    # join + doc window (expect ~linear in corpus, n log n in doc terms)
    "cdc_chunk_report": lambda d, v: dedup.cdc_dedup_report(d),
    "tfidf_topk": lambda d, v: text_analysis.tfidf_terms(d),
    "ngram_diversity": lambda d, v: text_analysis.ngram_diversity(d),
    # late-r3 ops: IVF-PQ queries only code rows of probed cells (expect
    # ~flat after the encode scans); LPA is per-round joins over the
    # blocked k-NN edge list; video dedup is a df-capped inverted-index
    # join over frame signatures; semantic decontamination probes the
    # banded index with the fixed-fraction bench side
    "ivfpq_topk": lambda d, v: _sim().ivfpq_topk(v, 17, 10),
    "knn_communities (LPA)": lambda d, v: _graph().knn_communities(v),
    "video_dedup (frame sigs)": lambda d, v: _mm().video_dup_pairs(
        _mm().synthesize_media(d)
    ),
    "semantic_decontaminate": lambda d, v: _sim().semantic_decontaminate(v, 0.4),
    # r4 additions: the remaining banded/blocked candidate generators.
    # image/audio run the full codec render+decode+banded-Hamming pipeline
    # (codec cost is linear per doc; the join is bucket-blocked); spatial
    # ops are grid-cell-blocked 3x3 probes. Replica siblings share
    # near-identical pixels/waveforms, so like the text pair ops their
    # TRUE output grows ~m^2 — alphas are output-inclusive upper bounds.
    "image_dedup (banded aHash)": lambda d, v: _mm().image_dup_pairs(
        _mm().ahash64(_mm().synthesize_png_corpus(d))
    ),
    "audio_dedup (banded envelope)": lambda d, v: _mm().image_dup_pairs(
        _mm().audio_fingerprints(_mm().synthesize_wav_corpus(d))
    ),
    "spatial_join (grid)": lambda d, v: _spatial().grid_distance_join(
        _spatial().synthesize_points(_events(d))
    ),
    "dbscan (grid+CC)": lambda d, v: _spatial().dbscan(
        _spatial().synthesize_points(_events(d))
    ),
    # r7: the distributed CC loop FORCED (every probe scale is under the
    # 2^22-edge driver cap, so the auto path would never exercise the
    # >cap iteration — this row keeps the cluster-scale path's own curve
    # on the record alongside the driver fast path dbscan now measures)
    "cc_distributed (forced >cap path)": lambda d, v: _clustering()
    .connected_components(
        _spatial().grid_distance_join(
            _spatial().synthesize_points(_events(d))
        ).select("id_a", "id_b"),
        src="id_a",
        dst="id_b",
        strategy="distributed",
    ),
    # r4 sketch family: one-scan mergeable register builds — output is
    # BOUNDED (2^p registers / depth*width cells) regardless of corpus, so
    # the curve should be flat-to-linear (scan cost only). Guarded.
    "hll_registers (sketch)": lambda d, v: _sketches().hll_registers(
        d, "text", ["lang"]
    ),
    "cms_counters (sketch)": lambda d, v: _sketches().cms_portable_counters(
        d, "doc_id"
    ),
}


def _sketches():
    from cdc_poc_spark.operators import sketches

    return sketches

def _events(docs):
    """Synthesize an events-shaped frame from the scaled docs (user_id /
    value / ts columns derived deterministically from doc_id), so the
    spatial ops scale with the same replica factor as everything else."""
    return docs.select(
        F.col("doc_id").alias("event_id"),
        (F.col("doc_id") % 1500).alias("user_id"),
        (F.pmod(F.col("doc_id") * 37, F.lit(10000)) / 100.0).alias("value"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.col("doc_id") * 61, F.lit(2592000))
        ).alias("ts"),
        F.lit("view").alias("event_type"),
    )


def _spatial():
    from cdc_poc_spark.operators import spatial

    return spatial


def _clustering():
    from cdc_poc_spark.operators import clustering

    return clustering


def _sim():
    return similarity


def _graph():
    from cdc_poc_spark.operators import graph

    return graph


def _mm():
    from cdc_poc_spark.operators import multimodal

    return multimodal


def _run_one_scale(base: str, m: int) -> tuple[dict[str, float], dict[str, int]]:
    """Measure every (filtered) op at replica factor ``m`` in THIS JVM:
    warm each op's codegen at 1x, then time at m."""
    spark = get_spark(
        "scaling-curve", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for fn in OPS.values():
        fn(scaled_docs(spark, base, 1), scaled_vecs(spark, base, 1)).count()
    free_caches(spark)
    results: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    docs = scaled_docs(spark, base, m).persist()
    vecs = scaled_vecs(spark, base, m).persist()
    nd, nv = docs.count(), vecs.count()
    print(f"--- {m}x: {nd} docs, {nv} vectors", file=sys.stderr)
    for name, fn in OPS.items():
        free_caches(spark)
        docs.persist().count(); vecs.persist().count()  # re-pin inputs
        t0 = time.perf_counter()
        rows_out[name] = fn(docs, vecs).count()
        results[name] = time.perf_counter() - t0
    return results, rows_out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--ops",
        default=None,
        help="comma-separated substring filter over operator names",
    )
    ap.add_argument(
        "--single-scale",
        type=int,
        default=None,
        help="internal: measure one replica factor in this JVM and print "
        "a JSON line",
    )
    ap.add_argument(
        "--reps",
        type=int,
        default=1,
        help="fresh-JVM repetitions per scale; each cell reports the "
        "per-op MEDIAN across reps (round-8 verdict item 5: single-rep "
        "cells carry scheduler artifacts — the r7 2x column had dbscan "
        "13.6s between 2.2s/3.5s neighbours)",
    )
    args = ap.parse_args()
    if args.ops:
        pats = [p.strip().lower() for p in args.ops.split(",")]
        keep = {k: v for k, v in OPS.items() if any(p in k.lower() for p in pats)}
        OPS.clear()
        OPS.update(keep)

    if args.single_scale is not None:
        import json

        r, rows = _run_one_scale(args.base, args.single_scale)
        print(json.dumps({"m": args.single_scale, "results": r, "rows": rows}))
        return

    # One FRESH JVM per replica factor. Learned the measured way (round
    # 5): a single 100+-plan session degrades its late measurements —
    # first via JIT-code-cache exhaustion (fixed in session.py), then
    # via residual heap/GC pressure that inflated one op's 8x point 5x
    # over its fresh-JVM time (19.2s vs 97-115s, identical deterministic
    # work). Per-scale isolation makes every cell of the table a
    # fresh-JVM measurement, comparable across rounds and scales.
    import json
    import subprocess

    results: dict[str, dict[int, float]] = {k: {} for k in OPS}
    rows_out: dict[str, dict[int, int]] = {k: {} for k in OPS}
    for m in REPLICAS:
        reps: list[dict] = []
        for _ in range(max(1, args.reps)):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--base", args.base, "--single-scale", str(m)]
            if args.ops:
                cmd += ["--ops", args.ops]
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True
            )
            print(out.stderr.splitlines()[-1] if out.stderr else "",
                  file=sys.stderr)
            reps.append(json.loads(out.stdout.strip().splitlines()[-1]))
        import statistics

        for name in reps[0]["results"]:
            results[name][m] = statistics.median(
                r["results"][name] for r in reps
            )
            rows_out[name][m] = reps[0]["rows"][name]
            rows_set = {r["rows"][name] for r in reps}
            if len(rows_set) > 1:  # deterministic ops: reps must agree
                raise SystemExit(
                    f"row-count disagreement across reps for {name} at "
                    f"{m}x: {sorted(rows_set)}"
                )
    print("| operator | " + " | ".join(f"{m}x" for m in REPLICAS) + " | alpha |")
    print("|---|" + "---|" * (len(REPLICAS) + 1))
    alphas: dict[str, float] = {}
    for name in OPS:
        r = results[name]
        alpha = math.log(r[REPLICAS[-1]] / r[REPLICAS[0]]) / math.log(REPLICAS[-1])
        alphas[name] = alpha
        cells = " | ".join(f"{r[m]:.2f}s" for m in REPLICAS)
        print(f"| {name} | {cells} | {alpha:.2f} |")
    print("\nrows:", {k: v for k, v in rows_out.items()}, file=sys.stderr)

    # Regression guard: ops whose TRUE output grows linearly with the
    # corpus (no m^2 replica-sibling pair blowup) must stay comfortably
    # sub-quadratic — alpha > GUARD_ALPHA here means a blocked/banded
    # candidate path degraded to something scan-square-ish. The pair ops
    # with output-inclusive alphas (jaccard/containment/minhash/winnow/
    # image/audio) are deliberately NOT guarded: their measured exponent
    # tracks output size, not algorithm cost (see module docstring).
    violations = {
        n: a for n, a in alphas.items() if n in LINEAR_OUTPUT_OPS and a > GUARD_ALPHA
    }
    if violations:
        print(f"ALPHA GUARD FAILED (> {GUARD_ALPHA}): {violations}", file=sys.stderr)
        sys.exit(1)
    guarded = [n for n in alphas if n in LINEAR_OUTPUT_OPS]
    print(f"alpha guard OK: {len(guarded)} linear-output ops <= {GUARD_ALPHA}",
          file=sys.stderr)


if __name__ == "__main__":
    main()

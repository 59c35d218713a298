"""Hypothesis property tests for the cross-engine hard parts (SURVEY §7.5):
metric arithmetic parity with DuckDB on arbitrary inputs, and wire-format
timestamp round-trips at microsecond precision."""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_poc_spark.functions.metrics import engagement_pct, engagement_seconds
from cdc_poc_spark.functions.timeutil import format_wire_ntz, parse_wire_ntz

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

pairs = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=10**9)),
        st.one_of(st.none(), st.integers(min_value=-10, max_value=10**6)),
    ),
    min_size=1,
    max_size=60,
)


@given(pairs)
@settings(**_SETTINGS)
def test_engagement_metrics_match_duckdb(spark, batch):
    """O4/O5 on arbitrary (duration_ms, length_seconds), incl. the edge
    cases: sub-second durations, zero/negative/NULL lengths, huge values."""
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("length_seconds", T.IntegerType()),
        ]
    )
    rows = [
        (i, d if d is None else min(d, 2**31 - 1), ln)
        for i, (d, ln) in enumerate(batch)
    ]
    df = spark.createDataFrame(rows, schema)
    es = engagement_seconds(F.col("duration_ms"))
    got = {
        r["i"]: (r["es"], r["pct"])
        for r in df.select(
            "i",
            es.alias("es"),
            engagement_pct(es, F.col("length_seconds")).alias("pct"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, duration_ms INTEGER, length_seconds INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT i,
                   CAST(duration_ms // 1000 AS INTEGER) AS es,
                   CASE WHEN duration_ms IS NOT NULL AND length_seconds > 0
                        THEN round(round((duration_ms // 1000) / length_seconds, 4) * 100, 2)
                   END AS pct
            FROM t"""
        ).fetchall()
    }
    assert got == want


timestamps = st.lists(
    st.datetimes(
        min_value=dt.datetime(1970, 1, 1),
        max_value=dt.datetime(2262, 1, 1),
    ),
    min_size=1,
    max_size=60,
)


@given(timestamps)
@settings(**_SETTINGS)
def test_wire_timestamp_roundtrip(spark, batch):
    """F1/F3: parse_wire_ntz(format_wire_ntz(ts)) == ts for arbitrary
    microsecond NTZ timestamps (tz-free both ways)."""
    schema = T.StructType(
        [T.StructField("i", T.LongType()), T.StructField("ts", T.TimestampNTZType())]
    )
    rows = [(i, ts) for i, ts in enumerate(batch)]
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        "i", parse_wire_ntz(format_wire_ntz("ts")).alias("rt"), "ts"
    ).collect()
    for r in out:
        assert r["rt"] == r["ts"], (r["ts"], r["rt"])


json_texts = st.lists(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
            max_codepoint=0x2FFF,
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=40,
)


@given(json_texts)
@settings(**_SETTINGS)
def test_envelope_roundtrip_arbitrary_payloads(spark, texts):
    """O1 wire robustness: arbitrary unicode payloads (quotes, newlines,
    control chars, CJK) must survive envelope serialize -> parse intact."""
    from cdc_poc_spark.sources import debezium

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("raw_payload", T.StringType()),
        ]
    )
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, schema)
    wire = df.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.struct("id", "raw_payload").alias("after"),
                    F.lit("c").alias("op"),
                ).alias("payload")
            )
        ).alias("value")
    )
    parsed = debezium.good_rows(debezium.parse_envelope(wire, schema))
    got = {r["id"]: r["raw_payload"] for r in parsed.collect()}
    assert got == dict(rows)


_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=400
)


@given(_words)
@settings(**_SETTINGS)
def test_chunking_reconstructs_document(spark, toks):
    """Property: at any token count, the chunk starts tile the doc at the
    stride, every token index is covered by >= 1 chunk, and concatenating
    the NON-overlapping prefix of each chunk (stride tokens, all of the
    last) reconstructs the document exactly."""
    from cdc_poc_spark.operators.packing import chunk_documents

    text = " ".join(toks)
    docs = spark.createDataFrame([(1, text, "en")], "doc_id long, text string, lang string")
    chunks = sorted(
        chunk_documents(docs, window=128, stride=96).collect(),
        key=lambda r: r.chunk_idx,
    )
    n = len([t for t in toks if t])
    if n == 0:
        assert chunks == []
        return
    assert [c.start_tok for c in chunks] == list(range(0, n, 96))
    rebuilt = []
    for c in chunks[:-1]:
        rebuilt.extend(c.chunk_text.split(" ")[:96])
    rebuilt.extend(chunks[-1].chunk_text.split(" "))
    assert rebuilt == [t for t in toks if t]
    assert all(c.n_tokens <= 128 for c in chunks)


@given(
    st.text(alphabet="xyzw ", min_size=40, max_size=120),
    st.text(alphabet="qrst ", min_size=40, max_size=120),
    st.text(alphabet="mnop", min_size=27, max_size=60),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
)
@settings(**_SETTINGS)
def test_winnow_guarantee_property(spark, pre_a, pre_b, shared, off_a, off_b):
    """Winnowing guarantee on arbitrary strings: two docs sharing ANY
    substring of length >= K + G - 1 = 27 share >= 1 fingerprint, wherever
    the substring is placed (disjoint alphabets keep the docs otherwise
    unrelated)."""
    from cdc_poc_spark.operators import dedup

    a = pre_a[:off_a] + shared + pre_a[off_a:]
    b = pre_b[:off_b] + shared + pre_b[off_b:]
    docs = spark.createDataFrame(
        [(1, a, "en"), (2, b, "en")], "doc_id long, text string, lang string"
    )
    pairs = dedup.substring_dup_pairs(docs, min_shared=1, max_df_frac=None).collect()
    assert any((r.doc_a, r.doc_b) == (1, 2) for r in pairs)


_doc_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=60), min_size=2, max_size=5
)


@given(_doc_texts)
@settings(**_SETTINGS)
def test_minhash_banding_collision_guarantee(spark, texts):
    """LSH banding exactness: the candidate set equals EXACTLY the pairs
    whose MinHash signatures agree on every row of >= 1 band (computed
    independently from the collected signatures, mirroring the concat_ws
    bucket key). In particular two docs with identical shingle sets have
    identical signatures and MUST collide — the recall half of the banding
    claim that differential parity can't check (a matched pair of banding
    bugs would still agree)."""
    from cdc_poc_spark.operators import dedup

    num_hashes, bands = 8, 4
    rows_per_band = num_hashes // bands
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    sig_rows = dedup.minhash_signatures(docs, num_hashes).collect()
    keys = {
        r.doc_id: [
            "_".join(
                str(v)
                for v in (r[f"sig_{b * rows_per_band + j}"] for j in range(rows_per_band))
                if v is not None
            )
            for b in range(bands)
        ]
        for r in sig_rows
    }
    ids = sorted(keys)
    expected = {
        (x, y)
        for xi, x in enumerate(ids)
        for y in ids[xi + 1 :]
        if any(keys[x][b] == keys[y][b] for b in range(bands))
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_candidates(docs, num_hashes, bands).collect()
    }
    assert got == expected


@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
@settings(**_SETTINGS)
def test_image_banding_pigeonhole_property(spark, base, flip_bits):
    """Banded-Hamming pigeonhole: any pair of 64-bit hashes within the
    default max_hamming (3 < 4 bands) MUST surface as a dup pair — with
    bands > max_hamming at least one 16-bit band has no flipped bit, so the
    equi-join on (band, key) always produces the candidate."""
    from cdc_poc_spark.operators import multimodal

    # flip in unsigned-64 space, then wrap back to signed: Python's
    # arbitrary-precision XOR on a negative base would otherwise walk
    # out of int64 range when bit 63 flips
    other = base & ((1 << 64) - 1)
    for b in flip_bits:
        other ^= 1 << b
    other = other - (1 << 64) if other >= 2**63 else other
    hashed = spark.createDataFrame(
        [(0, base), (1, other)], "media_id long, ahash long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in multimodal.image_dup_pairs(hashed).collect()
    }
    assert got == {(0, 1, len(flip_bits))}


@given(
    _words,
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=1, max_value=40),
)
@settings(**_SETTINGS)
def test_chunking_covers_arbitrary_window_stride(spark, toks, window, stride):
    """Chunk coverage at ARBITRARY window/stride (the fixed-128/96 test
    can't catch an off-by-one that only bites at other geometries): starts
    tile at the stride from 0 past the last token, every token index is
    inside >= 1 chunk, and no chunk exceeds the window."""
    from cdc_poc_spark.operators.packing import chunk_documents

    stride = min(stride, window)  # standard overlap regime
    text = " ".join(toks)
    docs = spark.createDataFrame(
        [(1, text, "en")], "doc_id long, text string, lang string"
    )
    chunks = sorted(
        chunk_documents(docs, window=window, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    n = len([t for t in toks if t])
    if n == 0:
        assert chunks == []
        return
    assert [c.start_tok for c in chunks] == list(range(0, n, stride))
    covered = set()
    for c in chunks:
        assert 1 <= c.n_tokens <= window
        covered.update(range(c.start_tok, c.start_tok + c.n_tokens))
    assert covered == set(range(n))


_corpus = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=80), min_size=2, max_size=6
)


def _py_shingle_sets(texts, k=3):
    out = {}
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        out[i] = {
            " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
        } if len(toks) >= k else set()
    return out


@given(_corpus, st.sampled_from([0.3, 0.5, 0.8, 1.0]))
@settings(**_SETTINGS)
def test_prefix_filter_jaccard_lossless(spark, texts, t):
    """The AllPairs prefix-filtered candidate generation must be LOSSLESS:
    ngram_jaccard_pairs equals the brute-force all-pairs Jaccard over the
    df-filtered shingle sets, at any threshold. (A candidate-pruning bug
    would silently drop pairs — the one thing a dedup pipeline must not
    do; the oracle can't catch it if mirrored, so this is pure Python.)"""
    from cdc_poc_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, txt, "en") for i, txt in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    sets = _py_shingle_sets(texts)
    n_docs = len(texts)
    df = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    filt = {
        i: {g for g in s if df[g] <= n_docs * dedup.MAX_SHINGLE_DF_FRAC}
        for i, s in sets.items()
    }
    expected = {}
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            inter = len(filt[a] & filt[b])
            union = len(filt[a]) + len(filt[b]) - inter
            if union and inter / union >= t:
                expected[(a, b)] = (inter, inter / union)
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, t, cache=False).collect()
    }
    assert got == expected


@given(_corpus, st.sampled_from([0.5, 0.8, 0.9, 1.0]))
@settings(**_SETTINGS)
def test_prefix_filter_containment_lossless(spark, texts, t):
    """Same losslessness bar for the containment direction: the prefix ⋈
    full-index candidates must reproduce brute-force max-direction
    containment exactly at any threshold."""
    from cdc_poc_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, txt, "en") for i, txt in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    sets = _py_shingle_sets(texts)
    n_docs = len(texts)
    df = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    filt = {
        i: {g for g in s if df[g] <= n_docs * dedup.MAX_SHINGLE_DF_FRAC}
        for i, s in sets.items()
    }
    expected = set()
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            inter = len(filt[a] & filt[b])
            if not (filt[a] and filt[b]):
                continue
            if max(inter / len(filt[a]), inter / len(filt[b])) >= t:
                expected.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.containment_pairs(docs, t, cache=False).collect()
    }
    assert got == expected


_names = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=6),
    min_size=2,
    max_size=12,
    unique=True,
)


@given(_names)
@settings(**_SETTINGS)
def test_fastss_fuzzy_pairs_complete(spark, names):
    """FastSS deletion-neighborhood blocking must be COMPLETE for edit
    distance 1: fuzzy_string_pairs equals the brute-force all-pairs
    levenshtein==1 set on any dictionary. (The blocking claim — two
    strings within distance 1 always share a 1-deletion variant — is the
    kind of candidate-pruning invariant a mirrored oracle cannot check;
    small alphabet + short strings makes distance-1 pairs dense.)"""
    from cdc_poc_spark.operators.text_analysis import fuzzy_string_pairs

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expected = set()
    for i, x in enumerate(names):
        for y in names[i + 1 :]:
            if lev(x, y) == 1:
                expected.add((min(x, y), max(x, y)))
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {(r.val_a, r.val_b) for r in fuzzy_string_pairs(df, "name").collect()}
    assert got == expected


_vecs = st.lists(
    st.lists(
        st.integers(min_value=-8, max_value=8).map(float),
        min_size=8,
        max_size=8,
    ),
    min_size=3,
    max_size=20,
)


@given(_vecs, st.sampled_from([0.3, 0.7, 0.95]))
@settings(**_SETTINGS)
def test_banded_hyperplane_lsh_matches_python(spark, vecs, tau):
    """Banded hyperplane LSH end-to-end differential against an
    independent pure-Python implementation: the output pair set must
    equal {pairs sharing >= 1 full band key} ∩ {cosine >= tau}, with
    band keys and cosines recomputed from the same md5-derived
    hyperplanes via plain Python floats (IEEE doubles, sequential sums —
    the same fold order as the Spark expression). The SQL oracle mirrors
    the Spark construction, so only an independent reimplementation can
    catch a matched candidate-generation bug (the winnowing lesson)."""
    from cdc_poc_spark.operators import similarity as S

    dim, bands, rows = 8, 4, 4
    w = S.hyperplane_weights(bands * rows, dim)
    keys = {}
    for vid, v in enumerate(vecs):
        ks = []
        for b in range(bands):
            key = 0
            for j in range(rows):
                proj = 0.0
                for x, wx in zip(v, w[b * rows + j]):
                    proj += x * float(wx)
                if proj > 0:
                    key += 1 << j
            ks.append(key)
        keys[vid] = ks

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        na = nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return num / (na**0.5 * nb**0.5) if na and nb else float("nan")

    expected = set()
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            if any(keys[a][i] == keys[b][i] for i in range(bands)):
                c = cos(vecs[a], vecs[b])
                if c >= tau:
                    expected.add((a, b))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in S.embedding_dup_pairs_lsh(
            df, tau, bands=bands, rows=rows, dim=dim
        ).collect()
    }
    assert got == expected


_hostile_floats = st.floats(
    min_value=-1e30,
    max_value=1e30,
    allow_nan=False,
    allow_infinity=False,
)
_hostile_vecs = st.lists(
    st.lists(_hostile_floats, min_size=6, max_size=6),
    min_size=2,
    max_size=12,
)


@given(_hostile_vecs)
@settings(**_SETTINGS)
def test_fold_kernels_bit_identical(spark, vecs):
    """The Arrow kernels (functions/veckernels.py) must produce the SAME
    doubles as the interpreted zip_with+aggregate folds they replace —
    not approximately equal: the banded signature keys feed equi-joins,
    so a single rounding divergence near a zero projection silently
    changes the candidate set AND breaks DuckDB-oracle parity. Hostile
    magnitudes (up to 1e30) make any fold-order or pairwise-summation
    deviation visible; equality is checked with <=> on the raw doubles
    and == on the packed keys."""
    from cdc_poc_spark.functions import veckernels as VK
    from cdc_poc_spark.operators import similarity as S

    dim, bands, rows = 6, 3, 4
    w = S.hyperplane_weights(bands * rows, dim)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    expr = df.select(
        "vec_id",
        *[
            S.lsh_bucket(
                F.col("embedding"), w[b * rows : (b + 1) * rows]
            ).alias(f"k{b}")
            for b in range(bands)
        ],
        S.dot(F.col("embedding"), F.col("embedding")).alias("d_expr"),
    )
    kern = df.select(
        "vec_id",
        VK.banded_keys(F.col("embedding"), w, rows).alias("keys"),
        VK.fold_dot(
            F.col("embedding"), F.col("embedding"), dim
        ).alias("d_kern"),
    )
    joined = expr.join(kern, "vec_id")
    key_ok = " AND ".join(f"k{b} = keys[{b}]" for b in range(bands))
    bad = joined.filter(~F.expr(f"({key_ok}) AND d_expr <=> d_kern"))
    assert bad.count() == 0, bad.collect()


def test_grid_distance_join_matches_brute_force(spark):
    """Spatial-join completeness: the 3x3 cell-neighbourhood candidates
    must recover EXACTLY the brute-force pair set within eps, including
    pairs straddling cell borders (the pigeonhole the neighbourhood
    explode exists for)."""
    from itertools import combinations

    from cdc_poc_spark.operators.spatial import grid_distance_join

    eps = 1.5
    pts = [
        (0, 0.1, 0.1),
        (1, 1.45, 0.1),    # same-ish row, 1.35 apart -> pair with 0
        (2, 1.6, 1.6),     # diagonal cell from 0, ~2.1 from 0 (no), 1.51 from 1 (no)
        (3, 2.9, 0.1),     # cell border straddle: 1.45 from 1 -> pair
        (4, 2.95, 0.2),    # 0.11 from 3 -> pair; 1.50 from 1 (boundary-ish)
        (5, 50.0, 50.0),   # isolated
        (6, 49.0, 50.5),   # 1.118 from 5 -> pair
    ]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    got = {(r.id_a, r.id_b) for r in grid_distance_join(df, eps).collect()}
    want = {
        (a, b)
        for (a, xa, ya), (b, xb, yb) in combinations(pts, 2)
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps
    }
    assert got == want and want  # non-empty and exact


def test_dbscan_constructed_clusters(spark):
    """DBSCAN semantics on constructed geometry: two dense blobs separated
    by more than eps form two clusters; a point within eps of one blob but
    with too few neighbours is a border member; a far point is noise
    (absent from the output)."""
    from cdc_poc_spark.operators.spatial import dbscan

    eps, blob = 1.0, []
    # blob A around (0,0): 5 mutually-close points -> all core
    blob += [(i, 0.0 + i * 0.1, 0.0) for i in range(5)]
    # blob B around (100,100): 4 mutually-close points -> all core
    blob += [(10 + i, 100.0 + i * 0.1, 100.0) for i in range(4)]
    # border: 0.9 from blob A's edge point (id 4 at x=0.4), neighbours = {4} only
    blob += [(20, 1.3, 0.0)]
    # noise: nowhere near anything
    blob += [(30, 500.0, 500.0)]
    df = spark.createDataFrame(blob, "point_id long, x double, y double")
    got = {r.point_id: (r.cluster_id, r.role) for r in dbscan(df, eps=eps).collect()}
    assert 30 not in got                       # noise excluded
    assert got[20] == (0, "border")            # attached to blob A's cluster
    assert {got[i] for i in range(5)} == {(0, "core")}
    assert {got[10 + i] for i in range(4)} == {(10, "core")}


# --- round-4 primitives: distributed rank and portable CMS ---

unique_keys = st.lists(
    st.integers(min_value=-(10**12), max_value=10**12),
    min_size=1,
    max_size=80,
    unique=True,
)


@given(unique_keys)
@settings(**_SETTINGS)
def test_global_rank_property(spark, keys):
    """global_rank (bucketed distributed rank, no single-partition sort)
    must equal the sorted-enumerate rank for ANY unique numeric key set —
    negative, clustered, or adversarially gapped keys included."""
    from cdc_poc_spark.functions.partitioning import global_rank

    df = spark.createDataFrame([(int(k),) for k in keys], "k long").repartition(3)
    got = {r["k"]: r["_r"] for r in global_rank(df, "k").collect()}
    assert got == {k: i for i, k in enumerate(sorted(keys))}


cms_corpora = st.lists(
    st.integers(min_value=0, max_value=50),
    min_size=1,
    max_size=120,
)


@given(cms_corpora)
@settings(**_SETTINGS)
def test_cms_portable_never_underestimates(spark, vals):
    """Count-Min structural guarantee on arbitrary multisets: the portable
    sketch estimate is >= the true count for EVERY key, and exact when the
    distinct-key set is far below the width (no forced collisions)."""
    from collections import Counter

    from cdc_poc_spark.operators.sketches import cms_portable_heavy_hitters

    facts = spark.createDataFrame([(int(v),) for v in vals], "k long")
    est = {
        r["k"]: r["est_count"]
        for r in cms_portable_heavy_hitters(facts, facts, "k").collect()
    }
    true = Counter(vals)
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t


# --- Debezium parser totality: arbitrary bytes never crash the pipeline ---

wire_strings = st.lists(
    st.one_of(
        st.text(max_size=80),  # arbitrary unicode, usually not JSON
        st.text(
            alphabet='{}[]":,abcdef0123456789 \n\t', max_size=80
        ),  # JSON-shaped fragments (braces, quotes, partial structures)
        st.just(""),
        st.just("null"),
        st.just("{}"),
        st.just('{"payload": null}'),
        st.just('{"payload": {"after": null, "op": "d"}}'),
        st.just('{"payload": {"after": {"id": "not-an-int"}, "op": "c"}}'),
    ),
    min_size=1,
    max_size=25,
)


@given(wire_strings)
@settings(**_SETTINGS)
def test_debezium_parse_is_total(spark, raws):
    """O8 totality: EVERY input row lands in exactly one of good / dropped
    / dead-letter — no crash, no lost row — for arbitrary junk bytes,
    JSON-shaped fragments, and type-mismatched payloads alike."""
    from cdc_poc_spark.schemas import ENGAGEMENT_EVENT_SCHEMA
    from cdc_poc_spark.sources import debezium

    raw = spark.createDataFrame([(s,) for s in raws], "value string")
    parsed = debezium.parse_envelope(raw, ENGAGEMENT_EVENT_SCHEMA)
    n_good = debezium.good_rows(parsed).count()
    n_dead = debezium.dead_letters(parsed).count()
    n_drop = debezium.dropped(parsed).count()
    assert n_good + n_dead + n_drop == len(raws)


# --- changelog apply: CDC compaction vs a reference fold ---

changelogs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # row key
        st.integers(min_value=0, max_value=40),  # sequence (change order)
        st.sampled_from(["c", "u", "d"]),  # op
        st.integers(min_value=-100, max_value=100),  # payload value
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: (t[0], t[1]),  # one change per (key, seq)
)


@given(changelogs)
@settings(**_SETTINGS)
def test_changelog_apply_matches_reference_fold(spark, changes):
    """T8/upsert semantics on arbitrary change streams: the materialized
    state must equal a sequential per-key fold (latest change wins; keys
    whose latest change is a delete are absent) regardless of input
    order, op mix, or how many changes pile on one key."""
    from cdc_poc_spark.sources.debezium import changelog_apply

    df = spark.createDataFrame(
        changes, "k long, seq long, _op string, v long"
    )
    got = {
        (r["k"]): (r["seq"], r["v"])
        for r in changelog_apply(df, ["k"], ["seq"]).collect()
    }
    # reference: python fold in seq order per key
    last: dict[int, tuple[int, str, int]] = {}
    for k, seq, op, v in changes:
        if k not in last or seq > last[k][0]:
            last[k] = (seq, op, v)
    want = {k: (seq, v) for k, (seq, op, v) in last.items() if op != "d"}
    assert got == want

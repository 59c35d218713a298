"""Distributed synthetic-workload generator — the Spark twin of the
reference's load generator (reference data-generator/generator.py:112-173 and
the plpgsql helpers sql/init.sql:82-114; SURVEY §2 rows F10/W4).

The reference pushes 1 M rows / 5 min through one Python process with 8
insert threads (generator.py:175-200,227-251). Here generation IS a Spark
job: ``spark.range(n)`` spreads row ids across executors and every column is
a Catalyst expression — no driver loop, no Python UDF, no collect. Producing
a 100 TB load test is the same plan with a bigger ``n`` and more executors.

Randomness is *derived, not drawn*: each per-row uniform is a seeded md5
hash of the row id mapped into [0, 1). That keeps the output

- deterministic for a given seed (goldens and CI don't flake),
- independent of partitioning/parallelism (unlike ``F.rand``, whose draw
  depends on the partition index — a repartitioned rerun changes values),
- reproducible shard-by-shard: row ``i`` is the same event no matter which
  executor computes it, so a failed task retry is idempotent by construction.

Distribution spec mirrored from the reference:
- event types weighted {play .45, pause .25, click .20, finish .10}
  (generator.py:50-55)
- duration: click -> NULL; play 5-95 %, pause 10-80 %, finish 85-100 % of
  ``length_seconds * 1000`` (generator.py:93-110)
- event_ts uniform over the trailing 10 minutes (generator.py:129)
- devices: 6-way uniform (generator.py:46); payload JSON with
  device-dependent source, session id, and event-specific fields incl.
  nested click coordinates and a 30 %-present finish rating
  (generator.py:138-161)
- content drawn uniformly from the dimension (generator.py:118) — at scale
  this is the *deliberate* hot-key skew SURVEY §7.5.7 plans for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long_seeded
from ..schemas import VALID_CONTENT_TYPES

DEVICES = ("ios", "android", "web-chrome", "web-safari", "web-firefox", "desktop")
MOBILE_DEVICES = ("ios", "android")
EVENT_WEIGHTS = {"play": 0.45, "pause": 0.25, "click": 0.20, "finish": 0.10}
DURATION_BANDS = {"play": (0.05, 0.95), "pause": (0.10, 0.80), "finish": (0.85, 1.00)}
CLICK_ELEMENTS = ("play_button", "share_button", "like_button", "subscribe")
QUALITIES = ("SD", "HD", "4K")
DEFAULT_USER_POOL = 10_000
DEFAULT_END_TS = "2026-01-01 00:00:00"
TRAILING_WINDOW_S = 600

_U_MOD = 1_000_000


def _uniform(col: Column, seed: str) -> Column:
    """Deterministic uniform in [0, 1) from a seeded hash of ``col``."""
    return (md5_long_seeded(col, seed) % _U_MOD).cast("double") / _U_MOD


def _pick(col: Column, seed: str, choices: tuple[str, ...]) -> Column:
    """Uniform pick from a small tuple (1-indexed element_at)."""
    idx = (md5_long_seeded(col, seed) % len(choices) + 1).cast("int")
    return F.element_at(F.array(*[F.lit(c) for c in choices]), idx)


def _uuidish(col: Column, seed: str) -> Column:
    """Deterministic UUID-shaped string (8-4-4-4-12 hex groups) — the
    generator's fake.uuid4() twin, md5-derived so it is stable per row."""
    h = F.md5(F.concat(F.lit(seed), col.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def _weighted_event_type(u: Column) -> Column:
    """CASE over the cumulative weight ladder — the Catalyst form of
    random.choices(weights=...)."""
    expr = None
    acc = 0.0
    items = list(EVENT_WEIGHTS.items())
    for name, w in items[:-1]:
        acc += w
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc, F.lit(name))
    return expr.otherwise(F.lit(items[-1][0]))


def gen_content(spark: SparkSession, n: int = 15, seed: str = "content") -> DataFrame:
    """The dimension table (reference sql/init.sql:40-60 seeds 15 rows):
    deterministic UUID ids, 3-way content types, plausible lengths."""
    rows = spark.range(n)
    i = F.col("id")
    ctype = _pick(i, f"{seed}:type", VALID_CONTENT_TYPES)
    return rows.select(
        _uuidish(i, f"{seed}:id").alias("id"),
        F.concat(F.lit("content-"), i.cast("string")).alias("slug"),
        F.concat(F.lit("Title "), i.cast("string")).alias("title"),
        ctype.alias("content_type"),
        # 180 s .. 5400 s, matching the seed-row range (init.sql:40-60)
        (F.lit(180) + (md5_long_seeded(i, f"{seed}:len") % 5221)).cast("int").alias(
            "length_seconds"
        ),
        (
            F.to_timestamp(F.lit(DEFAULT_END_TS))
            - F.make_interval(days=(md5_long_seeded(i, f"{seed}:age") % 365).cast("int"))
        ).alias("publish_ts"),
    )


def _payload(i: Column, event_type: Column, device: Column, seed: str) -> Column:
    """raw_payload JSON (generator.py:138-161): common fields + event-type
    specific extras; nulls dropped by to_json, matching the reference's
    dict-update construction."""
    rating_u = _uniform(i, f"{seed}:rating_p")
    payload = F.struct(
        F.when(device.isin(*MOBILE_DEVICES), F.lit("mobile_app"))
        .otherwise(F.lit("web_app"))
        .alias("source"),
        F.concat_ws(
            ".",
            (md5_long_seeded(i, f"{seed}:v1") % 3 + 1).cast("string"),
            (md5_long_seeded(i, f"{seed}:v2") % 10).cast("string"),
            (md5_long_seeded(i, f"{seed}:v3") % 10).cast("string"),
        ).alias("version"),
        _uuidish(i, f"{seed}:session").alias("session_id"),
        F.when(event_type == "play", _pick(i, f"{seed}:q", QUALITIES)).alias("quality"),
        F.when(event_type == "play", md5_long_seeded(i, f"{seed}:ap") % 2 == 0).alias(
            "autoplay"
        ),
        F.when(
            event_type == "finish",
            F.round(F.lit(0.85) + _uniform(i, f"{seed}:cr") * 0.15, 4),
        ).alias("completion_rate"),
        F.when(
            (event_type == "finish") & (rating_u < 0.3),
            (md5_long_seeded(i, f"{seed}:stars") % 5 + 1).cast("int"),
        ).alias("rating"),
        F.when(event_type == "click", _pick(i, f"{seed}:el", CLICK_ELEMENTS)).alias(
            "element"
        ),
        F.when(
            event_type == "click",
            F.struct(
                (md5_long_seeded(i, f"{seed}:x") % 1921).cast("int").alias("x"),
                (md5_long_seeded(i, f"{seed}:y") % 1081).cast("int").alias("y"),
            ),
        ).alias("coordinates"),
    )
    return F.to_json(payload)


def _indexed_dim(content: DataFrame) -> DataFrame:
    """The dimension with a deterministic dense 0..n-1 pick index (hash
    order, id tiebreak) — tiny, always broadcast."""
    return F.broadcast(
        content.select(
            (md5_long_seeded(F.col("id"), "dimorder") % (2**40)).alias("_ord"),
            F.col("id").alias("_content_id"),
            "length_seconds",
        )
        .withColumn(
            "_idx",
            F.row_number().over(Window.orderBy("_ord", "_content_id")) - 1,
        )
        .drop("_ord")
    )


def _assemble(
    rows: DataFrame,
    i: Column,
    event_ts: Column,
    dim: DataFrame,
    n_content: int,
    n_users: int,
    seed: str,
) -> DataFrame:
    """Shared batch/stream event assembly: one projection, one broadcast
    join against the pick index, one duration CASE — a single codegen
    stage either way."""
    etype = _weighted_event_type(_uniform(i, f"{seed}:etype"))
    device = _pick(i, f"{seed}:device", DEVICES)
    picked = (md5_long_seeded(i, f"{seed}:content") % n_content).cast("int")
    ev = rows.select(
        i.alias("event_id"),
        picked.alias("_pick"),
        _uuidish(md5_long_seeded(i, f"{seed}:user") % n_users, f"{seed}:userid").alias(
            "user_id"
        ),
        etype.alias("event_type"),
        event_ts.alias("event_ts"),
        _uniform(i, f"{seed}:dur").alias("_dur_u"),
        device.alias("device"),
        _payload(i, etype, device, seed).alias("raw_payload"),
    )
    joined = ev.join(dim, ev["_pick"] == dim["_idx"])
    duration = F.lit(None).cast("int")
    for name, (lo, hi) in DURATION_BANDS.items():
        frac = F.lit(lo) + F.col("_dur_u") * (hi - lo)
        duration = F.when(
            F.col("event_type") == name,
            F.floor(F.col("length_seconds") * 1000 * frac).cast("int"),
        ).otherwise(duration)
    return joined.select(
        F.col("event_id").alias("id"),
        F.col("_content_id").alias("content_id"),
        "user_id",
        "event_type",
        "event_ts",
        duration.alias("duration_ms"),
        "device",
        "raw_payload",
    )


def gen_events(
    spark: SparkSession,
    content: DataFrame,
    n: int,
    n_users: int = DEFAULT_USER_POOL,
    seed: str = "events",
    end_ts: str = DEFAULT_END_TS,
) -> DataFrame:
    """``n`` engagement events over the given content dimension, schema =
    ENGAGEMENT_EVENT_SCHEMA. One broadcast join (the dimension pick), zero
    shuffles, zero Python — the whole generator is one codegen stage."""
    n_content = content.count()
    rows = spark.range(n)
    i = F.col("id")
    event_ts = F.to_timestamp(F.lit(end_ts)) - F.make_interval(
        secs=(md5_long_seeded(i, f"{seed}:ts") % TRAILING_WINDOW_S).cast("double")
    )
    return _assemble(rows, i, event_ts, _indexed_dim(content), n_content, n_users, seed)


def gen_events_stream(
    spark: SparkSession,
    content: DataFrame,
    rows_per_second: int,
    n_users: int = DEFAULT_USER_POOL,
    seed: str = "events",
) -> DataFrame:
    """Continuous load generation as a Structured Streaming source — the
    running-forever mode of the reference generator (generator.py:214-262's
    rate loop). Built on the ``rate`` source: ``value`` is the event id and
    drives the same hash arithmetic as the batch path; ``event_ts`` is the
    arrival timestamp backdated a hashed 0-600 s (the reference draws
    timestamps uniform over the trailing 10 minutes). The dimension pick is
    a stream-static broadcast join, so the plan stays one stage per
    micro-batch and scales by adding executors, not driver threads."""
    n_content = content.count()
    rows = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    i = F.col("value")
    event_ts = F.col("timestamp") - F.make_interval(
        secs=(md5_long_seeded(i, f"{seed}:ts") % TRAILING_WINDOW_S).cast("double")
    )
    return _assemble(
        rows.select("value", "timestamp"),
        i,
        event_ts,
        _indexed_dim(content),
        n_content,
        n_users,
        seed,
    )


def wire_encode(events: DataFrame, delete_mod: int | None = None) -> DataFrame:
    """Serialize generated events into Debezium-enveloped JSON ``value``
    strings (the shape S2/O1 consume), optionally marking every
    ``delete_mod``-th id a delete (after=null, op='d'). Works on the batch
    and streaming outputs alike, closing the loop: generator -> wire ->
    parse_envelope -> enrich is a full synthetic CDC pipeline."""
    from ..functions.timeutil import format_wire_ntz

    after = F.struct(
        F.col("id"),
        F.col("content_id"),
        F.col("user_id"),
        F.col("event_type"),
        format_wire_ntz(F.col("event_ts").cast("timestamp_ntz")).alias("event_ts"),
        F.col("duration_ms"),
        F.col("device"),
        F.col("raw_payload"),
    )
    if delete_mod is None:
        payload = F.struct(after.alias("after"), F.lit("c").alias("op"))
    else:
        is_delete = F.col("id") % delete_mod == 0
        payload = F.struct(
            F.when(~is_delete, after).alias("after"),
            F.when(is_delete, F.lit("d")).otherwise(F.lit("c")).alias("op"),
        )
    return events.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value")
    )


# ---------------------------------------------------------------------------
# Testdata-schema twins: synthesize corpora in the EXACT shapes of the
# driver's /root/testdata tables (events / documents / embeddings), so the
# registry queries can be spot-benched at scales the shipped testdata does
# not reach (sf1 = 10x; scripts/sf1_bench.py). Same generator discipline as
# gen_events: seeded md5 expressions, zero Python in the row path, one
# codegen stage per table — real fresh draws, not id-offset replicas, so
# the dup/near-dup population grows the way a real corpus's does.
# ---------------------------------------------------------------------------

# the shipped documents tables draw from this 30-word vocabulary (plus the
# trailing near-dup marker token 'dup'); mirrored so scaled corpora exercise
# identical tokenizer/shingle/vocab paths
DOC_VOCAB = (
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
)
DOC_LANGS = ("en", "fr", "es", "de", "zh")  # en ~40%, rest ~15% each
DOC_DUP_FRAC = 0.05  # trailing-' dup' near-duplicates, like the testdata
DOC_N_SOURCES = 20
EMBED_GEN_DIM = 64
EMBED_GEN_LABELS = 10
EMBED_DUP_FRAC = 0.03
TESTDATA_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def gen_documents(spark: SparkSession, n: int, seed: str = "docs") -> DataFrame:
    """``n`` documents in the testdata schema (doc_id, text, lang, source,
    n_chars): 20-99 tokens, ~5% of rows are trailing-token near-dups of
    an earlier document (text re-derived from the BASE doc's id — a pure
    expression, no self-join), language and source distributions
    matching the shipped tables.

    Vocabulary GROWS with the corpus per Heaps' law
    (V = 30 * sqrt(n / 5000), floor 30): at n = 5000 this is exactly the
    shipped tables' 30-word vocabulary; beyond it, extra synthetic types
    ("w<k>") appear the way new vocabulary enters any real corpus.
    Load-bearing for scale benchmarks, learned the measured way: holding
    V = 30 fixed at n = 50k puts ~4M 5-gram shingle draws into a 30^5 =
    24M shingle space, so RANDOM cross-doc shingle collisions grow by the
    birthday quadratic (~n^2 / 2*30^5) and every shingle-blocked pair op
    measures data pathology instead of algorithm (15-19x wall time at a
    10x step). With Heaps vocab the shingle space grows ~n^2.5 and
    diffuse collisions stay rare, which is the regime real corpora are
    in (V ~ 1e5+ => V^5 ~ 1e25 against ~1e13 draws at 100 TB)."""
    import math

    rows = spark.range(n)
    i = F.col("id")
    def _is_dup(e: Column) -> Column:
        return (_uniform(e, f"{seed}:isdup") < DOC_DUP_FRAC) & (e >= 20)

    def _hop(e: Column) -> Column:
        return e - (md5_long_seeded(e, f"{seed}:back") % 17 + 1)

    is_dup = _is_dup(i)
    # Resolve the back-reference to a NON-dup base: a dup row derives its
    # body from base's id, so if base is itself a dup (whose actual text is
    # body(its own base) + ' dup') the "dup" would match no real document.
    # Chase up to 3 hops — each hop is another independent ~5% dup draw, so
    # unresolved odds are DOC_DUP_FRAC^4 ~ 6e-6 (vs the ~0.25% the
    # single-hop version silently mislabeled); is_dup/hop are pure
    # expressions of the id, so the chase stays join-free.
    b1 = _hop(i)
    b2 = F.when(_is_dup(b1), _hop(b1)).otherwise(b1)
    b3 = F.when(_is_dup(b2), _hop(b2)).otherwise(b2)
    base = F.when(is_dup, F.when(_is_dup(b3), _hop(b3)).otherwise(b3)).otherwise(i)
    n_toks = (md5_long_seeded(base, f"{seed}:len") % 80 + 20).cast("int")
    vocab = F.array(*[F.lit(w) for w in DOC_VOCAB])
    v_size = max(len(DOC_VOCAB), int(len(DOC_VOCAB) * math.sqrt(n / 5000.0)))
    tok_idx = lambda j: md5_long_seeded(
        F.concat(base.cast("string"), F.lit(":"), j.cast("string")),
        f"{seed}:tok",
    ) % v_size
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_toks),
            lambda j: F.when(
                tok_idx(j) < len(DOC_VOCAB),
                F.element_at(vocab, (tok_idx(j) + 1).cast("int")),
            ).otherwise(F.concat(F.lit("w"), tok_idx(j))),
        ),
    )
    text = F.when(is_dup, F.concat(body, F.lit(" dup"))).otherwise(body)
    u_lang = _uniform(i, f"{seed}:lang")
    lang = F.when(u_lang < 0.4, F.lit("en")).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in DOC_LANGS[1:]]),
            (md5_long_seeded(i, f"{seed}:lang2") % 4 + 1).cast("int"),
        )
    )
    return rows.select(
        i.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.concat(
            F.lit("src"), (md5_long_seeded(i, f"{seed}:src") % DOC_N_SOURCES)
        ).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n: int, seed: str = "vecs") -> DataFrame:
    """``n`` embeddings in the testdata schema (vec_id, embedding
    array<float> of 64, label 0-9): UNIT-NORM vectors with seeded
    per-(base, dim) uniform directions, so non-dup pairwise cosines
    concentrate near 0 (+-1/sqrt(64)) exactly like the shipped tables'
    (measured on sf0.1: |v|^2 = 1.0, adjacent same-label cosine avg 0.01,
    max 0.31 — random directions; label is metadata, not geometry). ~3% of
    rows are near-dups: the base row's raw draw plus a 1e-3 nudge, then
    normalized, so dup pairs sit at cosine ~1-1e-7 and everything else
    stays far below any dup threshold.

    Load-bearing for scale benchmarks, learned the measured way (the
    embedding-side sibling of gen_documents' Heaps-law lesson): the first
    version drew each vector as its LABEL's center plus noise — 10 tight
    cones at same-label cosine ~0.92, a geometry the shipped data does
    not have — and at a 10x corpus every same-label pair became a
    blocking-stage candidate, inflating the whole embedding-pair family
    quadratically (sim_embedding_dups_ivf 78x for a 10x data step; with
    shipped-matching geometry the candidate population scales with the
    true dup population, which is linear in n)."""
    rows = spark.range(n)
    i = F.col("id")

    def _is_dup(e: Column) -> Column:
        return (_uniform(e, f"{seed}:isdup") < EMBED_DUP_FRAC) & (e >= 20)

    def _hop(e: Column) -> Column:
        return e - (md5_long_seeded(e, f"{seed}:back") % 17 + 1)

    is_dup = _is_dup(i)
    # Chase the back-reference to a NON-dup base (same rationale as
    # gen_documents: a dup-of-a-dup's emitted vector is the grand-base's
    # direction, so a single-hop reference would label pairs that are not
    # in fact close). Three hops leave ~EMBED_DUP_FRAC^4 unresolved.
    b1 = _hop(i)
    b2 = F.when(_is_dup(b1), _hop(b1)).otherwise(b1)
    b3 = F.when(_is_dup(b2), _hop(b2)).otherwise(b2)
    base = F.when(is_dup, F.when(_is_dup(b3), _hop(b3)).otherwise(b3)).otherwise(i)
    label = (md5_long_seeded(base, f"{seed}:label") % EMBED_GEN_LABELS).cast("int")

    def _u01(key: Column, salt: str) -> Column:
        return (md5_long_seeded(key, salt) % _U_MOD).cast("double") / _U_MOD

    dim_key = lambda k, d: F.concat(k.cast("string"), F.lit(":"), d.cast("string"))
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(EMBED_GEN_DIM - 1)),
        lambda d: (
            (_u01(dim_key(base, d), f"{seed}:noise") - 0.5)
            + F.when(is_dup, (_u01(dim_key(i, d), f"{seed}:nudge") - 0.5) * 2e-3)
            .otherwise(F.lit(0.0))
        ),
    )
    staged = rows.select(
        i.alias("vec_id"), raw.alias("_raw"), label.alias("label")
    )
    norm = F.sqrt(
        F.aggregate("_raw", F.lit(0.0), lambda a, x: a + x * x)
    )
    return staged.select(
        "vec_id",
        F.transform("_raw", lambda x: (x / norm).cast("float")).alias(
            "embedding"
        ),
        "label",
    )


def gen_testdata_events(
    spark: SparkSession, n: int, seed: str = "tdev"
) -> DataFrame:
    """``n`` analytics events in the testdata schema (event_id, ts,
    user_id, event_type, value, props): 30 days of timestamps, a 1500-user
    pool, uniform 5-way event types, and an exponential ``value`` with
    mean ~50 (matching the shipped tables' tail to ~560)."""
    rows = spark.range(n)
    i = F.col("id")
    u_val = _uniform(i, f"{seed}:val")
    return rows.select(
        i.alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(
                secs=F.round(_uniform(i, f"{seed}:ts") * 30 * 86400, 6)
            )
        ).alias("ts"),
        (md5_long_seeded(i, f"{seed}:user") % 1500).alias("user_id"),
        _pick(i, f"{seed}:etype", TESTDATA_EVENT_TYPES).alias("event_type"),
        F.round(-F.log(F.lit(1.0) - u_val * F.lit(0.99999)) * 50.0, 2).alias(
            "value"
        ),
        F.concat(
            F.lit('{"k": '), (md5_long_seeded(i, f"{seed}:k") % 100), F.lit("}")
        ).alias("props"),
    )


def gen_supplier(spark: SparkSession, n: int, seed: str = "tdsup") -> DataFrame:
    """``n`` suppliers in the testdata schema (s_suppkey, s_name,
    s_nationkey, s_acctbal): TPC-H-style ``Supplier#%09d`` names (whose
    single-digit differences form the edit-distance-1 match graph
    wh_entity_resolution resolves — the density structure scales with n
    exactly as the shipped table's does), 25 nations, acctbal uniform in
    [-999.99, 9999.99] like TPC-H. Added in round 6 so the sf1 spot-bench
    can run the supplier-input queries at a true 10x step instead of
    skipping them."""
    rows = spark.range(n)
    i = F.col("id")
    return rows.select(
        i.alias("s_suppkey"),
        F.format_string("Supplier#%09d", i).alias("s_name"),
        (md5_long_seeded(i, f"{seed}:nat") % 25).cast("int").alias(
            "s_nationkey"
        ),
        (
            F.round(_uniform(i, f"{seed}:bal") * 10999.98 - 999.99, 2)
        ).alias("s_acctbal"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped testdata twins (round 7): the sf1 spot-bench previously
# skipped the 19 wh_* queries whose inputs are the TPC-H star schema
# (lineitem/orders/part/customer + the fixed nation/region dims) because
# only events/documents/embeddings/supplier had 10x generators. These
# generators reproduce the SHIPPED testdata tables' schemas, vocabularies
# and density structure (profiled from /root/testdata/sf0.1: flag/status/
# priority/segment frequencies, value ranges, 1..7 lines per order with
# mean ~4, day-granular date ranges, the adj+noun p_name vocabulary whose
# token overlap drives the part-text queries) as seeded Catalyst
# expressions — fresh draws in the same distribution, not id-offset
# replicas, so join fan-outs and group cardinalities scale the way a real
# corpus's would. nation/region are generated at their FIXED sizes:
# dimensions legitimately stay small as facts grow (the broadcast-join
# premise the whole engine is built on).

TPCH_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
TPCH_PTYPES = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
TPCH_ADJS = ("blue", "cold", "hot", "large", "new", "old", "red", "small")
TPCH_NOUNS = ("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
TPCH_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)
TPCH_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")


def gen_region(spark: SparkSession) -> DataFrame:
    """The fixed 5-row region dim, identical to the shipped table."""
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(TPCH_REGIONS)],
        "r_regionkey int, r_name string",
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    """The fixed 25-row nation dim in the shipped naming scheme
    (NATION_i, region = i mod 5)."""
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def gen_part(spark: SparkSession, n: int, seed: str = "tdpart") -> DataFrame:
    """``n`` parts in the testdata schema: 8x8 adj+noun names (the shared
    token vocabulary the part-text queries group on), 25 brands, 6 types,
    sizes 1-50, retail price cycling 900.0-999.9 by partkey like the
    shipped table."""
    rows = spark.range(n)
    i = F.col("id")
    return rows.select(
        i.alias("p_partkey"),
        F.concat_ws(
            " ",
            _pick(i, f"{seed}:adj", TPCH_ADJS),
            _pick(i, f"{seed}:noun", TPCH_NOUNS),
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"),
            (md5_long_seeded(i, f"{seed}:brand") % 25 + 1).cast("string"),
        ).alias("p_brand"),
        _pick(i, f"{seed}:type", TPCH_PTYPES).alias("p_type"),
        (md5_long_seeded(i, f"{seed}:size") % 50 + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + (i % 1000).cast("double") / 10.0).alias("p_retailprice"),
    )


def gen_customer(
    spark: SparkSession, n: int, seed: str = "tdcust"
) -> DataFrame:
    """``n`` customers: Customer#%09d names, 25 nations, acctbal uniform
    in [-999.99, 9999.99], 5-way market segment."""
    rows = spark.range(n)
    i = F.col("id")
    return rows.select(
        i.alias("c_custkey"),
        F.format_string("Customer#%09d", i).alias("c_name"),
        (md5_long_seeded(i, f"{seed}:nat") % 25).cast("int").alias("c_nationkey"),
        F.round(_uniform(i, f"{seed}:bal") * 10999.98 - 999.99, 2).alias(
            "c_acctbal"
        ),
        _pick(i, f"{seed}:seg", TPCH_SEGMENTS).alias("c_mktsegment"),
    )


def gen_orders(
    spark: SparkSession, n: int, n_customers: int, seed: str = "tdord"
) -> DataFrame:
    """``n`` orders: custkey uniform over the customer pool, F/O/P status,
    totalprice uniform ~[1k, 500k], day-granular dates over the shipped
    1995-01-01..2001-08-01 range, 5-way priority."""
    rows = spark.range(n)
    i = F.col("id")
    days = (md5_long_seeded(i, f"{seed}:date") % 2404).cast("int")
    return rows.select(
        i.alias("o_orderkey"),
        (md5_long_seeded(i, f"{seed}:cust") % int(n_customers)).alias("o_custkey"),
        _pick(i, f"{seed}:status", ("F", "O", "P")).alias("o_orderstatus"),
        F.round(_uniform(i, f"{seed}:price") * 498991.27 + 1001.91, 2).alias(
            "o_totalprice"
        ),
        (
            F.to_timestamp(F.lit("1995-01-01 00:00:00"))
            + F.make_interval(days=days)
        ).alias("o_orderdate"),
        _pick(i, f"{seed}:pri", TPCH_PRIORITIES).alias("o_orderpriority"),
    )


def gen_lineitem(
    spark: SparkSession,
    n_orders: int,
    n_parts: int,
    n_suppliers: int,
    seed: str = "tdli",
) -> DataFrame:
    """~4x``n_orders`` line items: each order draws 1-7 lines (uniform,
    mean 4 — the shipped per-order fan-out), line columns seeded from the
    (orderkey, linenumber) composite so every line is an independent
    deterministic draw. Generation is one range + one explode of a
    bounded sequence — no shuffle, embarrassingly parallel at any n."""
    orders = spark.range(n_orders)
    o = F.col("id")
    n_lines = (md5_long_seeded(o, f"{seed}:nl") % 7 + 1).cast("int")
    lines = orders.select(
        o.alias("l_orderkey"),
        F.explode(F.sequence(F.lit(1), n_lines)).alias("l_linenumber"),
    )
    # composite per-line key: orderkey * 8 + linenumber (linenumber <= 7)
    k = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    return lines.select(
        "l_orderkey",
        (md5_long_seeded(k, f"{seed}:part") % int(n_parts)).alias("l_partkey"),
        (md5_long_seeded(k, f"{seed}:supp") % int(n_suppliers)).alias("l_suppkey"),
        F.col("l_linenumber").cast("int"),
        (md5_long_seeded(k, f"{seed}:qty") % 50 + 1).cast("double").alias(
            "l_quantity"
        ),
        F.round(
            _uniform(k, f"{seed}:price") * 104099.23 + 900.68, 2
        ).alias("l_extendedprice"),
        ((md5_long_seeded(k, f"{seed}:disc") % 11).cast("double") / 100.0).alias(
            "l_discount"
        ),
        ((md5_long_seeded(k, f"{seed}:tax") % 9).cast("double") / 100.0).alias(
            "l_tax"
        ),
        _pick(k, f"{seed}:rf", ("A", "N", "R")).alias("l_returnflag"),
        _pick(k, f"{seed}:ls", ("F", "O")).alias("l_linestatus"),
        (
            F.to_timestamp(F.lit("1995-01-02 00:00:00"))
            + F.make_interval(
                days=(md5_long_seeded(k, f"{seed}:ship") % 2498).cast("int")
            )
        ).alias("l_shipdate"),
    )


__all__ = [
    "DEVICES",
    "EVENT_WEIGHTS",
    "DURATION_BANDS",
    "gen_content",
    "gen_customer",
    "gen_documents",
    "gen_embeddings",
    "gen_events",
    "gen_events_stream",
    "gen_lineitem",
    "gen_nation",
    "gen_orders",
    "gen_part",
    "gen_region",
    "gen_supplier",
    "gen_testdata_events",
    "wire_encode",
]

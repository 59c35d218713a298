"""Text analysis operators over the ``documents`` table — the
training-data-pipeline extensions (SURVEY §7.3 M6): token statistics,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd): tokenization is
``split`` + ``filter``, scoring is arithmetic — no Python UDFs. Each has an
exact DuckDB oracle twin in plans/oracles.py.

Scale: every operator here is embarrassingly parallel (per-row, no shuffle);
at 100 TB they pipeline directly over the parquet scan with full column
pruning (only ``text`` + keys read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import rolling_fingerprint

# tiny per-language marker-word profiles for the n-gram/stopword language-ID
# heuristic. (The driver's synthetic corpus draws from one shared vocabulary,
# so prediction quality is meaningless here — the operator and its oracle are
# what is being exercised.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "y", "las", "es"),
    "zh": ("de", "shi", "le", "zai", "he"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

# GPT-style pre-tokenizer shape: letter runs | digit runs | single
# non-alnum-non-space marks. Plain character classes only, so Java regex
# (Spark) and RE2 (DuckDB) agree.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
PUNCT_PATTERN = r"[^a-zA-Z0-9\s]"
# Non-whitespace as an EXPLICIT class, shared verbatim with the DuckDB
# oracles: Java's \s includes vertical tab \x0B but RE2's does not, so a
# bare [^\s] silently diverges on any document containing \x0B. Both
# engines parse \t \n \x0B \f \r escapes identically inside a class.
NONWS_PATTERN = r"[^ \t\n\x0B\f\r]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (portable: split on single space +
    filter, identical in DuckDB)."""
    return F.filter(F.split(text, " "), lambda x: x != F.lit(""))


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    wl = ", ".join(f"'{w}'" for w in words)
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document token/char statistics + quality gate.

    quality_ok mirrors the usual pre-training filters: enough tokens,
    plausible mean token length, sane stopword ratio.
    """
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    avg_token_len = sum_len.cast("double") / n_tokens
    stop_ratio = _count_in(toks, STOPWORDS).cast("double") / n_tokens
    n_chars = F.length("text")
    punct = F.regexp_count(F.col("text"), F.lit(PUNCT_PATTERN)).cast("long")
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars)
    return docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
        avg_token_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        # BPE-ish subword count: runs of letters, runs of digits, or single
        # punctuation marks (the GPT-style pre-tokenizer shape)
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).cast("long").alias(
            "bpe_tokens"
        ),
        # crude ~4 chars/token estimate kept for comparison
        F.ceil(n_chars / 4.0).cast("long").alias("est_bpe_tokens"),
        (
            (n_tokens >= 10)
            & (avg_token_len >= 2.0)
            & (avg_token_len <= 10.0)
            & (stop_ratio <= 0.7)
            & F.coalesce(punct_ratio <= 0.3, F.lit(False))
        ).alias("quality_ok"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language-ID: score each language profile, argmax with a
    deterministic preference order (profile declaration order)."""
    toks = tokens(F.col("text"))
    scores = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    pred = None
    for lang in reversed(langs):
        this = F.lit(lang)
        if pred is None:
            pred = this
            continue
        cond = None
        for other in langs:
            if langs.index(other) > langs.index(lang):
                c = scores[lang] >= scores[other]
            elif langs.index(other) < langs.index(lang):
                c = scores[lang] > scores[other]
            else:
                continue
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, this).otherwise(pred)
    out = docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("lang_predicted"),
    )
    return out.withColumn("is_match", F.col("lang_predicted") == F.col("lang_actual"))


# cleaning patterns — plain character classes only so Java regex (Spark)
# and RE2 (DuckDB) agree byte-for-byte
URL_PATTERN = r"https?://[^ ]+"
EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
WS_PATTERN = r"  +"


def clean_text(docs: DataFrame) -> DataFrame:
    """Normalization pass before tokenization/dedup: strip URLs and e-mail
    addresses, collapse runs of spaces, trim, lowercase. Pure per-row
    regexp_replace chain (JVM codegen, no shuffle); counts of removed
    entities kept for the cleaning audit."""
    text = F.col("text")
    stripped = F.regexp_replace(
        F.regexp_replace(text, URL_PATTERN, " "), EMAIL_PATTERN, " "
    )
    collapsed = F.trim(F.regexp_replace(stripped, WS_PATTERN, " "))
    return docs.select(
        "doc_id",
        "lang",
        F.lower(collapsed).alias("clean_text"),
        F.length(text).alias("n_chars_raw"),
        F.length(collapsed).alias("n_chars_clean"),
        F.regexp_count(text, F.lit(URL_PATTERN)).cast("long").alias("n_urls"),
        F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint (Rabin-Karp style) — the cheap
    content identity used before heavier near-dup machinery."""
    return docs.select(
        "doc_id",
        rolling_fingerprint(F.col("text")).alias("fingerprint"),
        F.length("text").alias("n_chars_actual"),
    )


# Gopher-style repetition gates (Rae et al. 2021, arXiv:2112.11446 §A1.1):
# documents dominated by repeated lines or one repeated n-gram are boilerplate
DUP_LINE_MAX_FRAC = 0.30
TOP_BIGRAM_MAX_FRAC = 0.20


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition quality: duplicate-line fraction and
    most-frequent-bigram fraction, with the pass/fail gate.

    Scale shape: the line metrics are pure array expressions (no shuffle);
    the bigram mode needs true counts (not distinct), so bigrams explode and
    aggregate — both aggregations are map-side-partial hash aggs keyed by
    doc, and only (doc_id, gram) pairs shuffle, never document text.
    """
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines)
    base = docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.when(n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines)
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        tokens(F.col("text")).alias("_toks"),
    )
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i.cast("int")), F.element_at(toks, (i + 1).cast("int"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gram_counts = (
        base.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("doc_id")
        .agg(
            F.max("_n").alias("_top"),
            F.sum("_n").alias("_total"),
        )
    )
    return (
        base.drop("_toks")
        .join(gram_counts, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.coalesce(F.col("_top") / F.col("_total"), F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
            (
                (F.col("dup_line_frac") <= DUP_LINE_MAX_FRAC)
                & (
                    F.coalesce(F.col("_top") / F.col("_total"), F.lit(0.0))
                    <= TOP_BIGRAM_MAX_FRAC
                )
            ).alias("repetition_ok"),
        )
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document character-level Shannon entropy over non-whitespace
    characters + distinct-char count — the classic gibberish/boilerplate
    quality signal (natural text sits near the language's ~4.1 bits/char;
    base64 blobs and repeated padding sit far off it).

    Pure per-row Column expressions — char extraction, per-char frequency,
    and the entropy fold all happen inside one narrow projection, so there
    is NO shuffle at any scale: 100 TB costs exactly the text scan. The
    fold runs over the sorted distinct-char list, so doubles are
    oracle-bit-identical.
    """
    cs = F.regexp_extract_all(F.col("text"), F.lit(NONWS_PATTERN), 0)
    n = F.size(cs).cast("double")

    def _plogp(c: Column) -> Column:
        p = F.size(F.filter(cs, lambda x: x == c)).cast("double") / n
        return p * F.log2(p)

    ent = -F.aggregate(
        F.array_sort(F.array_distinct(cs)),
        F.lit(0.0),
        lambda acc, c: acc + _plogp(c),
    )
    return docs.select(
        "doc_id",
        F.when(F.size(cs) > 0, F.round(ent, 6)).otherwise(F.lit(0.0)).alias(
            "char_entropy"
        ),
        F.size(F.array_distinct(cs)).cast("long").alias("n_uniq_chars"),
    )


# filter-audit gates (the "why was this document dropped" accounting)
AUDIT_MIN_TOKENS = 10
AUDIT_TOKEN_LEN = (2.0, 10.0)
AUDIT_MAX_STOPWORD = 0.7
AUDIT_MAX_PUNCT = 0.3
AUDIT_MIN_ENTROPY = 3.0
AUDIT_MAX_DUP_LINES = 0.3


def filter_audit(docs: DataFrame) -> DataFrame:
    """Corpus-filter audit: ONE row of per-reason rejection counts plus the
    kept count — the accounting every large-scale cleaning run needs
    ("what did each gate cost us"). A document can fail several gates;
    each reason counts it once.

    Every metric (token stats, punctuation, char entropy, duplicate-line
    fraction) is a per-row Column expression over one scan — no joins, no
    per-doc shuffle; the only exchange is the final 1-row aggregate.
    """
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    avg_len = F.when(n_tokens > 0, sum_len.cast("double") / n_tokens)
    stop_ratio = F.when(
        n_tokens > 0, _count_in(toks, STOPWORDS).cast("double") / n_tokens
    )
    n_chars = F.length("text")
    punct_ratio = F.when(
        n_chars > 0,
        F.regexp_count(F.col("text"), F.lit(PUNCT_PATTERN)).cast("double")
        / n_chars,
    )
    cs = F.regexp_extract_all(F.col("text"), F.lit(NONWS_PATTERN), 0)
    ncs = F.size(cs).cast("double")

    def _plogp(c: Column) -> Column:
        p = F.size(F.filter(cs, lambda x: x == c)).cast("double") / ncs
        return p * F.log2(p)

    ent = F.when(
        F.size(cs) > 0,
        -F.aggregate(
            F.array_sort(F.array_distinct(cs)),
            F.lit(0.0),
            lambda acc, c: acc + _plogp(c),
        ),
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0, F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(F.lit(0.0))
    lo, hi = AUDIT_TOKEN_LEN
    reasons = {
        "too_few_tokens": n_tokens < AUDIT_MIN_TOKENS,
        "bad_token_len": F.coalesce(
            (avg_len < lo) | (avg_len > hi), F.lit(True)
        ),
        "high_stopword": F.coalesce(
            stop_ratio > AUDIT_MAX_STOPWORD, F.lit(True)
        ),
        "high_punct": F.coalesce(punct_ratio > AUDIT_MAX_PUNCT, F.lit(True)),
        "low_entropy": ent < AUDIT_MIN_ENTROPY,
        "high_dup_lines": dup_frac > AUDIT_MAX_DUP_LINES,
    }
    kept = ~reasons["too_few_tokens"]
    for r in list(reasons.values())[1:]:
        kept = kept & ~r
    per = docs.select(
        kept.cast("long").alias("kept"),
        *[v.cast("long").alias(f"r_{k}") for k, v in reasons.items()],
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("kept").alias("n_kept"),
        *[F.sum(f"r_{k}").alias(f"n_{k}") for k in reasons],
    )


def dedup_lines(docs: DataFrame) -> DataFrame:
    """Within-document duplicate-line removal — the boilerplate strip step
    of a web-corpus cleaning pipeline (nav bars, cookie banners, repeated
    headers): keep the FIRST occurrence of every line, preserving order.

    Pure array expressions (split -> first-occurrence filter -> rejoin), no
    shuffle; O(lines^2) per document via first-index lookup, which is fine
    at real line counts (the quadratic is per-row and tiny, not cross-row).
    Emits the removal audit (line counts) next to the cleaned text."""
    text = F.col("text")
    lines = F.split(text, "\n")
    idx = F.sequence(F.lit(1), F.size(lines))
    kept = F.filter(
        F.transform(
            idx,
            lambda i: F.when(
                F.array_position(lines, F.element_at(lines, i.cast("int"))) == i,
                F.element_at(lines, i.cast("int")),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        "doc_id",
        F.array_join(kept, "\n").alias("dedup_text"),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_dup_lines_removed"),
    )


VOCAB_SIZE = 1000


def build_vocab(docs: DataFrame, size: int = VOCAB_SIZE) -> DataFrame:
    """Corpus vocabulary: the ``size`` most frequent tokens, id = frequency
    rank (0-based; ties broken lexically) — the word-level vocab-build step
    before encoding. One explode + hash aggregate + top-k; the vocab is
    dimension-sized and broadcasts downstream."""
    toks = tokens(F.col("text"))
    counts = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return (
        counts.orderBy(F.desc("freq"), F.asc("token"))
        .limit(int(size))
        .withColumn("token_id", F.row_number().over(w).cast("long") - 1)
        .select("token_id", "token", "freq")
    )


def encode_docs(docs: DataFrame, vocab: DataFrame, unk_id: int | None = None) -> DataFrame:
    """Encode every document as its token-id sequence against ``vocab``
    (out-of-vocab -> ``unk_id``, default = vocab size). Explode with
    position, broadcast-join the vocab, reassemble order-exactly via an
    (pos, id) array_sort — one shuffle on doc_id, vocab never shuffles.
    ``ids`` is emitted as a '_'-joined string (lossless; top-level array
    columns break pandas-side canonicalization in differential
    harnesses)."""
    unk = F.lit(int(unk_id if unk_id is not None else VOCAB_SIZE)).cast("long")
    toks = tokens(F.col("text"))
    exploded = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "token")
    )
    joined = exploded.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        "doc_id", "pos", F.coalesce(F.col("token_id"), unk).alias("tid")
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("ids"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                "_", F.transform("ids", lambda i: i.cast("string"))
            ).alias("ids"),
            F.size("ids").cast("long").alias("n_tokens"),
            F.size(F.filter("ids", lambda i: i == unk)).cast("long").alias("n_unk"),
        )
    )


def lm_score(docs: DataFrame) -> DataFrame:
    """Bigram-LM document scoring — the perplexity-filter stand-in of
    CCNet-style corpus curation: a Laplace-smoothed word-bigram model is
    fit on the corpus itself, and each document gets its mean token
    log-likelihood (low score = improbable/gibberish text, the standard
    quality-filter signal when a real KenLM is unavailable).

      log P(w2 | w1) = ln( (c(w1,w2) + 1) / (c(w1) + V) )

    Scale shape: bigram/unigram count tables are one explode + hash agg
    each; scoring joins each doc bigram to its counts (shuffle on the
    bigram key — at 100 TB the model would be count-pruned and broadcast
    instead, an approximation this exact formulation doesn't need at test
    scale). Determinism: per-doc log-probs re-assemble in position order
    (array_sort) and fold sequentially, so the double sum is
    oracle-bit-identical; V and the counts are exact integers.
    """
    # token array materializes behind an exchange before the per-position
    # gram lambdas read it — adjacent projections would be collapsed by
    # Catalyst, inlining (and re-evaluating) the tokenizer per element
    # (the same O(len^2) trap as winnow_fingerprints)
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(parallelism, "doc_id")
    tcol = F.col("toks")
    n = F.size(tcol)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tcol, i.cast("int")),
                F.element_at(tcol, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_grams = base.select("doc_id", F.posexplode(grams).alias("pos", "bigram"))
    big_counts = doc_grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    uni = base.select(F.explode(tcol).alias("token"))
    uni_counts = uni.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    vocab_n = uni.agg(F.countDistinct("token").alias("v"))
    scored = (
        doc_grams.withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(big_counts, "bigram")
        .join(uni_counts, F.col("w1") == F.col("token"))
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "doc_id",
            "pos",
            F.log(
                (F.col("c12") + 1).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("logp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "logp"))),
                lambda s: s["logp"],
            ).alias("_lp")
        )
        .select(
            "doc_id",
            F.size("_lp").cast("long").alias("n_bigrams"),
            F.round(
                F.aggregate(F.col("_lp"), F.lit(0.0), lambda a, x: a + x)
                / F.size("_lp"),
                6,
            ).alias("mean_logp"),
        )
    )


def fuzzy_string_pairs(df: DataFrame, col: str = "name") -> DataFrame:
    """Distinct value pairs within edit distance 1 via FastSS
    deletion-neighborhood blocking (Bocek et al. 2007, "Fast Similarity
    Search in Large Dictionaries") — the entity-resolution primitive for
    near-identical names/keys (typos, off-by-one ids, OCR slips).

    Two strings within edit distance k share a variant of their k-deletion
    neighborhoods, so candidates come from an equi-self-join on
    {value} ∪ {value minus one char} — sub-quadratic blocking (|v|·len
    index rows, bucket-join) instead of the all-pairs levenshtein scan an
    engine without it would run; `levenshtein` then verifies exactly.

    Scale shape: one distinct pass, one explode (len+1 variants per
    value), one equi-join keyed on the variant string, verification on
    candidates only. Skew guard: a variant shared by many values is the
    blocking bucket; bucket size is bounded by alphabet size per position
    (substitutions) + 1, so no df cap is needed."""
    vals = df.select(F.col(col).alias("val")).distinct()
    v = F.col("val")
    # when-guard: Spark's sequence(1, 0) DESCENDS instead of being empty,
    # so a zero-length value would fabricate variants
    dels = F.when(
        F.length(v) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(v)),
            lambda i: F.concat(
                v.substr(F.lit(1), i - 1), v.substr(i + 1, F.length(v))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    variants = vals.select(
        "val", F.explode(F.array_union(F.array(v), dels)).alias("var")
    )
    a = variants.select(F.col("val").alias("val_a"), "var")
    b = variants.select(F.col("val").alias("val_b"), "var")
    return (
        a.join(b, "var")
        .filter(F.col("val_a") < F.col("val_b"))
        .select("val_a", "val_b")
        .distinct()
        .filter(F.levenshtein("val_a", "val_b") == 1)
        .select("val_a", "val_b", F.lit(1).cast("long").alias("dist"))
    )


TFIDF_TOP_K = 5


def tfidf_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k TF-IDF terms — the keyword-extraction /
    doc-representation step of corpus curation (what you feed a topic
    clusterer or a per-domain term drift report):

        score(d, t) = tf(d, t) * ln((N + 1) / (df(t) + 1))

    with tf = in-doc term count, df = number of docs containing the term,
    N = corpus size (add-1 smoothed idf, never negative or div-by-zero).

    Scale shape: tf is one (doc_id, token) hash agg; df folds off tf with
    a second token-key agg; the df table joins back on the token key
    (vocab-sized — broadcastable after df-pruning at 100 TB, but the
    exact contract keeps the shuffle join), then one doc_id window for
    the top-k. Determinism: tf/df/N are exact integers; the only float is
    the final ln, rounded to 6dp BEFORE ranking so both engines rank the
    same values, ties broken by term (the lm_score precedent)."""
    base = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = base.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


DIVERSITY_MAX_N = 3


def ngram_diversity(docs: DataFrame, max_n: int = DIVERSITY_MAX_N) -> DataFrame:
    """Per-source distinct-n diversity (Li et al. 2016's distinct-1/2/3,
    the standard corpus-degeneracy metric): for each n, the ratio of
    distinct word n-grams to total n-gram occurrences. A crawl source
    whose diversity collapses is boilerplate/templated text — this is the
    corpus-health dashboard number next to repetition_stats' per-doc one.

    Scale shape: one tokenize pass emits all n sizes at once (an array of
    (n, gram) structs per doc, exploded once), then a single
    (source, n, gram)-key hash agg to occurrence counts, then a tiny
    (source, n) re-agg — distinct counting via two-level agg rather than
    countDistinct keeps partial aggregation map-side. Totals/distincts
    are exact integers; the ratio divides two BIGINTs as doubles (IEEE
    exact-rounded in both engines) and rounds to 6dp."""
    tcol = F.col("toks")
    base = docs.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    # exchange barrier: gram lambdas must read a materialized token array
    # (CollapseProject would re-run the tokenizer per element)
    base = base.repartition(parallelism, "doc_id")
    def _gram_lambda(n: int):
        # a 2-arg lambda would receive transform's positional index as its
        # second argument — close over n instead
        def fn(i):
            return F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ",
                    *[F.element_at(tcol, (i + j).cast("int")) for j in range(n)],
                ).alias("gram"),
            )

        return fn

    per_n = [
        F.when(
            F.size(tcol) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tcol) - n + 1), _gram_lambda(n)
            ),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))
        for n in range(1, max_n + 1)
    ]
    grams = base.select(
        "source", F.explode(F.concat(*per_n)).alias("g")
    ).select("source", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    occ = grams.groupBy("source", "n", "gram").agg(
        F.count(F.lit(1)).alias("occ")
    )
    return (
        occ.groupBy("source", "n")
        .agg(
            F.sum("occ").cast("long").alias("total_ngrams"),
            F.count(F.lit(1)).cast("long").alias("distinct_ngrams"),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams").cast("double")
                / F.col("total_ngrams").cast("double"),
                6,
            ).alias("diversity"),
        )
    )


BOILERPLATE_MAX_DF_FRAC = 0.05


def remove_boilerplate_lines(
    docs: DataFrame, max_df_frac: float = BOILERPLATE_MAX_DF_FRAC
) -> DataFrame:
    """CROSS-document boilerplate-line removal (the CCNet paragraph-dedup
    step): a line appearing in more than ``max_df_frac`` of all documents
    is boilerplate (cookie banners, nav bars, licence footers) and is
    stripped from every document; within-doc repeats of a *rare* line are
    kept (that's :func:`dedup_lines`' job).

    Scale shape: explode lines with position -> line-hash doc-frequency
    (two-level exact distinct: (line, doc) dedup then line count — both
    map-side combinable) -> broadcast-sized hot-line set (bounded by
    1/max_df_frac distinct values per df bucket... in practice tiny) anti
    -joins back -> per-doc ordered reassembly. The reassembly sort is the
    one per-doc wide op; its shuffle key is doc_id, the same exchange the
    explode came from. The line travels as its 60-bit md5.

    Output: (doc_id, clean_text, n_lines, n_boilerplate_removed)."""
    from ..functions.hashing import md5_long

    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    # the exploded line table has three consumers (hot-set df count,
    # anti-join probe, per-doc n_lines agg): persist it so the corpus is
    # scanned and line-hashed once, not three times (session.free_caches
    # reclaims the pin between queries)
    lines = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"),
        )
        .withColumn("lh", md5_long(F.col("line")))
        .persist()
    )
    hot = (
        lines.select("lh", "doc_id")
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > F.col("n_docs") * max_df_frac)
        .select("lh")
    )
    kept = lines.join(F.broadcast(hot), "lh", "left_anti")
    return (
        lines.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .join(
            kept.groupBy("doc_id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                ).alias("clean_text"),
                F.count(F.lit(1)).alias("n_kept"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_boilerplate_removed"),
        )
    )

"""Multimodal column support (SURVEY §7.3 M6): image/audio/video as opaque
``binary`` columns with typed metadata, processed through Arrow-batched
``mapInPandas``. PNG and PCM WAV are decoded for REAL (dependency-free
codecs in functions/media_codecs.py + stdlib ``wave``): decode, resize,
perceptual-hash dedup all operate on genuine pixels/samples; only formats
with no stdlib decoder (video containers, JPEG) fall back to the
deterministic stub, keeping every stage total over arbitrary bytes.

Pattern at 100 TB: media bytes stay in parquet binary columns; decode /
resize / frame-sample run as mapInPandas stages so bytes move executor-side
in Arrow batches and never touch the driver; metadata-only predicates
(width, duration, codec) are pushed to the scan and prune row groups before
any byte is decoded.
"""

from __future__ import annotations

from collections.abc import Iterator
from wave import Error as wave_error
from zlib import error as zlib_error

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA table from ``documents`` (deterministic): the
    UTF-8 text bytes stand in for encoded media; media_type cycles by id."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        content.alias("content"),
        F.struct(
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
            F.concat(F.lit("application/x-fake-"), mt).alias("mime"),
        ).alias("metadata"),
    )


def _decode_stub(media_type: str, content: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder: derives (width, height, n_frames) from
    the byte stream without any codec library — the fallback for byte
    streams no real decoder claims (and for video, which has no
    stdlib-decodable container)."""
    n = len(content)
    width = 16 + n % 1024
    height = 16 + (n * 7) % 768
    n_frames = 1 if media_type == "image" else 1 + n % 240
    return width, height, n_frames


def _decode_real(media_type: str, content: bytes) -> tuple[int, int, int]:
    """Real decode where the format allows: PNG (pure-Python chunk walk +
    inflate + unfilter, functions/media_codecs.py) and PCM WAV (stdlib
    ``wave``). Anything else falls back to the deterministic stub, so the
    operator's output stays total over arbitrary bytes.

    Feature mapping into the (width, height, n_frames) triple:
      image/PNG -> (pixel width, pixel height, 1)
      audio/WAV -> (sample_rate, n_channels, n_audio_frames)
    """
    from ..functions import media_codecs as mc

    b = bytes(content)
    if mc.is_png(b):
        try:
            w, h, _c, _px = mc.png_decode(b)
            return w, h, 1
        except (ValueError, zlib_error):
            pass
    if mc.is_wav(b):
        try:
            nch, rate, nframes = mc.wav_info(b)
            return rate, nch, nframes
        except (wave_error, EOFError):
            pass
    return _decode_stub(media_type, b)


def decode_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary media columns.

    Real pattern: mapInPandas streams record batches through Python, so
    per-batch codec state (decoder instances, GPU handles) amortizes across
    rows. The codec is `_decode_real`: genuine PNG/WAV decoding via
    functions/media_codecs.py (stdlib-only), stub fallback for byte
    streams neither format claims; a richer build imports PIL/pyav inside
    the generator (import-per-executor, not per-row) behind the same
    signature.
    """
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                }
            )
            dims = [
                _decode_real(t, c)
                for t, c in zip(pdf["media_type"], pdf["content"])
            ]
            out["width"] = pd.Series([d[0] for d in dims], dtype="int32")
            out["height"] = pd.Series([d[1] for d in dims], dtype="int32")
            out["n_frames"] = pd.Series([d[2] for d in dims], dtype="int32")
            out["checksum"] = pdf["content"].map(
                lambda b: hashlib.md5(b).hexdigest()
            )
            yield out

    return media.mapInPandas(decode, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_n_bytes", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_checksum", T.StringType(), True),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize stage for image rows (mapInPandas): bytes in, resized bytes
    out. Genuine PNG inputs are decoded (functions/media_codecs.py),
    nearest-neighbor resampled to (target_w, target_h), and re-encoded as
    PNG; non-PNG bytes take the deterministic stub path (input truncated to
    the resized byte budget w*h*3, an RGB frame) so the stage stays total
    and oracle-checkable over arbitrary binary columns."""
    budget = target_w * target_h * 3

    def _resize_one(b: bytes) -> bytes:
        from ..functions import media_codecs as mc

        b = bytes(b)
        if mc.is_png(b):
            try:
                _w, _h, _c, px = mc.png_decode(b)
                return mc.png_encode(mc.resize_nearest(px, target_w, target_h))
            except (ValueError, zlib_error):
                pass
        return b[:budget]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["media_type"] == "image"]
            out_bytes = imgs["content"].map(_resize_one)
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"],
                    "width": pd.Series([target_w] * len(imgs), dtype="int32", index=imgs.index),
                    "height": pd.Series([target_h] * len(imgs), dtype="int32", index=imgs.index),
                    "out_n_bytes": out_bytes.map(len).astype("int64"),
                    "content": out_bytes,
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling for video rows — a row-expanding mapInPandas stage
    (one output row per sampled frame), the shape a real pyav frame
    extractor has. Stub: frame count from `_decode_stub`, per-frame
    checksum md5(content || ':' || idx) — deterministic, so the DuckDB
    oracle reproduces it with generate_series."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            vids = pdf[pdf["media_type"] == "video"]
            for mid, content in zip(vids["media_id"], vids["content"]):
                _, _, n_frames = _decode_stub("video", content)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(
                        hashlib.md5(bytes(content) + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return media.mapInPandas(sample, FRAME_SCHEMA)


def media_stats(features: DataFrame) -> DataFrame:
    """Per-media-type rollup over decoded features."""
    return features.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("n_frames").alias("max_frames"),
    )


# ---------------------------------------------------------------------------
# Image near-duplicate detection over REAL encoded pixels: render -> decode ->
# perceptual hash (aHash) -> banded Hamming candidate join. The render stage
# exists because the sandbox has no image corpus; the decode/hash/join stages
# are exactly what runs over a real one.
# ---------------------------------------------------------------------------

PNG_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.LongType(), True),
    ]
)


def synthesize_png_corpus(docs: DataFrame, side: int = 16) -> DataFrame:
    """Render each document's text into a real ``side`` x ``side`` grayscale
    PNG: the pixel grid is the normalized histogram of crc32-hashed token
    trigrams (the doc's shingle profile as pixels). Deterministic, content-
    discriminative (different docs light up different cells), and textual
    near-duplicates — sharing almost all shingles — map to near-identical
    images, so the corpus' dup structure carries over to the image domain,
    which is what the downstream perceptual-hash join must find.

    The trigram->cell hash is the repo's portable md5-60bit convention
    (functions/hashing.md5_long), NOT a Python-only hash: the render spec
    is thereby a pure SQL-expressible function of the text, which is what
    lets the mm_image_dedup oracle reproduce the whole
    render->encode->decode->aHash pipeline value-for-value (the PNG
    encode/decode round trip is pixel-identity, proven by
    tests/test_media_codecs.py, so the oracle models it as identity)."""
    import numpy as np

    from ..functions import media_codecs as mc
    from ..functions.hashing import md5_long_py

    n_cells = side * side

    def _cell(s: str) -> int:
        return md5_long_py(s) % n_cells

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                toks = text.split()
                cells = np.array(
                    [
                        _cell(" ".join(toks[i : i + 3]))
                        for i in range(max(0, len(toks) - 2))
                    ],
                    dtype=np.int64,
                )
                grid = np.bincount(cells, minlength=n_cells).reshape(side, side)
                peak = grid.max()
                px = (
                    (grid * 255 // peak).astype(np.uint8)
                    if peak > 0
                    else grid.astype(np.uint8)
                )
                out.append(mc.png_encode(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "content": pd.Series(out, dtype="object", index=pdf.index),
                }
            )

    from ..functions.partitioning import spread

    # the render stage is CPU-dense Python; split an under-partitioned
    # documents scan across cores before entering Arrow (no-op on a
    # well-split cluster scan)
    return spread(docs.select("doc_id", "text")).mapInPandas(
        render, PNG_CORPUS_SCHEMA
    )


def ahash64(media: DataFrame) -> DataFrame:
    """64-bit average-hash per image: decode PNG -> gray (channel SUM —
    integer, same thresholding as the channel mean since every value
    scales by the constant channel count) -> 8x8 nearest-neighbor
    downsample -> threshold bit i set when pixel_i * 64 > sum(pixels).
    All-integer arithmetic: the comparison is the exact mean threshold
    with no float division anywhere, so a SQL oracle lands on the
    identical bits. Arrow-batched; non-PNG rows hash to NULL and drop
    out of the dup join."""
    import numpy as np

    from ..functions import media_codecs as mc

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for content in pdf["content"]:
                b = bytes(content)
                h = None
                if mc.is_png(b):
                    try:
                        _w, _h, _c, px = mc.png_decode(b)
                        gray = px.astype(np.int64).sum(axis=2)
                        small = mc.resize_nearest(gray[:, :, None], 8, 8)[:, :, 0]
                        bits = (small * 64 > small.sum()).flatten()
                        # LSB-first pack (bit i of the hash = bits[i]),
                        # vectorized; int64 via signed wrap to dodge
                        # uint64 overflow
                        val = int.from_bytes(
                            np.packbits(bits, bitorder="little").tobytes(),
                            "little",
                        )
                        h = val - (1 << 64) if val >= (1 << 63) else val
                    except (ValueError, zlib_error):
                        h = None
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "ahash": pd.Series(hashes, dtype="Int64", index=pdf.index),
                }
            )

    return media.mapInPandas(hash_batch, AHASH_SCHEMA)


# max_hamming MUST be < bands for the pigeonhole candidate guarantee: with
# bands=4 over a 64-bit hash, a pair at hamming 4 could put one flipped bit
# in each 16-bit band, agree on no band key, and never become a candidate.
# 3 differing bits across 4 bands always leave >= one band untouched.
IMG_DUP_MAX_HAMMING = 3
IMG_DUP_BANDS = 4
IMG_DUP_BUCKET_CAP = 200


def image_dup_pairs(
    hashed: DataFrame,
    max_hamming: int = IMG_DUP_MAX_HAMMING,
    bands: int = IMG_DUP_BANDS,
    bucket_cap: int = IMG_DUP_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate image pairs by banded Hamming join on the 64-bit
    aHash: split the hash into ``bands`` 16-bit keys — two hashes within
    ``max_hamming`` (< bands) bits of each other must agree on >= one full
    band (pigeonhole), so the (band, key) equi-join generates a candidate
    superset, then ``bit_count(xor)`` verifies. Same blocked-join shape as
    MinHash-LSH banding; never all-pairs.

    ``bucket_cap`` drops degenerate buckets (e.g. the all-zero hash of blank
    frames) before the self-join — the image-domain twin of the stop-shingle
    document-frequency cap in ngram_jaccard_pairs, bounding the worst-case
    quadratic bucket at cluster scale. Capped buckets are dropped whole
    (documented recall trade at the extreme); raise the cap to keep them.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}): the "
            "pigeonhole candidate guarantee needs at least one band with "
            "no differing bits"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    # The hash frame feeds THREE scans below (bucket counts, join side a,
    # join side b). Its lineage is the expensive part — a codec
    # render+decode mapInPandas pipeline — so persist the tiny
    # (media_id, ahash) projection once instead of re-running the codecs
    # per scan (measured 5.3s -> 1.5s on the audio path at sf0.1). The
    # session cache-hygiene prologue reclaims it after the query's action.
    h = hashed.filter(F.col("ahash").isNotNull()).persist()
    banded = h.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("ahash"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "ahash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    counts = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    banded = banded.join(
        F.broadcast(counts.filter(F.col("n") <= bucket_cap).select("band", "key")),
        ["band", "key"],
    )
    a = banded.select(
        "band", "key", F.col("media_id").alias("id_a"), F.col("ahash").alias("h_a")
    )
    b = banded.select(
        "band", "key", F.col("media_id").alias("id_b"), F.col("ahash").alias("h_b")
    )
    # verify BEFORE the dedup exchange: hamming is a pure function of the
    # two hashes already on the candidate row, and most band collisions
    # fail the threshold — filtering first shrinks the distinct's shuffle
    # to the (rare) true pairs instead of every candidate (guide §2.3).
    # The result set is unchanged: (id_a, id_b) determines (h_a, h_b), so
    # distinct-then-filter and filter-then-distinct keep the same pairs.
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Audio near-duplicate detection over REAL PCM WAV bytes: render -> decode
# samples -> energy-envelope fingerprint -> the same banded Hamming join as
# the image path (the classic acoustic-fingerprint shape: Haitsma & Kalker
# 2002 compare energy across consecutive bands/frames; this is the 1-band
# time-axis variant).
# ---------------------------------------------------------------------------


def synthesize_wav_corpus(docs: DataFrame, samples_per_token: int = 16) -> DataFrame:
    """Render each document as a real PCM WAV: one constant-amplitude
    segment per token, amplitude derived from the token's md5-60bit hash
    (the portable md5_long convention) — textual near-duplicates become
    near-identical waveforms, and because the render spec is a pure
    SQL-expressible function of the text, the mm_audio_dedup oracle can
    reproduce the decoded sample stream (the PCM WAV encode/decode round
    trip is sample-identity) and with it the downstream fingerprint.
    Deterministic."""
    import numpy as np

    from ..functions import media_codecs as mc
    from ..functions.hashing import md5_long_py

    def _amp(t: str) -> int:
        return (md5_long_py(t) % 20000) - 10000

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                toks = text.split() or [""]
                amps = np.array(
                    [_amp(t) for t in toks],
                    dtype=np.int16,
                )
                samples = np.repeat(amps, samples_per_token)
                out.append(mc.wav_encode(samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "content": pd.Series(out, dtype="object", index=pdf.index),
                }
            )

    from ..functions.partitioning import spread

    # the render stage is CPU-dense Python; split an under-partitioned
    # documents scan across cores before entering Arrow (no-op on a
    # well-split cluster scan)
    return spread(docs.select("doc_id", "text")).mapInPandas(
        render, PNG_CORPUS_SCHEMA
    )


def audio_fingerprints(media: DataFrame, windows: int = 64) -> DataFrame:
    """64-bit energy-envelope fingerprint per WAV: decode int16 samples,
    mean |amplitude| over ``windows + 1`` equal time slices, bit j set when
    slice j's energy exceeds slice j+1's (the Haitsma-Kalker 2002
    consecutive-difference rule — LOCAL comparisons, so a small edit flips
    only the bits whose slices it touches, where a global mean threshold
    would shift every bit). Non-WAV bytes hash to NULL.

    Exactness contract (round 7): sample s belongs to slice
    floor(s * n_slices / n_samples) — the balanced partition shared with
    token_envelope_fingerprints — and the energy comparison is the
    integer cross-multiply sum_j * n_{j+1} > sum_{j+1} * n_j, no float
    division anywhere, so a SQL oracle over the same sample stream lands
    on the identical bits."""
    import io as _io
    import wave as _wave

    import numpy as np

    from ..functions import media_codecs as mc

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for content in pdf["content"]:
                b = bytes(content)
                h = None
                if mc.is_wav(b):
                    try:
                        with _wave.open(_io.BytesIO(b), "rb") as w:
                            raw = w.readframes(w.getnframes())
                        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                        n_sl = windows + 1
                        if len(samples) >= n_sl:
                            # cut j = ceil(j * n / n_sl): slice of sample s
                            # is floor(s * n_sl / n) (balanced partition,
                            # nonempty slices whenever n >= n_sl)
                            cuts = (
                                np.arange(n_sl + 1) * len(samples) + n_sl - 1
                            ) // n_sl
                            sums = np.add.reduceat(np.abs(samples), cuts[:-1])
                            ns = np.diff(cuts)
                            bits = sums[:-1] * ns[1:] > sums[1:] * ns[:-1]
                            val = int.from_bytes(
                                np.packbits(bits, bitorder="little").tobytes(),
                                "little",
                            )
                            h = val - (1 << 64) if val >= (1 << 63) else val
                    except (wave_error, EOFError):
                        h = None
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "ahash": pd.Series(hashes, dtype="Int64", index=pdf.index),
                }
            )

    return media.mapInPandas(hash_batch, AHASH_SCHEMA)


TOKEN_ENVELOPE_WINDOWS = 60  # 60-bit fingerprint: positive long, 4x15-bit bands
TOKEN_ENVELOPE_RUN = 8  # samples per token — the WAV render's margin smoothing


def token_envelope_fingerprints(
    docs: DataFrame,
    windows: int = TOKEN_ENVELOPE_WINDOWS,
    samples_per_token: int = TOKEN_ENVELOPE_RUN,
) -> DataFrame:
    """The SQL-expressible signature twin of :func:`audio_fingerprints`:
    the identical Haitsma-Kalker consecutive-difference envelope rule
    (bit j set when slice j's mean energy exceeds slice j+1's over
    ``windows + 1`` equal slices) over a token-derived sample stream
    instead of decoded PCM — each token expands to ``samples_per_token``
    constant-energy samples (energy md5(token) % 256), mirroring
    synthesize_wav_corpus's constant-amplitude segment-per-token render,
    so the whole fingerprint is a pure function of the text that a
    DuckDB oracle reproduces bit-for-bit. Exists so the banded-Hamming
    join + verify stage shared with the codec-backed audio/image dedup
    pipelines gets a full value-hash oracle (mm_audio_dedup_sql); the
    codec stage keeps its constructed-duplicate unit tests.

    The run expansion is load-bearing for tolerance, not decoration:
    with 1 sample per token a one-token trailing edit (the corpus's
    organic near-dup shape) shifts every slice boundary across
    noise-like per-token energies and avalanches the fingerprint
    (measured 0 pairs <= 3 bits at sf0.01); runs of 8 smooth each slice
    mean across ~1.5 tokens so boundary shifts perturb means inside
    their comparison margins — measured 3 pairs at sf0.01, exactly the
    codec-backed audio path's count, with median inter-doc Hamming 30/60
    (random) preserved.

    Determinism: slice assignment floor(spos * (windows+1) / total) is
    the balanced partition; the energy comparison is the integer
    cross-multiply e_j * n_{j+1} > e_{j+1} * n_j — no floating division
    anywhere. Docs with fewer than (windows+1)/samples_per_token tokens
    yield no fingerprint, like sub-slice-count WAVs. Plan: one
    posexplode, a touched-slice explode (closed-form interval overlap —
    ~1-2 rows per token instead of the naive run-per-sample expansion),
    two hash-partitioned aggregates and a 61-row-per-doc window —
    linear, keyed by media_id throughout.
    """
    from ..functions.hashing import md5_long
    from .text_analysis import tokens

    n_sl = windows + 1
    run = int(samples_per_token)
    t = docs.select(
        F.col("doc_id").alias("media_id"),
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    )
    counts = t.groupBy("media_id").agg(
        (F.count(F.lit(1)) * run).alias("total")
    )
    # Closed-form slice assignment (round 7): a token's ``run`` constant-
    # energy samples occupy the contiguous interval [base, base+run); the
    # balanced partition puts sample s in slice floor(s*n_sl/total), so
    # the token touches ONLY slices j_lo..j_hi (j_lo = slice of base,
    # j_hi = slice of base+run-1) and contributes overlap-length many
    # samples to each — an exact integer interval intersection against
    # the slice boundaries cut(j) = ceil(j*total/n_sl). Replaces the
    # per-sample explode (run x token rows — 8x row inflation before the
    # aggregate) with a per-(token, touched-slice) explode (~1-2 rows per
    # token for any doc longer than ~2 slices); identical (es, ns) per
    # slice, measured ~2x end-to-end on the sf0.1 signature twins, and at
    # scale the row count no longer multiplies by the smoothing run.
    t = (
        t.join(counts.filter(F.col("total") >= n_sl), "media_id")
        .select(
            "media_id",
            "total",
            (F.col("pos") * run).alias("base"),
            F.pmod(md5_long(F.col("tok")), F.lit(256)).alias("e"),
        )
        .select(
            "media_id",
            "total",
            "base",
            "e",
            F.explode(
                F.sequence(
                    F.expr(f"base * {n_sl} div total"),
                    F.expr(f"(base + {run - 1}) * {n_sl} div total"),
                )
            ).alias("slice"),
        )
        .select(
            "media_id",
            F.col("slice").cast("int").alias("slice"),
            "e",
            (
                F.least(
                    F.col("base") + run,
                    F.expr(f"((slice + 1) * total + {n_sl - 1}) div {n_sl}"),
                )
                - F.greatest(
                    F.col("base"),
                    F.expr(f"(slice * total + {n_sl - 1}) div {n_sl}"),
                )
            ).alias("ov"),
        )
    )
    ws = t.groupBy("media_id", "slice").agg(
        F.sum(F.col("e") * F.col("ov")).alias("es"),
        F.sum("ov").alias("ns"),
    )
    w = Window.partitionBy("media_id").orderBy("slice")
    bits = ws.select(
        "media_id",
        "slice",
        "es",
        "ns",
        F.lead("es").over(w).alias("e2"),
        F.lead("ns").over(w).alias("n2"),
    ).filter(F.col("slice") < windows)
    return bits.groupBy("media_id").agg(
        F.sum(
            F.when(
                F.col("es") * F.col("n2") > F.col("e2") * F.col("ns"),
                # F.shiftleft only takes a literal shift; the SQL form
                # accepts the column
                F.expr("shiftleft(CAST(1 AS BIGINT), slice)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("ahash")
    )


FRAME_SIG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sig", T.StringType(), False),
    ]
)

VIDEO_FRAME_STRIDE = 64
VIDEO_FRAME_LEN = 64
VIDEO_DUP_MIN_SHARED = 2
VIDEO_SIG_MAX_DF_FRAC = 0.10  # boilerplate-frame cap (intros/outros/slates)
VIDEO_SIG_MIN_DF_CAP = 4      # absolute floor, same rationale as WINNOW's


def frame_signatures(
    media: DataFrame,
    stride: int = VIDEO_FRAME_STRIDE,
    frame_len: int = VIDEO_FRAME_LEN,
) -> DataFrame:
    """Per-frame content signatures for video rows — the decode-side half
    of content-based video dedup: one row per (full) frame window, signed
    with the md5 of the frame's own content so two videos sharing a SCENE
    share signatures even when the surrounding container bytes differ
    (unlike `sample_frames`' whole-file checksums, which only ever match
    on byte-identical videos).

    mapInPandas keeps the real extractor's shape: production swaps the
    stub slicing for a pyav per-frame decode + perceptual frame hash; the
    Spark-side contract (binary in, row-per-frame out, Arrow batches) is
    what's under test. The stub frames are fixed-width character windows
    of the synthetic UTF-8 media bytes, so the DuckDB oracle reproduces
    them exactly with substring + md5 over generate_series."""

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, sigs = [], [], []
            vids = pdf[pdf["media_type"] == "video"]
            for mid, content in zip(vids["media_id"], vids["content"]):
                chars = bytes(content).decode("utf-8")
                i = 0
                while i * stride + frame_len <= len(chars):
                    frame = chars[i * stride : i * stride + frame_len]
                    ids.append(mid)
                    idxs.append(i)
                    sigs.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
                    i += 1
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sig": pd.Series(sigs, dtype="object"),
                }
            )

    from ..functions.partitioning import spread

    # same under-split guard as the codec render stages: the synth media
    # frame inherits the raw scan's partitioning, which would serialize
    # the per-frame hashing onto one core on a small single-file corpus
    return spread(media).mapInPandas(sign, FRAME_SIG_SCHEMA)


def video_dup_pairs(
    media: DataFrame,
    min_shared: int = VIDEO_DUP_MIN_SHARED,
    stride: int = VIDEO_FRAME_STRIDE,
    frame_len: int = VIDEO_FRAME_LEN,
    max_df_frac: float | None = VIDEO_SIG_MAX_DF_FRAC,
) -> DataFrame:
    """Video near-dup pairs by shared frame signatures — the video analog
    of winnowing substring dedup: candidates come from the frame-signature
    inverted-index self-join (blocked per signature, never all-pairs),
    boilerplate frames (df > max_df_frac of the video corpus, with an
    absolute floor) dropped before the join exactly like the hot-shingle
    and hot-fingerprint caps. Output: (media_a, media_b, n_shared_frames)
    for pairs sharing >= min_shared distinct frame signatures."""
    # persisted for the same reason as image_dup_pairs' hash frame: the
    # signature set feeds the df-count scan plus both self-join sides, and
    # its lineage is the row-expanding frame-decode mapInPandas stage
    sig = (
        frame_signatures(media, stride, frame_len)
        .select("media_id", "frame_sig")
        .distinct()
        .persist()
    )
    if max_df_frac is not None:
        n_videos = media.filter(F.col("media_type") == "video").agg(
            F.count(F.lit(1)).alias("_n")
        )
        hot = (
            sig.groupBy("frame_sig")
            .agg(F.count(F.lit(1)).alias("_df"))
            .crossJoin(F.broadcast(n_videos))
            .filter(
                F.col("_df")
                > F.greatest(
                    F.col("_n") * F.lit(float(max_df_frac)),
                    F.lit(float(VIDEO_SIG_MIN_DF_CAP)),
                )
            )
            .select("frame_sig")
        )
        sig = sig.join(F.broadcast(hot), "frame_sig", "left_anti")
    a = sig.select(F.col("media_id").alias("media_a"), "frame_sig")
    b = sig.select(F.col("media_id").alias("media_b"), "frame_sig")
    return (
        a.join(b, "frame_sig")
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= int(min_shared))
    )

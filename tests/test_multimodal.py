"""Multimodal plumbing: binary columns + Arrow-batched mapInPandas decode."""

from __future__ import annotations

from cdc_poc_spark.operators import multimodal
from cdc_poc_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_media_schema_roundtrip(spark):
    media = multimodal.synthesize_media(load_table(spark, SF, "documents"))
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "media_type",
        "content",
        "metadata",
    ]
    row = media.filter("media_id = 0").collect()[0]
    assert isinstance(row.content, (bytes, bytearray))
    assert row.metadata.n_bytes == len(row.content)


def test_decode_features_deterministic(spark):
    media = multimodal.synthesize_media(load_table(spark, SF, "documents"))
    feats = multimodal.decode_features(media)
    a = sorted(map(str, feats.collect()))
    b = sorted(map(str, feats.collect()))
    assert a == b
    one = feats.filter("media_id = 0").collect()[0]
    assert one.width == 16 + one.n_bytes % 1024
    assert one.n_frames == (1 if one.media_type == "image" else 1 + one.n_bytes % 240)


def test_media_stats_covers_all_types(spark):
    media = multimodal.synthesize_media(load_table(spark, SF, "documents"))
    stats = multimodal.media_stats(multimodal.decode_features(media))
    got = {r.media_type: r.n_media for r in stats.collect()}
    assert set(got) == {"image", "audio", "video"}
    assert sum(got.values()) == load_table(spark, SF, "documents").count()


# --- image near-dup pipeline (render -> aHash -> banded Hamming join) ---


def _png_media(spark, rows):
    """rows: list of (media_id, np_uint8_2d_array)."""
    from cdc_poc_spark.functions import media_codecs as mc

    data = [(int(i), bytearray(mc.png_encode(px))) for i, px in rows]
    return spark.createDataFrame(data, "media_id long, content binary")


def _grad(seed):
    import numpy as np

    rng = np.random.RandomState(seed)
    return (rng.rand(16, 16) * 255).astype(np.uint8)


def test_ahash_identical_images_equal(spark):
    px = _grad(1)
    hashed = multimodal.ahash64(_png_media(spark, [(0, px), (1, px.copy())]))
    got = {r.media_id: r.ahash for r in hashed.collect()}
    assert got[0] == got[1]


def test_ahash_perturbed_image_close_distinct_far(spark):
    import numpy as np

    px = _grad(2)
    near = px.copy()
    near[0, 0] ^= 0xFF  # one pixel flipped
    far = 255 - px  # inverted image
    hashed = multimodal.ahash64(
        _png_media(spark, [(0, px), (1, near), (2, far)])
    )
    got = {r.media_id: r.ahash for r in hashed.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[0], got[1]) <= 4
    assert ham(got[0], got[2]) > 16


def test_ahash_non_png_bytes_null(spark):
    media = spark.createDataFrame(
        [(0, bytearray(b"not a png"))], "media_id long, content binary"
    )
    assert multimodal.ahash64(media).collect()[0].ahash is None


def test_image_dup_pairs_finds_dups_not_distincts(spark):
    px = _grad(3)
    near = px.copy()
    near[3, 3] ^= 0x80
    media = _png_media(
        spark, [(0, px), (1, px.copy()), (2, near), (3, _grad(99)), (4, 255 - px)]
    )
    pairs = multimodal.image_dup_pairs(multimodal.ahash64(media))
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got  # identical
    assert (0, 2) in got or (1, 2) in got  # one-pixel perturbation
    assert not any(3 in p or 4 in p for p in got)  # distinct/inverted images


def test_image_dup_bucket_cap_drops_degenerate_bucket(spark):
    import numpy as np

    blank = np.zeros((16, 16), dtype=np.uint8)
    media = _png_media(spark, [(i, blank.copy()) for i in range(10)])
    # 10 identical blanks = 45 pairs uncapped; cap of 5 drops the bucket whole
    assert multimodal.image_dup_pairs(multimodal.ahash64(media)).count() == 45
    capped = multimodal.image_dup_pairs(multimodal.ahash64(media), bucket_cap=5)
    assert capped.count() == 0


def test_png_corpus_real_decodable_and_dup_structure(spark):
    from cdc_poc_spark.functions import media_codecs as mc

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again", "en"),
            (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
            (2, "completely different words about spark catalyst optimizer plans", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    media = multimodal.synthesize_png_corpus(docs)
    rows = {r.media_id: bytes(r.content) for r in media.collect()}
    for b in rows.values():
        w, h, c, px = mc.png_decode(b)
        assert (w, h, c) == (16, 16, 1)
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]
    pairs = multimodal.image_dup_pairs(multimodal.ahash64(media))
    got = {(r.id_a, r.id_b, r.hamming) for r in pairs.collect()}
    assert (0, 1, 0) in got
    assert not any(2 in (a, b) for a, b, _ in got)


# --- audio near-dup pipeline (render WAV -> energy fingerprint -> join) ---


def test_audio_fingerprint_dup_structure(spark):
    from cdc_poc_spark.functions import media_codecs as mc

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta", "en"),
            (1, "alpha beta gamma delta epsilon zeta eta theta", "en"),
            (2, "totally different tokens that sound nothing alike at all", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    media = multimodal.synthesize_wav_corpus(docs)
    rows = {r.media_id: bytes(r.content) for r in media.collect()}
    for b in rows.values():
        nch, rate, nframes = mc.wav_info(b)
        assert (nch, rate) == (1, 16000) and nframes > 0
    assert rows[0] == rows[1] and rows[0] != rows[2]
    pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in multimodal.image_dup_pairs(
            multimodal.audio_fingerprints(media)
        ).collect()
    }
    assert (0, 1, 0) in pairs
    assert not any(2 in (a, b) for a, b, _ in pairs)


def test_audio_fingerprint_non_wav_null(spark):
    media = spark.createDataFrame(
        [(0, bytearray(b"not audio at all"))], "media_id long, content binary"
    )
    assert multimodal.audio_fingerprints(media).collect()[0].ahash is None


def test_video_dup_pairs_shared_scene(spark):
    """Two videos sharing two full frame windows pair up; a single shared
    frame stays below min_shared; non-video rows never contribute."""
    S = multimodal.VIDEO_FRAME_STRIDE
    scene = "".join(chr(ord("a") + i % 26) for i in range(2 * S))  # 2 frames
    one = "".join(chr(ord("A") + i % 26) for i in range(S))        # 1 frame
    rows = [
        (0, "video", (scene + "x" * S).encode()),        # frames: s0 s1 x
        (1, "video", (scene + "y" * S).encode()),        # frames: s0 s1 y
        (2, "video", (one + "z" * S).encode()),          # frames: o0 z
        (3, "video", (one + "w" * S).encode()),          # frames: o0 w
        (4, "image", (scene + "x" * S).encode()),        # not a video
    ]
    media = spark.createDataFrame(
        [(i, t, c, {"n_bytes": len(c), "mime": "m"}) for i, t, c in rows],
        "media_id long, media_type string, content binary, "
        "metadata struct<n_bytes: long, mime: string>",
    )
    got = {
        (r.media_a, r.media_b): r.n_shared_frames
        for r in multimodal.video_dup_pairs(media).collect()
    }
    assert got == {(0, 1): 2}


def test_token_envelope_identical_docs_equal_short_docs_absent(spark):
    """The SQL-expressible envelope twin: identical texts fingerprint
    identically; a doc below the (windows+1)/samples_per_token token
    floor yields no fingerprint (the sub-slice-count WAV analog); and a
    same-length one-token substitution perturbs only the slices that
    token feeds (within the banded-join Hamming budget), a trailing
    append — which SHIFTS every slice boundary — degrades gracefully
    (closer than unrelated text, the measured 3-of-25-organic-pairs
    tolerance documented on the operator), and an unrelated text lands
    at random distance."""
    toks = [f"tok{i % 37}word{i % 11}" for i in range(90)]
    base = " ".join(toks)
    subst = " ".join(toks[:-1] + ["dupmark"])  # same length, last token swapped
    other = " ".join(f"zz{i}q{i % 7}" for i in range(90))
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),                 # exact duplicate
            (2, subst),                # aligned near-dup
            (3, other),                # unrelated
            (4, "too short"),          # below the slice floor
            (5, base + " dupmark"),    # boundary-shifting near-dup
        ],
        "doc_id long, text string",
    )
    fp = {
        r.media_id: r.ahash
        for r in multimodal.token_envelope_fingerprints(docs).collect()
    }
    assert 4 not in fp
    assert fp[0] == fp[1]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp[0], fp[2]) <= multimodal.IMG_DUP_MAX_HAMMING
    assert ham(fp[0], fp[5]) < ham(fp[0], fp[3])
    assert ham(fp[0], fp[3]) > 10
    # and the full banded stage pairs the aligned dup group, never the
    # unrelated doc
    pairs = {
        (r.id_a, r.id_b)
        for r in multimodal.image_dup_pairs(
            multimodal.token_envelope_fingerprints(docs)
        ).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    assert not any(3 in p for p in pairs)

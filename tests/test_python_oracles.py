"""Python-oracle differentials for the codec pipelines: an independent
pure numpy/pandas reimplementation of the full render -> decode ->
fingerprint -> banded-join pipeline, compared against the Spark result
over the real sf0.001 corpus. Since round 7 the same pipelines also carry
full DuckDB oracles (md5-convention renders + integer-exact fingerprints
made them SQL-expressible); this differential stays as the third,
codec-inclusive leg — unlike the SQL oracle it round-trips the REAL
PNG/WAV bytes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from cdc_poc_spark.operators import multimodal
from cdc_poc_spark.functions import media_codecs as mc
from cdc_poc_spark.functions.hashing import md5_long_py

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _banded_pairs(hashes: dict[int, int], max_hamming=3, bands=4, cap=200):
    """Reference banded Hamming join in pure python."""
    width = 64 // bands
    mask = (1 << width) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for mid, h in hashes.items():
        u = h & ((1 << 64) - 1)
        for b in range(bands):
            buckets.setdefault((b, (u >> (b * width)) & mask), []).append(mid)
    pairs = set()
    for members in buckets.values():
        if len(members) > cap:
            continue  # degenerate bucket dropped whole
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                if bin((hashes[lo] ^ hashes[hi]) & ((1 << 64) - 1)).count("1") <= max_hamming:
                    pairs.add((lo, hi))
    return pairs


def _to_u64_bits(bits) -> int:
    val = 0
    for i, bit in enumerate(bits):
        if bit:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def test_image_dedup_matches_python_oracle(spark):
    pdf = pd.read_parquet(DOCS)
    hashes = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = text.split()
        cells = np.array(
            [md5_long_py(" ".join(toks[i:i + 3])) % 256
             for i in range(max(0, len(toks) - 2))], dtype=np.int64)
        grid = np.bincount(cells, minlength=256).reshape(16, 16)
        peak = grid.max()
        px = (grid * 255 // peak).astype(np.uint8) if peak else grid.astype(np.uint8)
        # round-trip through the real PNG codec, as the operator does
        _w, _h, _c, dec = mc.png_decode(mc.png_encode(px))
        gray = dec.astype(np.int64).sum(axis=2)
        small = mc.resize_nearest(gray[:, :, None], 8, 8)[:, :, 0]
        hashes[int(doc_id)] = _to_u64_bits((small * 64 > small.sum()).flatten())
    expected = _banded_pairs(hashes)
    media = multimodal.synthesize_png_corpus(spark.read.parquet(DOCS))
    got = {
        (r.id_a, r.id_b)
        for r in multimodal.image_dup_pairs(multimodal.ahash64(media)).collect()
    }
    assert got == expected


def test_audio_dedup_matches_python_oracle(spark):
    import io
    import wave

    pdf = pd.read_parquet(DOCS)
    hashes = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = text.split() or [""]
        amps = np.array(
            [(md5_long_py(t) % 20000) - 10000 for t in toks], dtype=np.int16)
        samples = np.repeat(amps, 16)
        # round-trip through the real WAV codec, as the operator does
        with wave.open(io.BytesIO(mc.wav_encode(samples)), "rb") as w:
            raw = w.readframes(w.getnframes())
        s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        n_sl = 65
        if len(s) < n_sl:
            continue
        # balanced partition (slice = floor(pos * n_sl / n)), integer
        # cross-multiply comparison — the round-7 exactness contract
        cuts = (np.arange(n_sl + 1) * len(s) + n_sl - 1) // n_sl
        sums = np.array([np.abs(s[cuts[i]:cuts[i + 1]]).sum() for i in range(n_sl)])
        ns = np.diff(cuts)
        hashes[int(doc_id)] = _to_u64_bits(sums[:-1] * ns[1:] > sums[1:] * ns[:-1])
    expected = _banded_pairs(hashes)
    media = multimodal.synthesize_wav_corpus(spark.read.parquet(DOCS))
    got = {
        (r.id_a, r.id_b)
        for r in multimodal.image_dup_pairs(
            multimodal.audio_fingerprints(media)
        ).collect()
    }
    assert got == expected


def test_mm_oracle_whitespace_guard_matches_python_split():
    """The _MM_TOKS_CTE guard class must flag EXACTLY the characters
    Python str.split() treats as whitespace, minus the space itself —
    exhaustively over the BMP + astral planes (ADVICE r7: the old guard
    missed \\x1c-\\x1f, NEL, NBSP, and the Zs block)."""
    import re
    import sys

    import duckdb

    from cdc_poc_spark.plans import oracles

    sql = oracles.oracle_sql()["mm_image_dedup"]
    m = re.search(r"regexp_matches\(text, '(\[[^']+\])'\)", sql)
    assert m, "mm oracle guard regex not found"
    pat = m.group(1)
    con = duckdb.connect()
    # one vectorized probe: every codepoint as a 1-char string
    chars = [chr(i) for i in range(sys.maxunicode + 1) if chr(i).isspace()]
    chars += [" ", "a", "0", "⁠", "﻿"]  # word-joiner/BOM: NOT space
    flags = con.execute(
        "SELECT list_transform(?::VARCHAR[], c -> regexp_matches(c, ?))",
        [chars, pat],
    ).fetchone()[0]
    for c, flagged in zip(chars, flags):
        want = c.isspace() and c != " "
        assert flagged == want, f"guard mismatch at U+{ord(c):04X}"

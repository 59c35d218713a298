"""Portable deterministic hashing primitives.

The LLM-pipeline operators (minhash, simhash, LSH, fingerprints) need a hash
function that produces IDENTICAL values in Spark and in the DuckDB oracle.
Neither engine's native hash qualifies (xxhash64 vs DuckDB's own), so the
bridge is md5 — bit-identical everywhere — mapped to a 60-bit integer:

  Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

15 hex chars = 60 bits, always positive, no signed-overflow edge. Seeded
family: md5(seed || x).

Scale note: md5 is a JVM-side codegen'd expression (no Python), ~the cost of
the xxhash64 Spark would use natively; fine in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
# modulus for the rolling polynomial fingerprint: largest signed-32 prime so
# (acc*31 + codepoint) never overflows 64-bit in either engine
ROLL_MOD = 2_147_483_647


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint (portable)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def md5_long_seeded(col: Column, seed: str) -> Column:
    return md5_long(F.concat(F.lit(seed), col.cast("string")))


def md5_long_py(s: str) -> int:
    """Python scalar twin of :func:`md5_long` — for renders/oracles that
    compute the portable convention inside plain Python (codec synthesis,
    pure-python differentials). One definition so a convention change
    cannot silently diverge across call sites.

    The first 15 hex chars are the first 60 bits of the digest, so the
    binary form (8 bytes big-endian, low nibble dropped) is the same
    integer without the hexdigest string + int-parse round trip — ~2x
    cheaper per call, and this runs once per token/trigram in the media
    render stages (tests/test_r10_optimizations.py pins the two forms
    equal)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big") >> 4


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_long` for oracle SQL."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def md5_long_seeded_sql(expr: str, seed: str) -> str:
    return md5_long_sql(f"'{seed}' || {expr}")


def minhash_constants(n: int) -> list[int]:
    """n deterministic 60-bit XOR mixers for the minhash family
    sig_i = min_x (md5_60(x) XOR c_i) — one md5 per element total, instead
    of one per (element, hash-function). Derived from md5 in Python (same
    digest function), so the oracle embeds identical literals."""
    import hashlib

    return [
        int(hashlib.md5(f"mhxor{i}".encode()).hexdigest()[:15], 16) for i in range(n)
    ]


def rolling_fingerprint(text: Column) -> Column:
    """Deterministic rolling polynomial hash over codepoints:
    fold (acc*31 + codepoint) mod 2^31-1 — the classic Rabin-Karp-style
    document fingerprint, expressible identically in both engines
    (Spark ``aggregate``, DuckDB ``list_reduce``)."""
    codes = F.transform(
        F.filter(F.split(text, ""), lambda ch: ch != F.lit("")),
        lambda ch: F.ascii(ch).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(ROLL_MOD),
    )


def rolling_fingerprint_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`rolling_fingerprint` (prepend 0 = explicit
    init, so the fold matches Spark's ``aggregate`` exactly)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split({text_expr}, ''), c -> c <> ''), "
        f"c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {ROLL_MOD})"
    )

"""Deduplication operators (SURVEY.md §2K-K1/K2) — the LLM-data-pipeline
dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these at 100 TB):

* exact dedup never compares rows pairwise — it hash-partitions on a
  fingerprint (one shuffle) and keeps one representative per group;
* near-dup never does the O(n²) self-join — MinHash/LSH bands route
  candidate pairs through band-bucket joins (REPOSE-style partition-local
  pruning, see PAPERS.md), so work is O(n · bands + candidate pairs);
* SimHash reduces a document to one 64-bit signature; near-dup candidates
  are pairs whose signatures agree on a banded prefix, verified by
  Hamming distance — all expressible with xxhash64 + bit ops, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def text_fingerprint(col: Column | str) -> Column:
    """Canonical content fingerprint: lowercase, collapse whitespace, md5.
    The exact-dedup key — md5 is stable across engines and languages."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def dedup_exact(
    df: DataFrame, key: Column, id_col: str, payload_cols: list[str]
) -> DataFrame:
    """Keep one representative row (min id) per fingerprint group.

    ``groupBy(fingerprint)`` = one shuffle on a uniformly-distributed md5
    key — no skew, no pairwise compare.  ``n_dups`` preserved so the
    pipeline can report dedup rates."""
    return (
        df.withColumn("fingerprint", key)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_dups"),
            *[F.min(c).alias(c) for c in payload_cols],
        )
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) of a text column — the unit of
    Jaccard similarity.  Pure Column expression: split → sliding windows
    via transform over index sequence → distinct."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over array columns (inputs must be distinct)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_signature(col: Column | str, num_hashes: int = 32) -> Column:
    """MinHash signature over word-3-gram shingles.

    One xxhash64 per (shingle, seed-salt) pair, min per salt — entirely
    JVM-side, no Python UDF.  Collision behavior matches the classic
    h_i(x) = hash(salt_i || x) family.
    """
    sh = shingles(col)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(i), s))
            )
            for i in range(num_hashes)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash+LSH near-dup candidates.

    signature → split into ``bands`` rows of ``num_hashes/bands`` values →
    band-bucket equi-join (hash shuffle on the bucket key) → distinct
    pairs.  The self-join never materializes n²: only rows sharing a full
    band collide.  Returns (id_a, id_b) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes)
    banded = df.select(
        F.col(id_col), sig.alias("sig")
    ).select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band).alias(
                            "vals"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("pos", "bandrow"),
    ).select(
        id_col,
        F.xxhash64(F.col("bandrow.band"), F.to_json(F.col("bandrow.vals"))).alias(
            "bucket"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over word shingles: per-bit majority vote of shingle
    hashes, expressed with bit ops inside aggregate-over-array — no UDF."""
    sh = shingles(col, n=2)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    bits = [
        F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(h.bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(
                    -1
                ),
            )
            > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(16)  # 16 bits keeps expression tree manageable
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def near_dup_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_cols: list[str],
    threshold: float = 0.4,
    sample_mod: int | None = None,
) -> DataFrame:
    """Blocked n-gram-Jaccard near-dup: self-join within coarse buckets
    (e.g. lang), compute Jaccard over 3-gram shingle sets, keep pairs ≥
    threshold.  ``sample_mod`` optionally thins the left side for cost
    control.  At scale, prefer lsh_candidate_pairs to generate the pairs
    and use this only as the verify stage."""
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in bucket_cols],
        shingles(text_col).alias("sh"),
    )
    left = base
    if sample_mod:
        left = base.where(F.col(id_col) % sample_mod == 0)
    a, b = left.alias("a"), base.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    jac = jaccard(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def keep_first_per_key(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Window keep-first — dedup at scale when payloads are wide (avoids
    min() over every column): rank within fingerprint, keep rn=1."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")

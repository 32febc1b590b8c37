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

from historic_score_etl_pipeline_spark.operators.pins import pin


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
    # regex strip, not F.trim — same rationale as token_hashes: trim()
    # removes only ASCII spaces, so a tab/newline-padded doc would grow
    # spurious empty tokens and diverge from str.strip()/str.split()
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")
    toks = F.split(F.lower(stripped), r"\s+")
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

    Hash each shingle ONCE with xxhash64 (reduced mod 2³¹-1), then derive
    the ``num_hashes`` family members by the affine trick
    h_i(x) = a_i·h(x) + b_i (mod 2³¹-1) — only one string hash per
    shingle; the rest is integer arithmetic.  31-bit modulus keeps every
    product inside a long even under ANSI overflow checking.  Prefer
    :func:`minhash_base` + :func:`minhash_mins` staged as two projections
    (as lsh_candidate_pairs does) so the string hashing is evaluated once,
    not once per family member.
    """
    return minhash_mins(minhash_base(col), num_hashes)


_MH_P = (1 << 31) - 1
# fixed odd affine constants (deterministic, pairwise-independent enough
# for LSH banding); all < 2^31 so h*a < 2^62
_MH_A = [(2 * i * 0x9E3779B9 + 1) % _MH_P for i in range(1, 65)]
_MH_B = [(i * 0x85EBCA6B) % _MH_P for i in range(1, 65)]


def token_hashes(col: Column | str) -> Column:
    """Per-token 31-bit hashes: each token xxhash64'd ONCE, reduced mod
    2³¹-1.  The expensive string pass — stage it as its own projection."""
    c = F.col(col) if isinstance(col, str) else col
    # regex strip, not F.trim: trim() removes only ASCII spaces, so a
    # tab/newline-padded doc would split into spurious empty tokens and
    # diverge from Python str.strip()/str.split() semantics
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")
    toks = F.split(F.lower(stripped), r"\s+")
    return F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(_MH_P)))


def token_hashes_md5(col: Column | str) -> Column:
    """Engine-PORTABLE twin of :func:`token_hashes`: 31-bit token hashes
    derived from md5 (first 15 hex chars → integer, mod 2³¹−1) instead
    of xxhash64.  md5 is bit-identical in every engine, so a SQL oracle
    can replay the whole MinHash→LSH chain value-for-value — this is the
    hash the ``dedup_near_minhash`` contract query uses.  Production
    paths keep xxhash64 (several× cheaper per token); the two differ
    ONLY in the base hash, all downstream arithmetic is shared."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")
    toks = F.split(F.lower(stripped), r"\s+")
    return F.transform(
        toks,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
            F.lit(_MH_P),
        ),
    )


def shingle_hashes(th: Column, n: int = 3) -> Column:
    """Shingle hash = affine combination of n consecutive token hashes —
    pure integer math, no shingle-string allocation, and each token was
    hashed once (vs. n× when hashing concatenated n-gram strings).

    ``th`` MUST be a materialized column (stage :func:`token_hashes` in a
    prior ``select``): lambda bodies inline their inputs, so passing the
    raw token_hashes *expression* here would re-expand it per element
    access — O(tokens²) work.  Products stay < 2⁶² → ANSI-overflow-safe.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(th) - n, F.lit(0)))
    combined = F.transform(
        idx,
        # F.get is 0-based and null-on-out-of-bounds (docs shorter than n
        # tokens must not throw under ANSI); coalesce(0) keeps them hashable
        lambda i: F.pmod(
            sum(
                F.coalesce(F.get(th, i + j), F.lit(0)) * F.lit(_MH_A[j])
                for j in range(1, n)
            )
            + F.coalesce(F.get(th, i), F.lit(0)),
            F.lit(_MH_P),
        ),
    )
    return F.array_distinct(combined)


def minhash_base(col: Column | str, n: int = 3) -> Column:
    """Single-expression convenience form of token_hashes → shingle_hashes.

    Only for one-off use: inside one expression the token-hash array is a
    lambda-bound value, so no re-expansion happens (zip_with binds it), but
    perf-critical paths should stage the two projections explicitly as
    :func:`lsh_candidate_pairs` does."""
    th = token_hashes(col)
    # bind th once via transform-over-singleton to avoid re-expansion,
    # then flatten: transform([th], t -> shingle_hashes(t))[0]
    return F.get(
        F.transform(F.array(F.struct(th.alias("h"))), lambda s: shingle_hashes(s["h"], n)),
        0,
    )


def minhash_mins(base: Column, num_hashes: int = 32) -> Column:
    """Affine-derived MinHash mins over precomputed base hashes.

    One ``aggregate`` fold keeps a running array of ``num_hashes`` minima,
    updating all of them per shingle hash.  Same arithmetic as the naive
    form (num_hashes × array_min(transform(...))) but one traversal of the
    shingle array instead of ``num_hashes``, no intermediate arrays, and —
    decisive in practice — a codegen tree of constant size: the unrolled
    form compiled ~45 s of whole-stage codegen at 32 hashes on first use,
    the fold compiles in milliseconds."""
    # affine constants derived arithmetically from the family index so the
    # lambda stays free of array literals (which would be re-evaluated per
    # element): a_i = (2i·φ+1) mod P, b_i = (i·κ) mod P — matches _MH_A/_MH_B
    phi2, kappa = F.lit(2 * 0x9E3779B9), F.lit(0x85EBCA6B)
    p = F.lit(_MH_P)

    def update(acc: Column, h: Column) -> Column:
        return F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(num_hashes)),
            lambda m, i: F.least(
                m, F.pmod(h * F.pmod(i * phi2 + 1, p) + F.pmod(i * kappa, p), p)
            ),
        )

    return F.aggregate(
        base, F.array_repeat(p.cast("long"), num_hashes), update
    )


def band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """(id, bucket) rows: the LSH band index of each document — ``bands``
    rows per doc, bucket = hash of (band number, that band's signature
    slice).  This is the persisted "signature index" of an incremental
    dedup deployment: computed once per doc, stored partitioned by
    bucket.  ``portable=True`` swaps both hash sites to md5
    (:func:`token_hashes_md5` + an md5 bucket key) so an external SQL
    oracle can replay the chain exactly."""
    from historic_score_etl_pipeline_spark.operators.scale import ensure_parallelism

    # CPU-heavy per-row work: make sure it spreads across cores even when
    # the source is one small parquet file (at 100 TB the scan itself
    # yields enough splits and this repartition collapses to a no-op check)
    df = ensure_parallelism(df, id_col)
    # two staged projections (token hash → shingle combine): each stage
    # references the previous as a materialized column, so nothing is
    # inlined/recomputed per element
    hasher = token_hashes_md5 if portable else token_hashes
    sh = df.select(
        F.col(id_col), hasher(text_col).alias("th")
    ).select(F.col(id_col), shingle_hashes(F.col("th")).alias("mh_base"))
    return band_buckets_from_hashes(
        sh, id_col, "mh_base", num_hashes, bands, portable
    )


def band_buckets_from_hashes(
    sh: DataFrame,
    id_col: str,
    hash_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Band buckets from a PRECOMPUTED shingle-hash array column — the
    entry point when the shingle pass is shared with a verify stage
    (dedup_pipeline_e2e persists one signature-base and derives banding,
    Jaccard verification and survivorship from it: one corpus scan, one
    hash pass)."""
    rows_per_band = num_hashes // bands
    return sh.select(
        F.col(id_col), minhash_mins(F.col(hash_col), num_hashes).alias("sig")
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
        # xxhash64 hashes the array column natively — no JSON stringify.
        # The portable path formats "band,v1,v2,..." and md5s it: byte-
        # replayable in any engine (array_to_string in DuckDB).
        F.md5(
            F.concat_ws(
                ",",
                F.col("bandrow.band").cast("string"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.col("bandrow.vals"), lambda v: v.cast("string")
                    ),
                ),
            )
        ).alias("bucket")
        if portable
        else F.xxhash64(F.col("bandrow.band"), F.col("bandrow.vals")).alias(
            "bucket"
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """MinHash+LSH near-dup candidates.

    signature → split into ``bands`` rows of ``num_hashes/bands`` values →
    band-bucket equi-join (hash shuffle on the bucket key) → distinct
    pairs.  The self-join never materializes n²: only rows sharing a full
    band collide.  Returns (id_a, id_b) with id_a < id_b.
    """
    # Pinned (lazy checkpoint): the banded signature table feeds BOTH
    # self-join sides; unpinned, the planner broadcasts one side and the
    # whole shingle→MinHash→banding chain executes twice (r11 plan
    # audit).  Post-checkpoint the table has no size statistics, so the
    # bucket join is hinted SHUFFLE_HASH — the honest strategy at every
    # scale (the band table is corpus-sized; sort-merge would sort it,
    # broadcast would not survive real corpora).
    # Skew note (ADVICE r11 #2): a forced SHUFFLE_HASH build side cannot
    # spill, so ONE pathologically hot band bucket (a boilerplate phrase
    # shared by millions of docs) concentrated on one partition could OOM
    # an executor where sort-merge would have spilled.  Accepted
    # knowingly: bucket keys are (band, md5-derived value) — hash-mixed
    # by construction — and AQE's skewJoin split remains enabled for the
    # probe side; if a corpus with degenerate buckets shows up, cap
    # bucket width upstream (drop buckets over a frequency bound, the
    # standard LSH "stop-bucket" guard) rather than un-hinting the join.
    banded = pin(band_buckets(
        df, id_col, text_col, num_hashes, bands, portable
    ))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_candidate_pairs_incremental(
    existing: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Incremental near-dup check: each NEW doc against the EXISTING
    corpus only — the arriving-batch shape of a production dedup service.

    The existing side's band buckets are the persisted signature index
    (``band_buckets``; at 100 TB stored bucket-partitioned so this join
    co-locates without a shuffle of the index).  Only new×existing
    collisions are produced — never existing×existing (already
    adjudicated in earlier batches) and never new×new (callers run
    ``lsh_candidate_pairs`` on the batch for that).  Cost per batch is
    O(|new| × bands) probe rows, independent of corpus size.

    Returns (new_id, existing_id) distinct pairs.
    """
    idx = band_buckets(existing, id_col, text_col, num_hashes, bands)
    probes = band_buckets(new, id_col, text_col, num_hashes, bands)
    return (
        probes.alias("n")
        .join(idx.alias("e"), F.col("n.bucket") == F.col("e.bucket"))
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"e.{id_col}").alias("existing_id"),
        )
        .distinct()
    )


def _simhash_majority(hashes: Column, n_bits: int) -> Column:
    """Per-bit majority vote over an array of integer hashes → packed
    signature: bit i is set iff more hashes have bit i set than clear.
    Pure bit ops inside aggregate-over-array — no UDF."""
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
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash64(col: Column | str) -> Column:
    """16-bit SimHash over word 2-gram shingles, xxhash64 base — the
    fast path (one JVM hash per shingle)."""
    sh = shingles(col, n=2)
    return _simhash_majority(F.transform(sh, lambda s: F.xxhash64(s)), 16)


def simhash_portable(col: Column | str) -> Column:
    """16-bit SimHash with an md5-derived base hash (low 60 bits of the
    digest), replayable bit-for-bit in any engine with md5 — the same
    portability trick as ``minhash_signature(portable=True)``.  The
    xxhash64 path (:func:`simhash64`) stays the production default; the
    two share the majority-vote fold, so the oracle exercises all the
    arithmetic past the base hash."""
    sh = shingles(col, n=2)
    hashes = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    return _simhash_majority(hashes, 16)


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
    from historic_score_etl_pipeline_spark.operators.scale import ensure_parallelism

    base = ensure_parallelism(df, id_col).select(
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


def substring_span_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_df: int = 20,
) -> DataFrame:
    """Doc pairs sharing at least one VERBATIM n-token gram, with the
    earliest shared-span start positions — the fixed-gram-length Spark
    restatement of exact-substring training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"; the
    suffix-array pass becomes a gram-bucket equi-join).

    Semantics: per document each distinct gram keeps its earliest start
    (0-based token offset); grams occurring in more than ``max_df``
    documents are dropped BEFORE pairing — the boilerplate guard that is
    also the skew guard (a stop-phrase gram in 10⁶ docs would otherwise
    fan out 10¹² pairs).  Output per unordered pair (doc_a < doc_b):
    ``n_shared_grams`` and the min start offset on each side.

    Scale shape: explode → per-doc gram dedup (one shuffle keyed on
    (doc, gram)) → frequency filter and the pair join BOTH keyed on the
    gram, so Catalyst reuses one hash partitioning; per-gram fan-out is
    capped at max_df² pairs.  Never an all-pairs doc join.
    """
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("t"),
    ).where(F.size("t") >= n)
    grams = toks.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), F.size("t") - n)).alias("_i", "start"),
        "t",
    ).select(
        id_col,
        F.col("start").cast("long").alias("start"),
        F.array_join(F.slice("t", F.col("start") + 1, F.lit(n)), " ").alias("gram"),
    )
    occ = grams.groupBy(id_col, "gram").agg(F.min("start").alias("start"))
    freq = occ.groupBy("gram").agg(F.count(F.lit(1)).alias("gram_df"))
    occf = occ.join(
        freq.where((F.col("gram_df") >= 2) & (F.col("gram_df") <= max_df)),
        "gram",
    ).select(id_col, "gram", "start")
    a, b = occf.alias("a"), occf.alias("b")
    return (
        a.join(b, "gram")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_grams"),
            F.min("a.start").alias("first_start_a"),
            F.min("b.start").alias("first_start_b"),
        )
    )


def _doc_grams_all(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram) rows — sliding n-token grams per document WITH
    duplicates, split on single spaces (empties dropped).  Map-only:
    linear in tokens, never shuffled here."""
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("t"),
    ).where(F.size("t") >= n)
    return toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.array_join(F.slice("t", i + 1, F.lit(n)), " "),
            )
        ).alias("gram"),
    )


def _doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram) rows — DISTINCT sliding n-token grams per document,
    split on single spaces (empties dropped).  Linear in tokens."""
    return _doc_grams_all(df, id_col, text_col, n).distinct()


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Sliding n-token-gram eval-set decontamination — the GPT-3-style
    benchmark filter (Brown et al. 2020, appendix C): a training document
    is contaminated when ANY of its n-grams appears verbatim anywhere in
    the held-out eval split.  Complements chunk-hash contamination
    (stride-16 windows, contract/surface14.py) with the stride-1
    standard used for published decontamination numbers.

    Output: one row per contaminated training doc —
    ``(train_id, n_hit_grams, first_hit_gram)`` where ``n_hit_grams``
    counts the doc's DISTINCT grams that exist in the eval gram set and
    ``first_hit_gram`` is the lexicographically smallest such gram (a
    deterministic witness for auditing).

    Scale shape: both sides reduce to DISTINCT (doc, gram) /(gram) sets
    before the equi-join on ``gram`` — never a doc×doc comparison.  The
    eval gram set is tiny relative to the corpus (benchmarks are MBs,
    corpora TBs), so Catalyst broadcast-joins it; per-gram fan-out is
    bounded by eval DISTINCT which needs no skew guard.  At 100 TB the
    train-side gram explosion is map-side only (one shuffle for the
    per-doc distinct, reused by the aggregation).
    """
    # r11, same rows: the train side is NOT per-doc de-duplicated up
    # front — that distinct was a full shuffle of the exploded 13-gram
    # STRINGS (the heaviest possible shuffle payload, the same
    # super-linear shape the r11 third-decade probe caught in
    # dedup_contamination).  The corpus-sized gram stream is now
    # map-only: broadcast hash probe against the eval set, and
    # distinctness is restored where it is actually needed, as
    # count_distinct inside the one post-join aggregation over MATCHED
    # rows only.  Measured 1.36 s → 1.17 s at sf0.1, rows identical.
    train_grams = _doc_grams_all(train, id_col, text_col, n)
    eval_grams = (
        _doc_grams(eval_df, id_col, text_col, n).select("gram").distinct()
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(F.col(id_col).alias("train_id"))
        .agg(
            F.count_distinct("gram").cast("long").alias("n_hit_grams"),
            F.min("gram").alias("first_hit_gram"),
        )
    )

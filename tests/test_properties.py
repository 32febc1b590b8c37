"""Property tests (SURVEY.md §5.2-4, hypothesis): algebraic invariants of
the operator library on generated inputs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from historic_score_etl_pipeline_spark.functions.strings import classify_activity_py


def _overtime_py(s: str) -> int | None:
    """Reference semantics of overtime_minute for the property check."""
    try:
        if "+" in s:
            a, b = s.split("+", 1)
            b = b.split("+", 1)[0]
            return int(a) + int(b)
        return int(s)
    except ValueError:
        return None


@given(st.integers(0, 130), st.integers(0, 15))
def test_overtime_sum_property(base, extra):
    assert _overtime_py(f"{base}+{extra}") == base + extra
    assert _overtime_py(str(base)) == base


@given(st.text(alphabet="abcdefgh <>\"=-", max_size=40))
def test_classify_never_raises(s):
    # classifier is total over arbitrary strings
    out = classify_activity_py(s)
    assert out in {
        None,
        "goal",
        "redcard",
        "yellowcard",
        "red-yellowcard",
        "substitution",
        "var",
        "penalty(missed)",
    }


@given(
    st.lists(st.sampled_from(["card", "red", "yellow", "soccer", "var", "x"]), max_size=4)
)
def test_classify_precedence(parts):
    tok = "-".join(parts)
    out = classify_activity_py(tok)
    if "card" in tok and "red" not in tok and "yellow" not in tok:
        assert out == "red-yellowcard"
    elif "red" in tok:
        assert out == "redcard"


# spark-level invariants run once (not per-example) for speed --------------

def test_union_and_dedup_invariants(spark):
    from pyspark.sql import functions as F
    from historic_score_etl_pipeline_spark.operators.dedup import (
        dedup_exact,
        text_fingerprint,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    # union associativity / count additivity
    assert a.unionByName(b).count() == docs.count()
    # dedup fixpoint: dedup(dedup(x)) == dedup(x)
    d1 = dedup_exact(docs, text_fingerprint("text"), "doc_id", ["lang"])
    assert d1.count() == docs.select(text_fingerprint("text")).distinct().count()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _asof_case(draw):
    n_keys = draw(st.integers(1, 4))
    left = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 50)),
            min_size=1,
            max_size=25,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 50)),
            min_size=0,
            max_size=25,
        )
    )
    return left, right


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_asof_case())
def test_asof_backward_join_matches_brute_force(spark, case):
    """The union-merge as-of plan (the engine's DEFAULT as-of join) must
    agree with the O(n·m) python brute force on arbitrary key/time data,
    including ties (tiebreak = max payload id at equal time) and
    no-prior-match rows."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_backward_join,
    )

    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        ["lid", "k", "lt"],
    )
    right = spark.createDataFrame(
        [(100 + i, k, t) for i, (k, t) in enumerate(right_rows)],
        "rid: bigint, k: bigint, rt: bigint",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_backward_join(
            left, right, "k", "lt", "rt", ["rid"], right_tiebreak="rid"
        ).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        candidates = [
            (rt, 100 + j)
            for j, (rk, rt) in enumerate(right_rows)
            if rk == k and rt <= t
        ]
        expected = max(candidates)[1] if candidates else None
        assert got[i] == expected, (i, k, t, candidates)


@st.composite
def _interval_case(draw):
    n_keys = draw(st.integers(1, 3))
    def side(max_size):
        return draw(
            st.lists(
                st.tuples(
                    st.integers(0, n_keys - 1),
                    st.integers(0, 400),      # start
                    st.integers(0, 350),      # span
                ),
                min_size=0,
                max_size=max_size,
            )
        )
    return side(20), side(20), draw(st.sampled_from([50, 100, 333]))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_interval_case())
def test_interval_overlap_join_matches_brute_force(spark, case):
    """The bin-bucketed overlap join must agree with the O(n·m) python
    brute force for arbitrary intervals and bin widths — including
    touching endpoints (closed intervals), spans larger than a bin, and
    zero-length intervals — and emit each pair exactly once."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    a_rows, b_rows, width = case
    a = spark.createDataFrame(
        [(i, k, s, s + d) for i, (k, s, d) in enumerate(a_rows)],
        "id_a: bigint, k: bigint, s: bigint, e: bigint",
    )
    b = spark.createDataFrame(
        [(100 + i, k, s, s + d) for i, (k, s, d) in enumerate(b_rows)],
        "id_b: bigint, k: bigint, s: bigint, e: bigint",
    )
    rows = interval_overlap_join(a, b, "k", "s", "e", bin_width=width).collect()
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys))
    got = {(r["id_a"], r["id_b"]): r["overlap_us"] for r in rows}
    expected = {}
    for i, (ka, sa, da) in enumerate(a_rows):
        for j, (kb, sb, db) in enumerate(b_rows):
            ea, eb = sa + da, sb + db
            if ka == kb and sa <= eb and sb <= ea:
                expected[(i, 100 + j)] = min(ea, eb) - max(sa, sb)
    assert got == expected


@st.composite
def _spatial_case(draw):
    pts = draw(
        st.lists(
            st.tuples(
                st.integers(-30, 30),  # x in 0.1 units
                st.integers(-30, 30),  # y in 0.1 units
            ),
            min_size=0,
            max_size=25,
        )
    )
    d = draw(st.sampled_from([0.15, 0.3, 1.0]))
    return pts, d


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_spatial_case())
def test_spatial_neighbor_join_matches_brute_force(spark, case):
    """The 3×3-cell grid join must agree with the O(n²) brute force for
    arbitrary points and thresholds — including exact-threshold pairs,
    duplicate coordinates, and negative coordinates — and emit each pair
    exactly once."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        spatial_neighbor_join,
    )

    pts, d = case
    points = spark.createDataFrame(
        [(i, x / 10.0, y / 10.0) for i, (x, y) in enumerate(pts)],
        "pid: bigint, x: double, y: double",
    )
    rows = spatial_neighbor_join(points, "pid", "x", "y", d).collect()
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys))
    got = {(r["id_a"], r["id_b"]): r["dist_sq_e12"] for r in rows}
    expected = {}
    for i, (xi, yi) in enumerate(pts):
        for j in range(i + 1, len(pts)):
            xj, yj = pts[j]
            # mirror the OPERATOR's arithmetic exactly: coordinates are
            # divided first (as in the DataFrame), THEN subtracted —
            # (xi-xj)/10 differs in the last ulp and flips pairs sitting
            # exactly on the threshold (found by hypothesis: 2.3 vs 2.6
            # at d=0.3)
            dx = xi / 10.0 - xj / 10.0
            dy = yi / 10.0 - yj / 10.0
            dsq = dx * dx + dy * dy
            if dsq <= d * d:
                import math
                expected[(i, j)] = int(math.floor(dsq * 1e12 + 0.5))
    assert got == expected


@st.composite
def _hitter_case(draw):
    # skewed stream: a few hot items + uniform noise
    hot = draw(st.lists(st.integers(50, 300), min_size=0, max_size=3))
    n_noise = draw(st.integers(0, 300))
    k = draw(st.sampled_from([4, 8, 16]))
    denom = draw(st.sampled_from([3, 4]))
    return hot, n_noise, k, denom


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_hitter_case())
def test_heavy_hitters_match_exact_counts(spark, case):
    """For any stream and any valid (k, denom), the output must equal
    the exact thresholded counts — the MG candidate stage may vary with
    partitioning, the verified output may not."""
    from historic_score_etl_pipeline_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    hot, n_noise, k, denom = case
    if denom >= k + 1:
        return  # invalid configs are covered by the ValueError test
    rows = []
    for i, c in enumerate(hot):
        rows += [(f"hot_{i}",)] * c
    rows += [(f"noise_{i % 37}",) for i in range(n_noise)]
    if not rows:
        return
    items = spark.createDataFrame(rows, "tok string").repartition(5)
    n = len(rows)
    counts: dict[str, int] = {}
    for (t,) in rows:
        counts[t] = counts.get(t, 0) + 1
    expected = {t: c for t, c in counts.items() if c > n // denom}
    got = {
        r["tok"]: r["n"]
        for r in heavy_hitters_exact(
            items, "tok", k=k, min_share_denom=denom
        ).collect()
    }
    assert got == expected

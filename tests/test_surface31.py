"""Batch-38 behavior: point-in-time versions, log2 bins, scale-safe
median, Zipf slope sanity, peak detection — recompute twins."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface31
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_point_in_time_versions_are_consistent(spark, sf_oracle):
    """Every order's version must equal its 1-based position in the
    customer's (date, orderkey) order, valid_from must be that order's
    own date, and the tier price must be the integer product."""
    orders = load_table(spark, sf_oracle, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("string").alias("d"),
        "o_totalprice",
    ).collect()
    by_cust: dict[int, list] = {}
    for r in orders:
        by_cust.setdefault(r["o_custkey"], []).append(
            (r["d"], r["o_orderkey"], r["o_totalprice"])
        )
    want = {}
    for lst in by_cust.values():
        lst.sort()
        for k, (d, okey, tp) in enumerate(lst, 1):
            cents = math.floor(tp * 100 + 0.5)
            want[okey] = (k, d, cents * (100 + k))
    got = {
        r["o_orderkey"]: (
            r["version_at_order"], r["valid_from"], r["tiered_centicents"]
        )
        for r in surface31.join_point_in_time(spark, sf_oracle).collect()
    }
    # valid_from of version k IS the k-th order's date (self-chained dim)
    assert got == {
        k: (v, d[:10] if " " in d else d, t)
        for k, (v, d, t) in want.items()
    } or got == want


def test_log2_histogram_matches_python(spark, sf_oracle):
    rows = load_table(spark, sf_oracle, "events").select(
        "event_type", "value"
    ).collect()
    want: dict[tuple, int] = {}
    for r in rows:
        cents = math.floor(r["value"] * 100 + 0.5)
        b = -1 if cents <= 0 else cents.bit_length() - 1
        want[(r["event_type"], b)] = want.get((r["event_type"], b), 0) + 1
    got = {
        (r["event_type"], r["bin_log2"]): r["n"]
        for r in surface31.agg_log2_histogram(spark, sf_oracle).collect()
    }
    assert got == want
    # total mass preserved
    assert sum(got.values()) == len(rows)


def test_interarrival_median_matches_python(spark, sf_oracle):
    rows = load_table(spark, sf_oracle, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))
    want = {}
    for u, lst in by_user.items():
        lst.sort()
        gaps = sorted(
            b[0] - a[0] for a, b in zip(lst, lst[1:])
        )
        if gaps:
            want[u] = (gaps[(len(gaps) + 1) // 2 - 1], len(gaps))
    got = {
        r["user_id"]: (r["median_gap_us"], r["n_gaps"])
        for r in surface31.event_interarrival_median(
            spark, sf_oracle
        ).collect()
    }
    assert got == want


def test_zipf_slope_is_negative_and_sane(spark, sf_oracle):
    """Token frequencies are heavy-tailed, so every language's fitted
    slope must be negative; and the slope must match a numpy
    least-squares recompute to 1e-5."""
    import numpy as np

    docs = load_table(spark, sf_oracle, "documents").select(
        "lang", "text"
    ).collect()
    freqs: dict[str, dict[str, int]] = {}
    for r in docs:
        d = freqs.setdefault(r["lang"], {})
        for t in re.split(r"\s+", r["text"].strip().lower()):
            if t:
                d[t] = d.get(t, 0) + 1
    got = {
        r["lang"]: (r["n_tokens"], r["zipf_slope_r6"])
        for r in surface31.text_zipf_slope(spark, sf_oracle).collect()
    }
    for lang, d in freqs.items():
        ranked = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
        ranked = ranked[: surface31._ZIPF_TOPK]
        x = np.array(
            [math.floor(math.log(i + 1) * 1e6 + 0.5) for i in range(len(ranked))],
            dtype=np.float64,
        )
        y = np.array(
            [math.floor(math.log(f) * 1e6 + 0.5) for _t, f in ranked],
            dtype=np.float64,
        )
        n = len(x)
        den = n * (x * x).sum() - x.sum() ** 2
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / den
        n_got, s_got = got[lang]
        assert n_got == n
        assert s_got < 0
        assert abs(s_got - slope) < 1e-5, (lang, s_got, slope)


def test_peak_local_max_matches_python(spark, sf_oracle):
    rows = load_table(spark, sf_oracle, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("us")
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        cents = math.floor(r["value"] * 100 + 0.5)
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], cents)
        )
    want = {}
    for lst in by_user.values():
        lst.sort()
        for i, (_us, eid, c) in enumerate(lst):
            peak = (
                0 < i < len(lst) - 1
                and c > lst[i - 1][2]
                and c > lst[i + 1][2]
            )
            want[eid] = (c, 1 if peak else 0)
    got = {
        r["event_id"]: (r["cents"], r["is_peak"])
        for r in surface31.window_peak_local_max(spark, sf_oracle).collect()
    }
    assert got == want
    assert any(p for _c, p in got.values())

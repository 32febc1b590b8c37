"""Batch-75 behavior: autocorrelation term recompute + float range,
coverage-curve monotonicity, silence-trim recompute, holiday busdays
recompute, decimal roundtrip exactness — independent twins."""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface68
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_autocorr_terms_recompute(spark, sf_oracle):
    daily = defaultdict(Counter)
    for r in load_table(spark, sf_oracle, "events").collect():
        if r["ts"] is not None:
            daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n_pairs"], r["num"], r["den1"], r["den2"], r["direction"])
        for r in surface68.event_autocorr_lag1(spark, sf_oracle).collect()
    }
    for t, cnts in daily.items():
        series = [cnts[d] for d in sorted(cnts)]
        xs, ys = series[:-1], series[1:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
        num = n * sxy - sx * sy
        den1, den2 = n * sxx - sx * sx, n * syy - sy * sy
        want_dir = 1 if num > 0 else (-1 if num < 0 else 0)
        assert got[t] == (n, num, den1, den2, want_dir)
        # the float r these terms imply is a valid correlation
        if den1 > 0 and den2 > 0:
            r = num / math.sqrt(den1 * den2)
            assert -1.0 <= r <= 1.0


def test_coverage_curve_monotone_and_exact(spark, sf_oracle):
    cnt = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        cnt.update(t for t in re.split(r"\s+", r["text"].strip().lower()) if t)
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    got = {
        r["k"]: (r["covered_tokens"], r["covered_types"], r["total_tokens"],
                 r["coverage_ppm"])
        for r in surface68.text_vocab_coverage_curve(spark, sf_oracle).collect()
    }
    prev = 0
    for k in (10, 100, 1000):
        covered = sum(c for _, c in ordered[:k])
        types = min(k, len(ordered))
        assert got[k] == (covered, types, total, covered * 1000000 // total)
        assert covered >= prev
        prev = covered


def test_silence_trim_recompute(spark, sf_oracle):
    th = 4096
    want = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        n = nb % 441 + 100
        s = [((raw[j % nb] - 128) * 256 if nb else 0) for j in range(n)]
        voiced = [j for j, v in enumerate(s) if abs(v) >= th]
        if not voiced:
            lead, trail, kept, allsil = n, 0, 0, 1
        else:
            lead = voiced[0]
            trail = n - 1 - voiced[-1]
            kept = n - lead - trail
            allsil = 0
        a = want[r["source"]]
        a[0] += n
        a[1] += lead
        a[2] += trail
        a[3] += kept
        a[4] += allsil
    got = {
        r["source"]: (r["n_samples"], r["n_lead"], r["n_trail"], r["n_kept"],
                      r["n_all_silent"])
        for r in surface68.multimodal_audio_silence_trim(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    for n, lead, trail, kept, _ in got.values():
        assert lead + trail + kept == n


def test_holiday_busdays_recompute(spark, sf_oracle):
    hols = {
        dt.date(y, m, d)
        for y in range(1995, 2002)
        for m, d in ((1, 1), (7, 4), (12, 25))
    }
    want = Counter()
    for r in load_table(spark, sf_oracle, "orders").collect():
        start = r["o_orderdate"]
        start = start.date() if hasattr(start, "date") else start
        bus = 0
        for off in range(31):
            d = start + dt.timedelta(days=off)
            if d.weekday() < 5 and d not in hols:
                bus += 1
        want[bus] += 1
    got = {
        r["busdays"]: r["n_orders"]
        for r in surface68.date_business_days_holiday_aware(
            spark, sf_oracle
        ).collect()
    }
    assert got == dict(want)


def test_decimal_roundtrip_exact(spark, sf_oracle):
    import glob
    import pyarrow.parquet as pq

    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        c = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        want[r["o_orderstatus"]][0] += 1
        want[r["o_orderstatus"]][1] += c
    got = {
        r["status"]: (r["n_orders"], r["total_cents"])
        for r in surface68.scan_parquet_decimal_exact(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # the staged files genuinely carry a decimal logical type
    path = surface68._staged_decimal_orders(spark, sf_oracle)
    f = glob.glob(f"{path}/*.parquet")[0]
    typ = pq.read_schema(f).field("price").type
    assert str(typ).startswith("decimal128(12, 2)")

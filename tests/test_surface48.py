"""Batch-55 behavior: SimHash Hamming vs brute-force popcount scan
(band recall law), seasonal-naive forecast recompute, printf format
law, lag-offset defaults, path-to-purchase ordering — recompute
twins."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from historic_score_etl_pipeline_spark.contract import surface48
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _py_simhash(text: str) -> int:
    toks = text.strip().lower().split()
    n = len(toks)
    sh = {
        " ".join(toks[i : i + 2]) for i in range(max(n - 1, 1))
    }
    votes = [0] * 16
    for s in sh:
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        for b in range(16):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(16) if votes[b] > 0)


def test_simhash_hamming_matches_bruteforce(spark, sf_oracle):
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "text")
        .collect()
    )
    sigs = {r["doc_id"]: _py_simhash(r["text"]) for r in docs}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d > 3:
                continue
            # band blocking: distance ≤ 3 over 4 bands ⟹ ≥ 1 band equal
            # (pigeonhole), so EVERY such pair must be a candidate
            shares = any(
                (sigs[a] >> (4 * k)) & 15 == (sigs[b] >> (4 * k)) & 15
                for k in range(4)
            )
            assert shares, (a, b)
            want[(a, b)] = d
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in surface48.dedup_simhash_hamming(spark, sf_oracle).collect()
    }
    assert got == want
    assert got  # the fixture produces real near-pairs


def test_forecast_matches_dow_means(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL")
        .selectExpr("CAST(ts AS DATE) AS day")
        .collect()
    )
    daily: dict[dt.date, int] = {}
    for r in rows:
        daily[r["day"]] = daily.get(r["day"], 0) + 1
    mx = max(daily)
    hist: dict[int, list[int]] = {}
    for d, n in daily.items():
        if (mx - d).days >= 7:
            hist.setdefault(d.weekday(), []).append(n)
    got = {
        r["day"]: (r["dow_monday0"], r["actual"], r["forecast"], r["abs_err"])
        for r in surface48.event_forecast_dow_naive(spark, sf_oracle).collect()
    }
    last_week = {d: n for d, n in daily.items() if (mx - d).days < 7}
    assert len(got) == len(last_week) == 7
    for d, n in last_week.items():
        f = sum(hist[d.weekday()]) // len(hist[d.weekday()])
        assert got[d.strftime("%Y-%m-%d")] == (
            d.weekday(),
            n,
            f,
            abs(n - f),
        )


def test_printf_matches_python_format(spark, sf_oracle):
    got = {
        r["o_orderkey"]: (r["invoice_line"], r["line_len"])
        for r in surface48.str_printf_render(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    )
    assert len(got) == len(rows) > 0
    for r in rows:
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        line = f"INV-{r['o_orderkey']:09d} [{r['o_orderstatus']}] {cents:015d} cents"
        assert got[r["o_orderkey"]] == (line, len(line))


def test_lag_offset_defaults(spark, sf_oracle):
    out = surface48.window_lag_offset_default(spark, sf_oracle).collect()
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND value IS NOT NULL")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], math.floor(r["value"] * 100 + 0.5))
        )
    got = {r["event_id"]: (r["cents"], r["lag3"], r["lead3"]) for r in out}
    for _u, lst in by_user.items():
        lst.sort()
        for i, (_ts, eid, c) in enumerate(lst):
            lag3 = lst[i - 3][2] if i >= 3 else -1
            lead3 = lst[i + 3][2] if i + 3 < len(lst) else -1
            assert got[eid] == (c, lag3, lead3), eid


def test_path_to_purchase_ordering(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where(
            "user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL"
        )
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    want = {}
    for u, lst in by_user.items():
        lst.sort()
        purchases = [(ts, eid) for ts, eid, t in lst if t == "purchase"]
        if not purchases:
            continue
        p = min(purchases)
        before = [t for ts, eid, t in lst if (ts, eid) < p]
        if before:
            want[u] = (len(before), len(set(before)))
    got = {
        r["user_id"]: (r["n_before"], r["n_types_before"])
        for r in surface48.event_path_to_purchase(spark, sf_oracle).collect()
    }
    assert got == want

"""Batch-97 behavior: chunk-dedup recompute, fold recompute, FX
conversion exactness, recovery-time recompute, loudest-window
recompute — independent twins."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface90
from historic_score_etl_pipeline_spark.sources.catalog import load_table

_EPOCH = dt.date(1970, 1, 1)


def test_chunk_dedup_recompute(spark, sf_oracle):
    per_h = defaultdict(lambda: [set(), 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        ws = (r["text"] or "").split()
        for i in range(0, max(len(ws), 1), 8):
            win = ws[i : i + 16]
            if len(win) == 16:
                h = hashlib.md5(" ".join(win).encode()).hexdigest()
                per_h[h][0].add(r["doc_id"])
                per_h[h][1] += 1
    want = defaultdict(lambda: [0, 0])
    for docs, occ in per_h.values():
        a = want[len(docs)]
        a[0] += 1
        a[1] += occ
    got = {
        r["docs_sharing"]: (r["n_windows"], r["n_occurrences"])
        for r in surface90.dedup_chunk_exact(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # cross-document duplication genuinely exists at sf0.01
    assert any(k >= 2 for k in got)


def test_folds_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, set()])
    for r in load_table(spark, sf_oracle, "events").collect():
        dom = r["ts"].day
        for f in (10, 15, 20, 25):
            if dom <= f:
                side = "train"
            elif dom <= f + 5:
                side = "test"
            else:
                continue
            a = want[(f, side)]
            a[0] += 1
            a[1].add(r["user_id"])
    got = {
        (r["fold"], r["side"]): (r["n_events"], r["n_users"])
        for r in surface90.sample_rolling_origin_folds(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: (a[0], len(a[1])) for k, a in want.items()}
    # train grows with the origin
    trains = [got[(f, "train")][0] for f in (10, 15, 20, 25)]
    assert trains == sorted(trains)


def test_fx_conversion_exact(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        rate = 1_000_000 + ((d - _EPOCH).days % 37) * 1000
        a = want[f"{d.year:04d}-{d.month:02d}"]
        a[0] += 1
        a[1] += cents
        a[2] += cents * rate // 1_000_000
    got = {
        r["ym"]: (r["n"], r["base_cents"], r["converted_cents"])
        for r in surface90.join_fx_conversion_daily(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # rates are >= 1.0: converted >= base per month
    for _, base, conv in got.values():
        assert conv >= base


def test_recovery_time_recompute(spark, sf_oracle):
    series = defaultdict(list)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_suppkey"] < 10:
            d = r["l_shipdate"]
            d = d.date() if hasattr(d, "date") else d
            series[r["l_suppkey"]].append(
                (d, r["l_orderkey"], r["l_linenumber"],
                 int(math.floor(r["l_extendedprice"] * 100 + 0.5)))
            )
    want = {}
    for sk, rows in series.items():
        rows.sort()
        peak = None
        best = None  # (-dd, i)
        info = None
        for i, (d, _, _, c) in enumerate(rows, start=1):
            peak = c if peak is None else max(peak, c)
            dd = peak - c
            if best is None or (-dd, i) < best:
                best = (-dd, i)
                info = (i, d, peak, dd)
        ti, td, tp, mdd = info
        rec = None
        for i, (d, _, _, c) in enumerate(rows, start=1):
            if i > ti and c >= tp:
                rec = (d - td).days
                break
        want[sk] = (mdd, ti, rec)
    got = {
        r["l_suppkey"]: (r["max_drawdown"], r["trough_pos"],
                         r["recovery_days"])
        for r in surface90.window_recovery_time_days(
            spark, sf_oracle
        ).collect()
    }
    assert got == want


def test_loudest_window_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        n = nb % 441 + 100
        s = [abs(((raw[j % nb] - 128) * 256 if nb else 0)) for j in range(n)]
        best = -1
        pos = 0
        run = 0
        for j in range(n):
            run += s[j]
            if j >= 100:
                run -= s[j - 100]
            if run > best:
                best = run
                pos = j
        a = want[r["source"]]
        a[0] += 1
        a[1] = max(a[1], best)
        a[2] += pos
    got = {
        r["source"]: (r["n_clips"], r["max_energy"], r["sum_peak_pos"])
        for r in surface90.multimodal_audio_loudest_window(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}

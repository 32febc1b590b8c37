"""Batch-62 behavior: fixed-width losslessness, nth-weekday calendar
law, phonetic squeeze, multi-measure melt shape, weighted-mean
recompute — independent python twins."""

from __future__ import annotations

import calendar
import datetime as dt
import math
import re
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface55
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_fixed_width_roundtrip(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = (r["o_orderstatus"], r["o_orderpriority"])
        want[k][0] += 1
        want[k][1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
        want[k][2] = max(want[k][2], r["o_custkey"])
    got = {
        (r["status"], r["priority"]): (r["n"], r["sum_cents"], r["max_cust"])
        for r in surface55.scan_fixed_width_file(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_nth_weekday_is_third_friday(spark, sf_oracle):
    rows = surface55.date_nth_weekday_of_month(spark, sf_oracle).collect()
    orders_by_day = defaultdict(int)
    months = set()
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"].date()
        orders_by_day[d] += 1
        months.add((d.year, d.month))
    assert len(rows) == len(months)
    for r in rows:
        d = dt.date.fromisoformat(r["third_friday"])
        assert d.weekday() == 4  # Friday
        assert 15 <= d.day <= 21  # the third one
        assert r["month"] == d.strftime("%Y-%m")
        # cross-check with calendar.monthcalendar
        fridays = [
            wk[4] for wk in calendar.monthcalendar(d.year, d.month) if wk[4]
        ]
        assert d.day == fridays[2]
        assert r["n_orders_that_day"] == orders_by_day.get(d, 0)


def _squeeze(s: str) -> str:
    out = []
    for c in s:
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def test_phonetic_key_matches_python(spark, sf_oracle):
    want_groups = defaultdict(set)
    for r in load_table(spark, sf_oracle, "part").collect():
        word = re.split(r"\s+", r["p_name"])[1].lower()
        key = word[0] + _squeeze(re.sub(r"[aeiouy]", "", word[1:]))
        want_groups[key].add(word)
    got = {
        r["pkey"]: (r["n_words"], r["words"])
        for r in surface55.str_phonetic_key(spark, sf_oracle).collect()
    }
    assert {k: v[1] for k, v in got.items()} == {
        k: ",".join(sorted(ws)) for k, ws in want_groups.items()
    }
    # blocking actually groups: some key covers >1 distinct word OR the
    # skeleton is shorter than the word (vowel drop happened)
    assert any(len(k) < len(next(iter(ws))) + 0 for k, ws in want_groups.items())


def test_multi_measure_melt_shape(spark, sf_oracle):
    df = surface55.unpivot_multi_measure(spark, sf_oracle)
    rows = df.collect()
    groups = {(r["l_returnflag"], r["l_linestatus"]) for r in rows}
    # exactly 2 metric rows per group
    assert len(rows) == 2 * len(groups)
    per = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        k = (r["l_returnflag"], r["l_linestatus"])
        q = int(r["l_quantity"])
        per[k][0] += q
        per[k][1] = max(per[k][1], q)
    for r in rows:
        if r["metric"] == "qty":
            k = (r["l_returnflag"], r["l_linestatus"])
            assert (r["m_sum"], r["m_max"]) == tuple(per[k])


def test_weighted_mean_recompute(spark, sf_oracle):
    acc = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        w = int(math.floor(r["l_extendedprice"] * 100 + 0.5))
        x = int(math.floor(r["l_discount"] * 1e6 + 0.5))
        acc[r["l_returnflag"]][0] += w
        acc[r["l_returnflag"]][1] += w * x
    got = {
        r["l_returnflag"]: (r["sum_w"], r["sum_wx"], r["wmean_disc_micros"])
        for r in surface55.agg_weighted_mean(spark, sf_oracle).collect()
    }
    assert got == {
        f: (sw, swx, swx // sw) for f, (sw, swx) in acc.items()
    }

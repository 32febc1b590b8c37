"""Batch-67 behavior: leakage law (dup groups never straddle), YoY
month alignment, reconciliation identity, stopword DF recompute,
min-max range law — independent twins."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface60
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_split_never_straddles_dup_groups(spark, sf_oracle):
    rows = surface60.sample_split_leakage_safe(spark, sf_oracle).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents").collect()
    }
    split_by_doc = {r["doc_id"]: (r["rep_id"], r["split"]) for r in rows}
    by_text = defaultdict(list)
    for did, text in docs.items():
        by_text[text[:40]].append(did)
    n_groups_multi = 0
    for text, ids in by_text.items():
        splits = {split_by_doc[d][1] for d in ids}
        reps = {split_by_doc[d][0] for d in ids}
        assert len(splits) == 1  # the leakage law
        assert reps == {min(ids)}
        if len(ids) > 1:
            n_groups_multi += 1
        b = int(hashlib.md5(str(min(ids)).encode()).hexdigest()[:15], 16) % 10
        assert splits == {"test" if b < 2 else "train"}
    assert n_groups_multi > 0  # the fixture has real duplicate groups
    n_test = sum(1 for r in rows if r["split"] == "test")
    assert 0 < n_test < len(rows)


def test_yoy_delta_recompute(spark, sf_oracle):
    monthly = defaultdict(int)
    for r in load_table(spark, sf_oracle, "orders").collect():
        m = r["o_orderdate"].strftime("%Y-%m")
        monthly[m] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    months = sorted(monthly)
    want = {}
    for i, m in enumerate(months):
        if i >= 12 and months[i - 12][5:7] == m[5:7]:
            prev = monthly[months[i - 12]]
            want[m] = (
                monthly[m], prev, monthly[m] - prev,
                (monthly[m] - prev) * 1000 // prev
                if (monthly[m] - prev) >= 0 or True
                else None,
            )
    # integer div toward zero for negatives: recompute like the engines
    def div_tz(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q
    want = {
        m: (c, p, c - p, div_tz((c - p) * 1000, p))
        for m, (c, p, _, _) in want.items()
    }
    got = {
        r["month"]: (r["cents"], r["cents_prev"], r["delta_cents"], r["yoy_milli"])
        for r in surface60.agg_month_yoy_delta(spark, sf_oracle).collect()
    }
    assert got == want
    assert len(got) > 0


def test_reconcile_identity(spark, sf_oracle):
    rows = surface60.join_full_outer_reconcile(spark, sf_oracle).collect()
    header = defaultdict(int)
    lines = defaultdict(int)
    orders = {}
    for r in load_table(spark, sf_oracle, "orders").collect():
        header[r["o_orderstatus"]] += int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
        orders[r["o_orderkey"]] = r["o_orderstatus"]
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        lines[orders[r["l_orderkey"]]] += int(
            math.floor(r["l_extendedprice"] * 100 + 0.5)
        )
    got = {
        r["status"]: (
            r["in_header"], r["in_lines"], r["header_cents"],
            r["line_cents"], r["diff_cents"],
        )
        for r in rows
    }
    for st in set(header) | set(lines):
        h, l = header.get(st, 0), lines.get(st, 0)
        assert got[st] == (st in header, st in lines, h, l, l - h)


def test_stopword_df_recompute(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents").collect()
    import re

    df = defaultdict(int)
    for r in docs:
        for w in {t for t in re.split(r"\s+", r["text"].strip()) if t}:
            df[w] += 1
    n = len(docs)
    ranked = sorted(
        ((c * 1000000 // n, w, c) for w, c in df.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [
        (r["df_ppm"], r["w"], r["df"], r["is_stopword_cand"])
        for r in surface60.text_stopword_discovery(spark, sf_oracle).collect()
    ]
    assert [(p, w, c) for p, w, c, _ in got] == ranked
    for p, w, c, flag in got:
        assert flag == (c * 2 > n)
    assert any(flag for *_, flag in got)  # the fixture has stopwords


def test_minmax_scale_range_law(spark, sf_oracle):
    rows = surface60.window_minmax_scale(spark, sf_oracle).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append((r["cents"], r["scaled_ppm"]))
    for ty, vals in by_type.items():
        cents = [c for c, _ in vals]
        mn, mx = min(cents), max(cents)
        for c, s in vals:
            assert s == ((c - mn) * 1000000 // (mx - mn) if mx > mn else 0)
        scaled = [s for _, s in vals]
        assert min(scaled) == 0 and max(scaled) == 1000000

"""Batch-87 behavior: zip member recompute, burstiness terms, try_*
NULL law, first-purchase rank recompute, profile recompute —
independent twins."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface80
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_zip_members_recompute(spark, sf_oracle):
    import zipfile

    path = surface80._staged_zip_archive(spark, sf_oracle)
    with zipfile.ZipFile(f"{path}/orders_bundle.zip") as zf:
        assert sorted(zf.namelist()) == ["part0.csv", "part1.csv",
                                         "part2.csv"]
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        m = f"part{r['o_orderkey'] % 3}.csv"
        a = want[(m, r["o_orderstatus"])]
        a[0] += 1
        a[1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        (r["member"], r["status"]): (r["n"], r["total_cents"])
        for r in surface80.scan_zip_archive_members(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_burstiness_terms_recompute(spark, sf_oracle):
    per_doc = Counter()
    n_docs = 0
    for r in load_table(spark, sf_oracle, "documents").collect():
        n_docs += 1
        for w in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()):
            if w:
                per_doc[(r["doc_id"], w)] += 1
    totals = Counter()
    for (_, w), x in per_doc.items():
        totals[w] += x
    top = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = {
        r["w"]: (r["doc_freq"], r["sum_x"], r["sum_x2"], r["d_total"],
                 r["bursty_sign"])
        for r in surface80.text_word_burstiness(spark, sf_oracle).collect()
    }
    assert set(got) == {w for w, _ in top}
    for w, _ in top:
        xs = [x for (_, ww), x in per_doc.items() if ww == w]
        sx, sx2 = sum(xs), sum(x * x for x in xs)
        num = n_docs * sx2 - sx * sx
        den = (n_docs - 1) * sx
        sign = 1 if num > den else (-1 if num < den else 0)
        assert got[w] == (len(xs), sx, sx2, n_docs, sign)
        # sanity: the sign matches the float sample-VMR comparison
        mean = sx / n_docs
        var = (sx2 - n_docs * mean * mean) / (n_docs - 1)
        assert sign == (1 if var / mean > 1 else (-1 if var / mean < 1
                                                  else 0))


def test_try_null_law(spark, sf_oracle):
    got = {
        r["status"]: (r["n"], r["n_div_null"], r["sum_div_floor"],
                      r["n_mul_overflow"], r["n_add_overflow"],
                      r["sum_elements"])
        for r in surface80.sql_try_arithmetic_nulls(
            spark, sf_oracle
        ).collect()
    }
    want = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        a = want[r["o_orderstatus"]]
        a[0] += 1
        if k % 7 == 0:
            a[1] += 1
        else:
            a[2] += math.floor(cents / (k % 7))
        if cents > 9223372036854775807 // 9_000_000_000_000_000:
            a[3] += 1
        if k % 3 > 0:
            a[4] += 1
        a[5] += {0: 10, 1: 20, 2: 30}.get(k % 5, 0)
    assert got == {k: tuple(v) for k, v in want.items()}


def test_first_purchase_rank_recompute(spark, sf_oracle):
    seqs = defaultdict(list)
    for r in load_table(spark, sf_oracle, "events").collect():
        seqs[(r["user_id"], r["ts"].date())].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    want = Counter()
    for rows in seqs.values():
        rows.sort()
        pos = 0
        for i, (_, _, t) in enumerate(rows, start=1):
            if t == "purchase":
                pos = i
                break
        want[pos] += 1
    got = {
        r["pos"]: r["n_sessions"]
        for r in surface80.event_first_purchase_rank(
            spark, sf_oracle
        ).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == len(seqs)


def test_column_profile_recompute(spark, sf_oracle):
    rows = load_table(spark, sf_oracle, "orders").collect()
    got = {
        r["column"]: (r["n_rows"], r["n_null"], r["n_distinct"],
                      r["min_str"], r["max_str"])
        for r in surface80.audit_column_profile(spark, sf_oracle).collect()
    }
    assert set(got) == {"o_orderkey", "o_custkey", "o_orderstatus",
                        "o_orderpriority", "o_orderdate"}
    keys = [str(r["o_orderkey"]) for r in rows]
    assert got["o_orderkey"] == (
        len(rows), 0, len(set(keys)), min(keys), max(keys),
    )
    st = [r["o_orderstatus"] for r in rows]
    assert got["o_orderstatus"] == (
        len(rows), 0, len(set(st)), min(st), max(st),
    )
    dates = [str(r["o_orderdate"].date()) for r in rows]
    assert got["o_orderdate"] == (
        len(rows), 0, len(set(dates)), min(dates), max(dates),
    )

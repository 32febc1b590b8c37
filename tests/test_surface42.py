"""Batch-49 behavior: growth ledger vs first/prev-day dict, JS vs
math.log recompute (+ symmetry/bounds), Tukey fences vs sorted
quartiles, balance quota vs md5 ranks, DLQ accounting vs modulus."""

from __future__ import annotations

import hashlib
import math

from historic_score_etl_pipeline_spark.contract import surface42
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_growth_accounting_matches_prev_day_scan(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND user_id IS NOT NULL")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], set()).add(r["day"])
    agg: dict[str, list[int]] = {}
    for _u, days in by_user.items():
        prev = None
        for d in sorted(days):
            if prev is None:
                cls = 0
            elif (d - prev).days <= 7:
                cls = 1
            else:
                cls = 2
            a = agg.setdefault(d.strftime("%Y-%m-%d"), [0, 0, 0, 0])
            a[cls] += 1
            a[3] += 1
            prev = d
    got = {
        r["day"]: (r["n_new"], r["n_retained"], r["n_resurrected"], r["dau"])
        for r in surface42.event_growth_accounting(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # identity: dau decomposes exactly
    for n, ret, res, dau in got.values():
        assert n + ret + res == dau


def test_js_divergence_matches_and_is_bounded(spark, sf_oracle):
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("lang", "text")
        .collect()
    )
    ct: dict[str, dict[str, int]] = {}
    for r in docs:
        d = ct.setdefault(r["lang"], {})
        for t in r["text"].strip().lower().split():
            if t:
                d[t] = d.get(t, 0) + 1
    tot = {lang: sum(d.values()) for lang, d in ct.items()}
    got = {
        (r["la"], r["lb"]): (
            r["tp"], r["tq"], r["kl_p_fp"], r["kl_q_fp"], r["js_r6"]
        )
        for r in surface42.text_js_divergence(spark, sf_oracle).collect()
    }
    langs = sorted(ct)
    assert len(got) == len(langs) * (len(langs) - 1) // 2
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            tp, tq = tot[la], tot[lb]
            sp = sq = 0
            for t in set(ct[la]) | set(ct[lb]):
                cp, cq = ct[la].get(t, 0), ct[lb].get(t, 0)
                den = float(cp) * float(tq) + float(cq) * float(tp)
                if cp > 0:
                    sp += cp * math.floor(
                        math.log(2.0 * cp * tq / den) * 1e6 + 0.5
                    )
                if cq > 0:
                    sq += cq * math.floor(
                        math.log(2.0 * cq * tp / den) * 1e6 + 0.5
                    )
            js = round((sp / tp + sq / tq) / 2e6, 6)
            assert got[(la, lb)] == (tp, tq, sp, sq, js), (la, lb)
            # JS ∈ [0, ln 2] (fixpoint slack ±1 micro-nat per term)
            assert -1e-5 <= js <= math.log(2) + 1e-5


def test_iqr_outliers_match_sorted_quartiles(spark, sf_oracle):
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    lens: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        n = len([t for t in r["text"].strip().lower().split() if t])
        lens.setdefault(r["lang"], []).append((n, r["doc_id"]))
    got = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["q1"], r["q3"], r["is_outlier"])
        for r in surface42.text_length_outliers_iqr(spark, sf_oracle).collect()
    }
    for lang, lst in lens.items():
        lst.sort()
        n = len(lst)
        q1 = lst[(n + 3) // 4 - 1][0]
        q3 = lst[(3 * n + 3) // 4 - 1][0]
        iqr = q3 - q1
        for ln_, did in lst:
            out = 2 * ln_ < 2 * q1 - 3 * iqr or 2 * ln_ > 2 * q3 + 3 * iqr
            assert got[did] == (lang, ln_, q1, q3, out), did


def test_balance_downsample_quota_and_ranks(spark, sf_oracle):
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "lang")
        .collect()
    )
    by_lang: dict[str, list[int]] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    k = min(len(v) for v in by_lang.values())
    want = set()
    for lang, ids in by_lang.items():
        ranked = sorted(
            ids, key=lambda d: (hashlib.md5(f"bal:{d}".encode()).hexdigest(), d)
        )
        for i, d in enumerate(ranked[:k]):
            want.add((d, lang, i + 1))
    got = {
        (r["doc_id"], r["lang"], r["rk"])
        for r in surface42.sample_balance_downsample(spark, sf_oracle).collect()
    }
    assert got == want
    # every class at exactly the minority size
    per_lang: dict[str, int] = {}
    for _d, lang, _rk in got:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    assert set(per_lang.values()) == {k}


def test_permissive_dlq_accounting(spark, sf_oracle):
    rows = surface42.scan_csv_permissive_dlq(spark, sf_oracle).collect()
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in docs:
        a = want.setdefault(r["lang"], [0, 0, 0, 0])
        a[0] += 1
        if r["doc_id"] % 7 == 0:
            a[2] += 1
        else:
            a[1] += 1
            a[3] += r["n_chars"]
    got = {
        r["lang"]: (r["n_rows"], r["n_good"], r["n_dead_letter"], r["sum_nc"])
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert sum(v[2] for v in got.values()) > 0  # poison actually landed

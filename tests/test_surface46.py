"""Batch-53 behavior: LLR vs contingency recompute (+ known-collocation
sanity), quality-gate bits vs python screens, embed fingerprint groups,
upsample quota algebra, wholetext accounting — recompute twins."""

from __future__ import annotations

import hashlib
import math

from historic_score_etl_pipeline_spark.contract import surface46
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _texts(spark, sf):
    return {
        r["doc_id"]: r["text"].strip().lower()
        for r in load_table(spark, sf, "documents")
        .select("doc_id", "text")
        .collect()
    }


def test_llr_matches_contingency_recompute(spark, sf_oracle):
    texts = _texts(spark, sf_oracle)
    pairs = []
    for t in texts.values():
        ws = t.split()
        pairs.extend(zip(ws, ws[1:]))
    from collections import Counter

    big = Counter(pairs)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    nn = len(pairs)
    got = {
        (r["a"], r["b"]): (r["k11"], r["ca"], r["cb"], r["llr_fp"])
        for r in surface46.text_collocation_llr(spark, sf_oracle).collect()
    }
    want = {}
    for (a, b), k11 in big.items():
        if k11 < 5:
            continue
        cells = [
            (k11, ca[a], cb[b]),
            (ca[a] - k11, ca[a], nn - cb[b]),
            (cb[b] - k11, nn - ca[a], cb[b]),
            (nn - ca[a] - cb[b] + k11, nn - ca[a], nn - cb[b]),
        ]
        llr = 2 * sum(
            k * math.floor(math.log(k * nn / (rs * cs)) * 1e6 + 0.5)
            for k, rs, cs in cells
            if k > 0
        )
        want[(a, b)] = (k11, ca[a], cb[b], llr)
    assert got == want
    # LLR is ≥ 0 up to fixpoint slack (each of the 4 terms is weighted
    # by its cell count, so the slack bound is ±0.5 µnat × Σk = nn) and
    # some bigram scores are genuinely positive
    assert any(v[3] > 0 for v in got.values())
    assert all(v[3] >= -2 * nn for v in got.values())


def test_quality_gate_bits_match_python(spark, sf_oracle):
    texts = _texts(spark, sf_oracle)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["tri_ppm"], r["ttr_ppm"], r["dom_ppm"],
            r["reasons_mask"], r["passed"],
        )
        for r in surface46.text_quality_composite_gate(
            spark, sf_oracle
        ).collect()
    }
    from collections import Counter

    for did, t in texts.items():
        if len(t) < 3:
            assert did not in got
            continue
        toks = [x for x in t.split() if x]
        grams = [t[i : i + 3] for i in range(len(t) - 2)]
        n = len(toks)
        tri = len(set(grams)) * 1_000_000 // len(grams)
        ttr = len(set(toks)) * 1_000_000 // n
        dom = max(Counter(toks).values()) * 1_000_000 // n
        mask = (
            (1 if n < 10 or n > 200 else 0)
            + (2 if tri < 300_000 else 0)
            + (4 if ttr < 200_000 else 0)
            + (8 if dom > 200_000 else 0)
        )
        assert got[did] == (n, tri, ttr, dom, mask, mask == 0), did


def test_embed_exact_groups(spark, sf_oracle):
    rows = load_table(spark, sf_oracle, "embeddings").collect()
    fp: dict[str, list[int]] = {}
    for r in rows:
        csv = ",".join(
            str(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]
        )
        fp.setdefault(hashlib.md5(csv.encode()).hexdigest(), []).append(
            r["vec_id"]
        )
    got = {
        r["vfp"]: (r["group_size"], r["rep_vec"])
        for r in surface46.dedup_embed_exact(spark, sf_oracle).collect()
    }
    assert got == {k: (len(v), min(v)) for k, v in fp.items()}


def test_upsample_quota_sums_to_target(spark, sf_oracle):
    rows = surface46.sample_balance_upsample(spark, sf_oracle).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    target = max(len(v) for v in by_lang.values())
    for lang, lst in by_lang.items():
        n = len(lst)
        assert sum(r["n_copies"] for r in lst) == target, lang
        # copies differ by at most one, the +1s go to the lowest ranks
        lo, hi = target // n, target // n + (1 if target % n else 0)
        for r in lst:
            want = lo + (1 if r["rk"] <= target % n else 0)
            assert r["n_copies"] == want and lo <= r["n_copies"] <= max(hi, lo)


def test_wholefile_accounting(spark, sf_oracle):
    got = {
        r["lang"]: (r["n_lines"], r["n_chars_total"])
        for r in surface46.scan_text_wholefile(spark, sf_oracle).collect()
    }
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("lang", "text")
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in docs:
        a = want.setdefault(r["lang"], [0, 0])
        a[0] += 1
        a[1] += len(r["text"])
    assert got == {
        lang: (n, chars + n - 1) for lang, (n, chars) in want.items()
    }

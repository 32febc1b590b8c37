"""Batch-42 behavior: base64 vs python codec, initcap vs str.title-ish
per-token recompute, translate vs str.translate, fixed-width roundtrip
arithmetic, NOT IN three-valued logic — recompute twins."""

from __future__ import annotations

import base64
import math

from historic_score_etl_pipeline_spark.contract import surface35
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_base64_matches_python_codec(spark, sf_oracle):
    got = {
        r["o_orderkey"]: (r["b64"], r["b64_len"], r["roundtrip_ok"])
        for r in surface35.str_base64_roundtrip(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "orders")
        .select("o_orderkey", "o_orderpriority")
        .collect()
    )
    assert len(got) == len(rows) > 0
    for r in rows:
        rec = f"{r['o_orderkey']}|{r['o_orderpriority']}"
        want = base64.b64encode(rec.encode()).decode()
        assert got[r["o_orderkey"]] == (want, len(want), True)


def test_initcap_matches_per_token_ucfirst(spark, sf_oracle):
    got = {
        r["doc_id"]: (r["title"], r["title_len"])
        for r in surface35.str_initcap_title(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "text")
        .collect()
    )
    assert len(got) == len(rows) > 0
    for r in rows:
        toks = r["text"].strip().split()[:6]
        want = " ".join(t[:1].upper() + t[1:].lower() for t in toks)
        assert got[r["doc_id"]] == (want, len(want))


def test_translate_matches_str_translate(spark, sf_oracle):
    got = {
        r["p_partkey"]: (r["subbed"], r["n_vowels"])
        for r in surface35.str_translate_sub(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "part")
        .select("p_partkey", "p_name")
        .collect()
    )
    assert len(got) == len(rows) > 0
    tbl = str.maketrans("aeiou", "01234")
    for r in rows:
        want_sub = r["p_name"].translate(tbl)
        want_nv = sum(r["p_name"].count(v) for v in "aeiou")
        assert got[r["p_partkey"]] == (want_sub, want_nv)


def test_fixed_width_roundtrip_all_ok(spark, sf_oracle):
    rows = surface35.str_pad_fixed_width(spark, sf_oracle).collect()
    parts = {
        r["p_partkey"]: r
        for r in load_table(spark, sf_oracle, "part").collect()
    }
    assert len(rows) == len(parts) > 0
    for r in rows:
        p = parts[r["p_partkey"]]
        cents = math.floor(p["p_retailprice"] * 100 + 0.5)
        assert r["roundtrip_ok"] is True
        assert r["parsed_size"] == p["p_size"]
        assert r["parsed_cents"] == cents
        assert len(r["record"]) == max(len(p["p_name"]), 30) + 4 + 12


def test_not_in_null_semantics_relationships(spark, sf_oracle):
    """The NULL in the NOT IN list forces n_not_in = 0 regardless of
    data; NOT EXISTS counts the real complement of IN; recompute the
    IN side directly."""
    row = surface35.sql_not_in_null_semantics(spark, sf_oracle).collect()[0]
    assert row["n_not_in"] == 0
    assert row["n_in"] + row["n_not_exists"] == row["n_total"]
    custs = {
        r["c_custkey"]
        for r in load_table(spark, sf_oracle, "customer").collect()
    }
    hot = {
        r["o_custkey"]
        for r in load_table(spark, sf_oracle, "orders")
        .where("o_orderpriority LIKE '1%'")
        .collect()
    }
    assert row["n_in"] == len(custs & hot)
    assert row["n_total"] == len(custs)

"""Batch-33 behavior: boolean aggregates, EXISTS/FORALL HOFs, and
arrays_zip — recompute twins plus the shuffle-free plan pins."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface26
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _exchanges(df) -> int:
    """Count Exchange nodes — call BEFORE any action on df: after
    execution AQE's formatted explain prints Final AND Initial plans,
    double-counting every node."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(re.findall(r"\(\d+\) Exchange", buf.getvalue()))


def test_bool_aggregates_match_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select("user_id", "event_type", "value").collect()
    expected: dict[int, list] = {}
    for r in rows:
        a = expected.setdefault(r["user_id"], [True, False, False])
        a[0] = a[0] and r["value"] > 0
        a[1] = a[1] or r["event_type"] == "error"
        a[2] = a[2] or r["value"] > 90
    df = surface26.agg_bool_every_any(spark, sf_oracle)
    assert _exchanges(df) == 1  # one map-side-combined shuffle
    got = {
        r["user_id"]: [bool(r["all_positive"]), bool(r["any_error"]), bool(r["any_big"])]
        for r in df.collect()
    }
    assert got == expected


def test_exists_forall_match_python_and_shuffle_budget(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select("lang", "text").collect()
    expected: dict[str, list] = {}
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t]
        a = expected.setdefault(r["lang"], [0, 0, 0, 0])
        a[0] += any(len(t) > 6 for t in toks)
        a[1] += all(len(t) < 12 for t in toks)
        a[2] += any(t == "data" for t in toks)
        a[3] += 1
    df = surface26.hof_exists_forall(spark, sf_oracle)
    assert _exchanges(df) == 1
    got = {
        r["lang"]: [r["n_has_long"], r["n_all_short"], r["n_has_data"], r["n_docs"]]
        for r in df.collect()
    }
    assert got == expected


def test_arrays_zip_positional_alignment(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select("text").collect()
    expected: dict[int, list] = {}
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t][: surface26._ZIP_PREFIX]
        for pos, tok in enumerate(toks):
            a = expected.setdefault(pos, [0, 0, None])
            a[0] += 1
            a[1] += len(tok)
            a[2] = tok if a[2] is None else min(a[2], tok)
    got = {
        r["pos"]: [r["n_docs"], r["len_mass"], r["first_tok"]]
        for r in surface26.hof_arrays_zip(spark, sf_oracle).collect()
    }
    assert got == expected
    assert set(got) == set(range(surface26._ZIP_PREFIX))

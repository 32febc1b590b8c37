"""The primary gate (SURVEY.md §5.2-1): every contract query hash-matches
its DuckDB oracle at sf0.01, exactly as the driver's t2 check does."""

from __future__ import annotations

import pytest

from historic_score_etl_pipeline_spark import contract
from historic_score_etl_pipeline_spark.testing import compare, duckdb_connection

ALL_QUERIES = sorted(contract.queries())


@pytest.fixture(scope="module")
def oracle_con(sf_oracle):
    return duckdb_connection(sf_oracle)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(name, spark, sf_oracle, oracle_con):
    qs, oracles = contract.queries(), contract.oracle_sql()
    sdf = qs[name](spark, sf_oracle).toPandas()
    if name not in oracles:
        assert len(sdf) > 0, f"{name}: rows-only query returned no rows"
        return
    odf = oracle_con.execute(oracles[name]).df()
    result = compare(name, sdf, odf)
    assert result.ok, result.detail


def test_entry_smoke(spark):
    import __spark_entry__ as entrypoint

    df = entrypoint.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 5


def test_registry_rotation_is_self_maintaining(monkeypatch):
    """Keys verified green by a harness report must yield their
    front-of-registry slot automatically.  Hermetic: the verified set is
    monkeypatched to fixtures so the assertion holds regardless of which
    CORRECTNESS_r*.json files the live repo root carries."""
    import historic_score_etl_pipeline_spark.contract as c

    # Baseline fixture: only the static round-1 set is verified, so the
    # curated head keeps its slots.
    monkeypatch.setattr(
        c, "_verified_from_reports", lambda: frozenset(c._VERIFIED_R01)
    )
    before = list(c._merged())
    head_live = [k for k in c._ROUND_HEAD if k in before]
    assert before[0] == head_live[0]

    # Fixture round-2 report confirms two head keys green — they must
    # retire behind the never-verified block.
    confirmed = {head_live[0], head_live[7]}
    monkeypatch.setattr(
        c,
        "_verified_from_reports",
        lambda: frozenset(set(c._VERIFIED_R01) | confirmed),
    )
    after = list(c._merged())
    for k in confirmed:
        assert k not in after[:45], k
    # registry contents unchanged, only order
    assert sorted(after) == sorted(before)


def test_compare_rejects_hugeint_dtype_drift():
    """A DuckDB HUGEINT column reaches pandas as float64 or object; the
    driver's hash is dtype-sensitive, so the local gate must fail the
    same way even when every value canonicalizes identically."""
    import pandas as pd

    spark_pdf = pd.DataFrame(
        {"k": ["a", "b"], "s": pd.array([1, 2], dtype="int64")}
    )
    as_float = pd.DataFrame({"k": ["a", "b"], "s": [1.0, 2.0]})
    r = compare("hugeint_float", spark_pdf, as_float)
    assert not r.ok and "dtype kind" in r.detail
    as_obj = pd.DataFrame(
        {"k": ["a", "b"], "s": pd.Series([1.5, 2.5], dtype=object)}
    )
    assert not compare("hugeint_obj", spark_pdf, as_obj).ok


def test_compare_rejects_raw_array_output():
    """The driver's canonicalizer sorts with pandas sort_values, which
    crashes on unhashable list cells (CORRECTNESS_r03
    embed_quantize_int8).  The local gate must therefore reject an
    oracle-checked result carrying a raw array/map column even when both
    engines agree value-for-value — the driver would crash, not pass."""
    import pandas as pd

    with_list = pd.DataFrame({"k": ["a", "b"], "codes": [[1, 2], [3]]})
    r = compare("raw_array", with_list, with_list.copy())
    assert not r.ok and "raw list" in r.detail
    with_map = pd.DataFrame({"k": ["a"], "m": [{"x": 1}]})
    r2 = compare("raw_map", with_map, with_map.copy())
    assert not r2.ok and "raw dict" in r2.detail


def test_no_oracled_query_emits_raw_nested_columns(spark, sf_oracle):
    """Registry-wide schema scan: every oracle-checked query must emit
    scalar top-level columns only (the driver-hash contract).  Catches
    the next embed_quantize_int8 at authoring time without running the
    full parity suite."""
    from pyspark.sql import types as T

    qs, oracles = contract.queries(), contract.oracle_sql()
    offenders = []
    for name in oracles:
        schema = qs[name](spark, sf_oracle).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


def test_compare_rejects_live_uncast_duckdb_sum():
    """End-to-end: an oracle written without CAST(sum(...) AS BIGINT)
    must fail compare() against an int64 Spark result."""
    import duckdb
    import pandas as pd

    odf = (
        duckdb.connect()
        .execute(
            "SELECT sum(x) AS s FROM (VALUES (CAST(1 AS INTEGER)), (2)) t(x)"
        )
        .df()
    )
    spark_like = pd.DataFrame({"s": pd.array([3], dtype="int64")})
    assert not compare("live_hugeint", spark_like, odf).ok

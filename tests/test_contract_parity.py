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
    """Keys verified green by a round-2+ harness report must yield their
    front-of-registry slot automatically; with only round-1 reports the
    curated head stays pinned."""
    import historic_score_etl_pipeline_spark.contract as c

    before = list(c._merged())
    assert before[0] == c._ROUND_HEAD[0]

    confirmed = {c._ROUND_HEAD[0], c._ROUND_HEAD[7]}
    orig = c._verified_from_reports
    monkeypatch.setattr(
        c,
        "_verified_from_reports",
        lambda: frozenset(set(orig()) | confirmed),
    )
    after = list(c._merged())
    # confirmed head keys retire past the never-verified block
    for k in confirmed:
        assert after.index(k) > after.index(before[-1]) - len(
            c._VERIFIED_R01
        ) - len(confirmed), k
        assert k not in after[:45]
    # registry contents unchanged, only order
    assert sorted(after) == sorted(before)

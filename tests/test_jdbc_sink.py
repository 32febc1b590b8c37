"""Live JDBC delivery (SURVEY.md §2A-A4): the reference's actual sink is a
SQL database over JDBC-equivalent transport (Postgres via SQLAlchemy,
app/team_utilities.py:341,363-365).  The sandbox has no Postgres, but Spark
ships embedded Apache Derby on its classpath — a real JDBC driver, real SQL
engine, zero network — so ``format("jdbc")`` is exercised end-to-end, not
mocked.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.sinks.writer import jdbc_write

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{os.path.join(str(tmp_path), name)};create=true"


def _read_back(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_jdbc_roundtrip_append(spark, tmp_path, sf_smoke):
    """Write a real contract-shaped frame over JDBC, read it back row-exact."""
    from historic_score_etl_pipeline_spark.sources.catalog import load_table

    url = _derby_url(tmp_path, "roundtrip")
    df = (
        load_table(spark, sf_smoke, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )
    jdbc_write(df, url, "historic_match", driver=DERBY_DRIVER)
    back = _read_back(spark, url, "historic_match")
    assert back.count() == df.count()
    # value-exact: both sides agree row for row
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0


def test_jdbc_append_retry_double_inserts(spark, tmp_path):
    """The reference's retry loop re-runs ``to_sql(append)`` on failure
    (app/team_utilities.py:510-522) — a blind re-run DOUBLE-INSERTS.  The
    JDBC append mode reproduces that hazard faithfully; the engine's
    parquet batch-id writer (retried_write) is the idempotent alternative
    and is asserted in tests/test_sinks.py."""
    url = _derby_url(tmp_path, "retry")
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit("x").alias("v")
    )
    jdbc_write(df, url, "t_retry", driver=DERBY_DRIVER)
    jdbc_write(df, url, "t_retry", driver=DERBY_DRIVER)  # the "retry"
    assert _read_back(spark, url, "t_retry").count() == 200


def test_jdbc_batchsize_option_applies(spark, tmp_path):
    """batchsize is the knob that makes a 100 TB JDBC export viable
    (statement batching instead of row-at-a-time inserts); assert the
    option path accepts it and the write still lands complete."""
    url = _derby_url(tmp_path, "batch")
    df = spark.range(1000).select(F.col("id").alias("k"))
    jdbc_write(df, url, "t_batch", batchsize=37, driver=DERBY_DRIVER)
    assert _read_back(spark, url, "t_batch").count() == 1000


def test_jdbc_overwrite_mode(spark, tmp_path):
    """mode('overwrite') truncates-and-reloads — the DDL-managed reload the
    reference approximates with CREATE TABLE IF NOT EXISTS + append."""
    url = _derby_url(tmp_path, "ow")
    df1 = spark.range(50).select(F.col("id").alias("k"))
    df2 = spark.range(20).select(F.col("id").alias("k"))
    jdbc_write(df1, url, "t_ow", driver=DERBY_DRIVER)
    jdbc_write(df2, url, "t_ow", mode="overwrite", driver=DERBY_DRIVER)
    assert _read_back(spark, url, "t_ow").count() == 20


def test_jdbc_predicate_pushdown_on_read(spark, tmp_path):
    """Reads back through JDBC push the filter into the remote SQL engine
    (PushedFilters on the JDBC relation) — the same contract as parquet
    pushdown, proving sources behind JDBC stay prunable."""
    url = _derby_url(tmp_path, "push")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("bucket")
    )
    jdbc_write(df, url, "t_push", driver=DERBY_DRIVER)
    back = _read_back(spark, url, "t_push").where(F.col("bucket") == 3)
    assert back.count() == 100
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bucket" in plan.split("PushedFilters")[1][:200], plan


def test_jdbc_create_table_column_types_applied(spark, tmp_path):
    """The reference pins its DDL types per column — VARCHARs plus five
    JSONB documents (app/team_utilities.py:345-358).  Spark's twin is the
    ``createTableColumnTypes`` option; prove the plumbing end-to-end on
    Derby with VARCHAR widths (Derby has no JSONB — the Postgres mapping
    swaps JSONB in and adds ``stringtype=unspecified`` to the URL, per
    sinks/writer.py:column_types_ddl)."""
    import json

    from historic_score_etl_pipeline_spark.sinks.writer import column_types_ddl

    url = _derby_url(tmp_path, "ddl")
    df = spark.createDataFrame(
        [("2024-05-01", "home", json.dumps({"w": 3, "l": 1}))],
        "match_date string, hometeam string, home_team_matches string",
    )
    jdbc_write(
        df,
        url,
        "t_ddl",
        column_types={
            "match_date": "VARCHAR(64)",
            "hometeam": "VARCHAR(256)",
            "home_team_matches": "VARCHAR(4000)",
        },
        driver=DERBY_DRIVER,
    )
    back = _read_back(spark, url, "t_ddl")
    assert back.count() == 1
    row = back.collect()[0]
    assert json.loads(row["home_team_matches"]) == {"w": 3, "l": 1}
    # Behavioral proof the declared types were applied: VARCHAR(64) must
    # reject an over-width value, where Spark's Derby default for
    # StringType (CLOB) would happily accept it.
    too_wide = spark.createDataFrame(
        [("x" * 65, "h", "{}")],
        "match_date string, hometeam string, home_team_matches string",
    )
    with pytest.raises(Exception, match="(?i)truncat|too long|22001"):
        jdbc_write(too_wide, url, "t_ddl", driver=DERBY_DRIVER)


def test_historic_match_postgres_ddl_matches_reference():
    """The shipped HISTORIC_MATCH_COLUMN_TYPES must reproduce the
    reference's CREATE TABLE column list and JSONB placement exactly."""
    from historic_score_etl_pipeline_spark.sinks.writer import (
        HISTORIC_MATCH_COLUMN_TYPES,
        column_types_ddl,
    )

    assert list(HISTORIC_MATCH_COLUMN_TYPES) == [
        "date", "hometeam", "awayteam", "match_urls", "home_urls",
        "away_urls", "league", "home_team_matches", "away_team_matches",
        "head2head_matches", "home_team_matchespattern",
        "away_team_matchespattern",
    ]
    jsonb_cols = {
        k for k, v in HISTORIC_MATCH_COLUMN_TYPES.items() if v == "JSONB"
    }
    assert jsonb_cols == {
        "home_team_matches", "away_team_matches", "head2head_matches",
        "home_team_matchespattern", "away_team_matchespattern",
    }
    ddl = column_types_ddl(HISTORIC_MATCH_COLUMN_TYPES)
    assert ddl.startswith("date VARCHAR(64), ") and ddl.endswith(
        "away_team_matchespattern JSONB"
    )

"""Sink gates: idempotent retry (no duplicate-on-retry), error channel."""

from __future__ import annotations

import tempfile

from historic_score_etl_pipeline_spark.sinks.writer import ErrorChannel, retried_write


def test_retried_write_idempotent(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    with tempfile.TemporaryDirectory() as root:
        assert retried_write(df, root, batch_id="b1")
        # a retry of the same batch id replaces — row count unchanged
        # (the reference's to_sql(append)+retry would double to 200,
        # app/ref_utilities.py:206-217)
        assert retried_write(df, root, batch_id="b1")
        assert spark.read.parquet(f"{root}/batch_id=b1").count() == 100
        # a different batch id lands alongside
        assert retried_write(df, root, batch_id="b2")
        assert spark.read.parquet(root).count() == 200


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Date/status-partitioned landing writes prune at read time: the
    reader's partition filter must reach the scan, so a query over one
    partition never lists or reads the rest — the on-disk analog of the
    reference's per-league processing (SURVEY.md §4.1 partition pruning)."""
    import contextlib
    import io

    from historic_score_etl_pipeline_spark.sinks.writer import retried_write
    from historic_score_etl_pipeline_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    assert retried_write(
        orders, str(tmp_path), batch_id="b0", partition_by=["o_orderstatus"]
    )
    back = spark.read.parquet(f"{tmp_path}/batch_id=b0").where(
        F.col("o_orderstatus") == "F"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    import re

    assert "PartitionFilters" in plan
    assert re.search(r"o_orderstatus#\d+ = F", plan), plan
    n_f = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f


def test_error_channel_records_failures(spark):
    df = spark.range(10)
    errors = ErrorChannel()
    ok = retried_write(df, "/proc/definitely/not/writable", "b1", errors=errors, attempts=2)
    assert not ok
    assert len(errors.records) >= 2  # one per attempt + final
    report = errors.report()
    assert "b1" in report and "attempt" in report
    edf = errors.to_df(spark)
    assert edf.count() == len(errors.records)
    assert set(edf.columns) == {"context", "error", "batch_id"}


def test_error_email_matches_reference_shape():
    """Byte-exact parity with the reference's email fold (app/main.py:24-43),
    including the last-item double-newline special case and preserved
    insertion order."""
    from historic_score_etl_pipeline_spark.sinks.writer import (
        format_error_email,
    )

    team = {"La Liga": "timeout", "Serie B": "stale element"}
    ref = {"Eredivisie": "404"}
    subject, body = format_error_email(team, ref, "2023-05-02", "2023-05-03")

    # reference algorithm, reimplemented verbatim from app/main.py:24-36
    expected = "Error Logs for 2023-05-02 and 2023-05-03 Extraction.\n\n"
    expected += "Teams' Match History\n"
    for item in list(team.keys()):
        if item == list(team.keys())[-1]:
            expected += f"{item}: {team[item]}\n\n"
        else:
            expected += f"{item}: {team[item]}\n"
    expected += "Referee's History\n"
    for item in list(ref.keys()):
        if item == list(ref.keys())[-1]:
            expected += f"{item}: {ref[item]}\n\n"
        else:
            expected += f"{item}: {ref[item]}\n"

    assert subject == "Error Logs for 2023-05-02 and 2023-05-03 Extraction."
    assert body == expected


def test_error_email_empty_sections():
    """Empty error dicts: section headers still present, no trailing
    entries, no crash (the reference tolerates empty dicts the same way)."""
    from historic_score_etl_pipeline_spark.sinks.writer import (
        format_error_email,
    )

    _, body = format_error_email({}, {}, "d1", "d2")
    assert "Teams' Match History\nReferee's History\n" in body

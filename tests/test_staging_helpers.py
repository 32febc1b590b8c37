"""Unit tests for the ADVICE-r10 staging fixes: the app-scoped
streaming-sink root (no per-invocation accumulation) and the
applicationId-suffixed JDBC staging table (no cross-app clobber on a
shared server)."""

from __future__ import annotations

import os
import re
import tempfile


def test_app_scoped_stream_root_reuses_one_tree(spark):
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_stream_root,
    )

    r1 = app_scoped_stream_root(spark, "tstroot", "/root/testdata/sf0.001")
    # simulate a prior invocation's leftovers
    with open(os.path.join(r1, "stale.txt"), "w") as f:
        f.write("x")
    r2 = app_scoped_stream_root(spark, "tstroot", "/root/testdata/sf0.001")
    # same path every invocation (keyed by kind + sf tag + applicationId)…
    assert r1 == r2
    # …wiped on entry: the previous invocation's files are gone
    assert os.listdir(r2) == []
    # and scoped under the system temp dir with the app id in the name
    assert r2.startswith(tempfile.gettempdir())
    assert spark.sparkContext.applicationId in os.path.basename(r2)
    # different sf tag → different tree (hostile/adversarial runs use a
    # different source dir and must not clobber the clean run's sink)
    r3 = app_scoped_stream_root(spark, "tstroot", "/root/testdata/sf0.01")
    assert r3 != r2


def test_jdbc_stage_table_scoped_on_server_urls_only(spark):
    from historic_score_etl_pipeline_spark.contract.surface21 import (
        _stage_table,
    )

    # embedded Derby: the database DIRECTORY is already app-scoped, so
    # the plain name stays (and stays oracle-stable)
    assert _stage_table(spark, "jdbc:derby:/tmp/x;create=true") == (
        "orders_stage"
    )
    # server URL: suffixed with the sanitized applicationId so two
    # concurrent apps writing mode=overwrite never clobber each other
    t = _stage_table(spark, "jdbc:postgresql://host/db")
    assert t.startswith("orders_stage_")
    assert re.fullmatch(r"[A-Za-z0-9_]+", t), t
    app = re.sub(r"[^A-Za-z0-9]", "_", spark.sparkContext.applicationId)
    assert t.endswith(app)

"""Batch-47 behavior: dynamic-overwrite partition isolation (static
mode would truncate siblings), gzip TSV byte round-trip, hopping
window membership, log-domain GM recompute, VALUES dim mapping."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface40
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_dynamic_overwrite_touches_only_o_partition(spark, sf_oracle):
    got = {
        r["o_orderstatus"]: (r["n"], r["sum_cents"])
        for r in surface40.sink_dynamic_partition_overwrite(
            spark, sf_oracle
        ).collect()
    }
    base = (
        load_table(spark, sf_oracle, "orders")
        .select(
            "o_orderstatus",
            F.expr(
                "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("cents"),
        )
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in base:
        want.setdefault(r["o_orderstatus"], [0, 0])
        want[r["o_orderstatus"]][0] += 1
        want[r["o_orderstatus"]][1] += r["cents"] + (
            1 if r["o_orderstatus"] == "O" else 0
        )
    assert got == {k: tuple(v) for k, v in want.items()}
    assert set(got) == {"O", "F", "P"}


def test_tsv_gzip_files_are_gzip(spark, sf_oracle):
    import glob
    import gzip

    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    surface40.scan_tsv_gzip(spark, sf_oracle).collect()
    out = app_scoped_dir(spark, "tsvgz", sf_oracle)
    files = glob.glob(f"{out}/*.csv.gz")
    assert files, "staging must produce .csv.gz part files"
    with gzip.open(files[0], "rt") as f:
        header = f.readline().rstrip("\n").split("\t")
    assert header == ["doc_id", "lang", "n_chars", "text"]


def test_hopping_membership_and_totals(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND event_type IS NOT NULL")
        .selectExpr("CAST(ts AS DATE) AS day", "event_type")
        .collect()
    )
    cnt: dict[tuple, int] = {}
    for r in rows:
        for i in (0, 1):
            import datetime as dt

            ws = (r["day"] - dt.timedelta(days=i)).strftime("%Y-%m-%d")
            cnt[(ws, r["event_type"])] = cnt.get((ws, r["event_type"]), 0) + 1
    got = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in surface40.stream_hopping_counts(spark, sf_oracle).collect()
    }
    assert got == cnt
    # every event lands in exactly 2 windows
    assert sum(got.values()) == 2 * len(rows)


def test_geometric_mean_matches_log_recompute(spark, sf_oracle):
    got = {
        r["event_type"]: (r["n"], r["sum_ln_fp"], r["gm_unats"])
        for r in surface40.agg_geometric_mean(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in rows:
        c = math.floor(r["value"] * 100 + 0.5)
        if c > 0:
            by_type.setdefault(r["event_type"], []).append(c)
    for t, cs in by_type.items():
        s = sum(math.floor(math.log(c) * 1e6 + 0.5) for c in cs)
        assert got[t] == (len(cs), s, s // len(cs))
        # the GM lies between min and max (log-domain check)
        lo = math.floor(math.log(min(cs)) * 1e6 + 0.5)
        hi = math.floor(math.log(max(cs)) * 1e6 + 0.5)
        assert lo <= got[t][2] <= hi


def test_values_dim_covers_all_priorities(spark, sf_oracle):
    rows = surface40.join_values_inline_dim(spark, sf_oracle).collect()
    got = {r["urgency"]: (r["prio"], r["n_orders"]) for r in rows}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[5][0] == "1-URGENT" and got[1][0] == "5-LOW"
    n_orders = load_table(spark, sf_oracle, "orders").count()
    assert sum(n for _p, n in got.values()) == n_orders

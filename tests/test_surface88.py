"""Batch-95 behavior: bridge-allocation conservation, INT96 decode
law, sanitizer leak law, migration recompute, border contrast
recompute — independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface88
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_bridge_allocation_conserves(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    total = 0
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        total += cents
        m = k % 3 + 1
        for i, camp in enumerate(range(k % 7, k % 7 + k % 3 + 1)):
            a = want[camp]
            a[0] += 1
            a[1] += cents // m + (cents % m if i == 0 else 0)
    got = {
        r["campaign"]: (r["n_memberships"], r["allocated_cents"])
        for r in surface88.join_bridge_weighted_allocation(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # conservation: allocations sum to the raw cents total
    assert sum(v[1] for v in got.values()) == total


def test_int96_decode_law(spark, sf_oracle):
    import pyarrow.parquet as pq

    import glob

    path = surface88._staged_int96(spark, sf_oracle)
    # the staged files genuinely carry the INT96 physical type
    part = sorted(glob.glob(f"{path}/part-*.parquet"))[0]
    md = pq.ParquetFile(part).metadata
    idx = md.schema.to_arrow_schema().get_field_index("ts")
    assert md.row_group(0).column(idx).physical_type == "INT96"
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        a = want[f"{d.year:04d}-{d.month:02d}"]
        a[0] += 1
        a[1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        r["ym"]: (r["n"], r["total_cents"])
        for r in surface88.scan_parquet_int96_legacy(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_sanitizer_no_leaks(spark, sf_oracle):
    rows = surface88.sink_csv_formula_sanitize(spark, sf_oracle).collect()
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderstatus"]]
        a[0] += 1
        if r["o_orderkey"] % 11 == 0:
            a[1] += 1
    got = {
        r["status"]: (r["n"], r["n_sanitized"], r["n_hostile_leaked"])
        for r in rows
    }
    assert got == {k: (v[0], v[1], 0) for k, v in want.items()}
    # no formula-leading cell survives in the exported file
    import glob

    path = surface88._staged_sanitized_export(spark, sf_oracle)
    for f in glob.glob(f"{path}/*.csv"):
        for line in open(f).read().splitlines()[1:]:
            cell = line.split(",", 1)[1]
            assert not cell.startswith(("=", "+", "-", "@")), cell


def test_band_migration_recompute(spark, sf_oracle):
    per = defaultdict(list)
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        band = "lo" if cents < 10_000_000 else (
            "mid" if cents < 25_000_000 else "hi"
        )
        per[r["o_custkey"]].append((d, r["o_orderkey"], band))
    want = Counter()
    for rows in per.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            want[(a, b)] += 1
    got = {
        (r["from_band"], r["to_band"]): r["n_transitions"]
        for r in surface88.agg_band_migration_matrix(
            spark, sf_oracle
        ).collect()
    }
    assert got == dict(want)


def test_border_contrast_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        w, h = nb % 24 + 8, nb % 16 + 8

        def gray(p):
            if nb == 0:
                return 0
            return (raw[(3 * p) % nb] + raw[(3 * p + 1) % nb]
                    + raw[(3 * p + 2) % nb]) // 3

        bs = is_ = bp = ip = 0
        for p in range(w * h):
            r_, c = p // w, p % w
            g = gray(p)
            if r_ in (0, h - 1) or c in (0, w - 1):
                bp += 1
                bs += g
            else:
                ip += 1
                is_ += g
        a = want[r["source"]]
        a[0] += 1
        a[1] += bp
        a[2] += bs
        a[3] += ip
        a[4] += is_
    got = {
        r["source"]: (r["n_images"], r["border_px"], r["border_sum"],
                      r["interior_px"], r["interior_sum"])
        for r in surface88.multimodal_image_border_contrast(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}

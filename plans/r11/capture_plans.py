#!/usr/bin/env python
"""Capture .explain("formatted") for every headline query (guide §1).

Usage: python plans/r11/capture_plans.py <suffix> [name1,name2,...]
Writes plans/r11/<query>_<suffix>.txt for each headline query plus the
flagship pipeline.  Uses the same staged landing zone as bench.py so the
plan's scan nodes match what the bench actually times.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO_ROOT)

from historic_score_etl_pipeline_spark import contract  # noqa: E402
from historic_score_etl_pipeline_spark.plans.flagship import flagship_pipeline  # noqa: E402
from historic_score_etl_pipeline_spark.session import get_spark  # noqa: E402
from historic_score_etl_pipeline_spark.sources.catalog import stage_landing_zone  # noqa: E402

import bench  # noqa: E402  (for HEADLINE)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    staged = os.path.join(
        tempfile.gettempdir(),
        f"hsep_bench_stage_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    sf_dir = stage_landing_zone(spark, sf_dir, staged)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))

    qs = contract.queries()
    out_dir = os.path.join(REPO_ROOT, "plans", "r11")
    targets = [(n, lambda n=n: qs[n](spark, sf_dir)) for n in names]
    if len(sys.argv) <= 2:
        targets.append(("flagship", lambda: flagship_pipeline(spark, sf_dir)))
    import io
    from contextlib import redirect_stdout

    for name, fn in targets:
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn().explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Capture plans for headline queries (guide §1) — round-12 edition.

Usage: python plans/r12/capture_plans.py <suffix> [name1,name2,...] [--executed]

Writes plans/r12/<query>_<suffix>.txt for each named headline query (all of
them plus the flagship when no names are given).  Each file holds the
pre-execution ``explain("formatted")`` plan; with ``--executed`` the query is
additionally FORCED through the noop sink and the post-AQE executed plan
(``queryExecution().executedPlan()``) is appended — the evidence that
runtime re-optimization (AQE coalescing, broadcast demotion) kept the
claimed shape.  Uses the same staged landing zone and split sizing as
bench.py so scan nodes match what the bench times.

For ITERATIVE operators (pagerank / connected components) whose final plan
is truncated to a 2-node ExistingRDD scan by the per-round checkpoints
(VERDICT r11 "what's wrong" #4), the per-round join plans are captured via
the operators' ``plan_sink`` debug hook and appended to the same file.
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
    args = [a for a in sys.argv[1:] if a != "--executed"]
    executed = "--executed" in sys.argv[1:]
    suffix = args[0] if args else "before"
    names = args[1].split(",") if len(args) > 1 else bench.HEADLINE
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
    out_dir = os.path.join(REPO_ROOT, "plans", "r12")
    targets = [(n, lambda n=n: qs[n](spark, sf_dir)) for n in names]
    if len(args) <= 1:
        targets.append(("flagship", lambda: flagship_pipeline(spark, sf_dir)))
    import io
    from contextlib import redirect_stdout

    from historic_score_etl_pipeline_spark.operators import pins

    pins.CAPTURE_ROUND_PLANS = True
    for name, fn in targets:
        try:
            pins.PLAN_SINK.clear()
            df = fn()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            if pins.PLAN_SINK:
                plan += "\n\n=== per-round plans (iterative operator) ===\n"
                plan += "\n".join(pins.PLAN_SINK)
            if executed:
                df.write.format("noop").mode("overwrite").save()
                plan += "\n\n=== executed plan (post-AQE) ===\n"
                plan += df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()

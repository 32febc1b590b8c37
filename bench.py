#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect).  The headline set covers every heavy physical path:
scan+agg, fact join, window shuffle, nested-doc assembly, LSH dedup,
vector top-k, text featurization, and the flagship pipeline.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from historic_score_etl_pipeline_spark import contract  # noqa: E402
from historic_score_etl_pipeline_spark.plans.flagship import flagship_pipeline  # noqa: E402
from historic_score_etl_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_sum_avg",          # full-scan decimal aggregation (TPC-H Q1 shape)
    "agg_collect_struct",   # shuffle + nested-doc assembly + JSON
    "join_hash_equi",       # fact ⋈ fact join
    "join_multi_hop",       # broadcast dim chain
    "window_topk_recent",   # window shuffle + rank
    "window_running_sum",   # running frame
    "stream_tumbling_daily",  # time bucketing
    "dedup_exact",          # hash-group dedup
    "dedup_near_minhash",   # MinHash+LSH banding
    "sim_topk_cosine",      # brute-force vector top-k
    "text_quality_score",   # text featurization (codegen path)
    "join_asof_lastn",      # as-of join
]


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Local-bench parallelism repair: the sf0.1 files are a few MB, so
    # 128 MB splits would serialize scans onto 1-3 of the 32 cores.  At
    # production scale the default (128 MB, set in session.py) applies.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))

    qs = contract.queries()
    # JVM warmup on a cheap query so the first timed entry isn't penalized
    _force(qs["scan_parquet"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _force(flagship_pipeline(spark, sf_dir))
    timings["flagship"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

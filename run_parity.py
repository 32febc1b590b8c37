#!/usr/bin/env python
"""Dev loop: run the contract parity check locally.

Usage: python run_parity.py [--hostile] [--adversarial] [query ...]
(default: all, at sf0.01)

--hostile runs under a deliberately adversarial session — TIMESTAMP_NTZ
inference on, non-UTC timezone, AQE off, odd shuffle partitioning — the
conditions an external harness session may impose.  Every contract query
must pass BOTH modes (round-8 full sweeps: 527/527 in each; the first
full hostile sweep since the registry grew past 153 keys).

--adversarial runs against a perturbed COPY of sf0.001 with edge-case
rows appended (NULL/empty/newline-terminated text, zero vectors, exact
duplicates, ordering ties, malformed JSON, zero/NULL numerics — see
testing_adversarial.py).  Both engines read the same perturbed parquet,
so any divergence is a real contract fragility, not a data problem.
"""

from __future__ import annotations

import os
import sys

from historic_score_etl_pipeline_spark.testing import run_parity

# override with SPARK_GRAFT_PARITY_SF to cross-check at another scale
# (e.g. sf0.1 — the bench scale) against the same DuckDB oracles
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")


def _hostile_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("parity-hostile")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _adversarial_dir() -> str:
    """Build the perturbed fixture (rebuilt per invocation — ~1 s at
    sf0.001) into a PER-PROCESS temp dir.  A shared path raced exactly
    like the pre-ADVICE-r3 staging dirs: a concurrent run_parity with a
    different SPARK_GRAFT_PARITY_SF would rebuild the fixture mid-sweep
    under the other process's feet (observed: two phantom FAILs in the
    first sf0.1-sourced sweep).  SPARK_GRAFT_PARITY_SF picks the SOURCE
    dir, same as the plain mode; the default is sf0.001 because the
    adversarial axis tests semantics, not scale — the sf0.1 sweep owns
    the scale axis.  The dir is removed at interpreter exit (ADVICE r8:
    repeated sweeps were accumulating perturbed copies in /tmp)."""
    import atexit
    import shutil
    import tempfile

    from historic_score_etl_pipeline_spark.testing_adversarial import (
        build_adversarial_fixture,
    )

    src = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
    dst = tempfile.mkdtemp(prefix="hsep_adversarial_")
    atexit.register(shutil.rmtree, dst, ignore_errors=True)
    return build_adversarial_fixture(src, dst)


def main() -> int:
    args = sys.argv[1:]
    hostile = "--hostile" in args
    adversarial = "--adversarial" in args
    names = [a for a in args if not a.startswith("--")] or None
    sf_dir = _adversarial_dir() if adversarial else SF_DIR
    if hostile:
        spark = _hostile_spark()
    else:
        from historic_score_etl_pipeline_spark.session import get_spark

        spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    results = run_parity(spark, sf_dir, names)
    n_fail = 0
    for r in results:
        print(r)
        n_fail += 0 if r.ok else 1
    mode = " (hostile session)" if hostile else ""
    if adversarial:
        mode += " (adversarial fixture)"
    print(f"\n{len(results) - n_fail}/{len(results)} parity checks passed{mode}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

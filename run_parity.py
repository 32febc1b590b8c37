#!/usr/bin/env python
"""Dev loop: run the contract parity check locally.

Usage: python run_parity.py [query ...]   (default: all, at sf0.01)
"""

from __future__ import annotations

import sys

from historic_score_etl_pipeline_spark.session import get_spark
from historic_score_etl_pipeline_spark.testing import run_parity

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    names = sys.argv[1:] or None
    spark = get_spark(cpus=8)
    results = run_parity(spark, SF_DIR, names)
    n_fail = 0
    for r in results:
        print(r)
        n_fail += 0 if r.ok else 1
    print(f"\n{len(results) - n_fail}/{len(results)} parity checks passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

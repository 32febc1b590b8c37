"""Table catalog: typed landing-zone parquet sources.

The reference's "catalog" is a dict of 26 league names → scrape URLs
(``/root/reference/app/var.py:3-30``); each league is one partition of a
logical fixtures source.  The engine models sources as parquet tables read
through ``spark.read`` so Catalyst gets predicate pushdown, column pruning
and partition pruning for free (SURVEY.md §4.1).

At 100 TB these tables would be date/key-partitioned directories; the scan
API is identical, so the code below does not change — only the paths do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table.  Plain ``spark.read.parquet`` — pushdown-friendly.

    ``events.parquet`` is written with nanosecond timestamps, which the
    vectorized parquet reader rejects; we read nanos as long (runtime conf)
    and rebuild a microsecond timestamp column — the same truncation DuckDB
    applies when casting ns → its microsecond-precision TIMESTAMP, keeping
    oracle parity.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every catalog table (lazy — no jobs run until an action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the catalog to ``spark.sql`` as temp views."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

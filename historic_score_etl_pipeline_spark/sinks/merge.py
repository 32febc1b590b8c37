"""MERGE / upsert sink over parquet (SURVEY.md §2A-A4 extension).

The reference's only write mode is blind append with retries
(``app/team_utilities.py:363-365,510-554``) — re-running a failed league
duplicates rows.  A real warehouse sink needs MERGE semantics: new keys
insert, existing keys update, re-runs are no-ops.  This module provides
that over plain parquet with the idioms a table format (Delta/Iceberg)
would use underneath:

* **latest-version-wins** resolution via one window pass — no driver-side
  row handling, so the merge itself scales with the cluster;
* **partition-scoped rewrite**: when the target is partitioned, only the
  partitions present in the update batch are read AND rewritten (dynamic
  partition overwrite).  At 100 TB this is the difference between
  touching 3 date partitions and rewriting the table;
* **idempotence**: applying the same update batch twice yields the same
  table state (the precedence ordering is total), which is what makes
  the reference's retry loop safe to express as Spark task/job retries.

Plain parquet has no transactional metadata swap, so the merged result
must be staged to a scratch path before overwriting the target (Spark
refuses to overwrite a path it is concurrently reading — and working
around that lazily would corrupt on failure).  A table format replaces
the stage+swap with an atomic manifest commit; the dataflow is identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_PRECEDENCE = "__merge_precedence"
_RANK = "__merge_rank"


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str | None = None,
    partition_col: str | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_dir``.

    Resolution order per key: higher ``version_col`` wins; on version
    ties (or with no version column) the update row beats the existing
    row.  With ``partition_col``, only partitions present in ``updates``
    are read and rewritten.
    """
    exists = os.path.isdir(target_dir) and any(
        not f.startswith(("_", ".")) for f in os.listdir(target_dir)
    )
    if not exists:
        resolved = _dedupe(updates.withColumn(_PRECEDENCE, F.lit(1)), key_cols, version_col)
        writer = resolved.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_dir)
        return

    base = spark.read.parquet(target_dir)
    if partition_col:
        touched = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        base = base.where(F.col(partition_col).isin(touched))

    merged = _dedupe(
        base.withColumn(_PRECEDENCE, F.lit(0)).unionByName(
            updates.withColumn(_PRECEDENCE, F.lit(1))
        ),
        key_cols,
        version_col,
    )

    # Stage, then swap/overwrite — never overwrite the path being read.
    scratch = tempfile.mkdtemp(prefix="merge_stage_")
    try:
        stage_writer = merged.write.mode("overwrite")
        if partition_col:
            stage_writer = stage_writer.partitionBy(partition_col)
        stage_writer.parquet(scratch)

        staged = spark.read.parquet(scratch)
        final_writer = staged.write.mode("overwrite")
        if partition_col:
            # Dynamic mode: only partitions present in `staged` are
            # replaced; untouched partitions' files stay as-is.
            final_writer = final_writer.partitionBy(partition_col).option(
                "partitionOverwriteMode", "dynamic"
            )
        final_writer.parquet(target_dir)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def scd2_apply(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_date",
) -> None:
    """Slowly-Changing-Dimension Type 2 fold into the parquet table at
    ``target_dir``.

    The table carries ``valid_from``, ``valid_to`` (null = open) and
    ``is_current``.  For each update row: if the key is new, insert an
    open row; if the key exists and any tracked attribute differs, close
    the current row at the effective date and open a new one; if the
    attributes are unchanged, do nothing — which is what makes a retried
    batch a no-op (the reference's retry loop, ``app/team_utilities.py:
    510-554``, made safe by construction instead of by hoping).

    All decisions are one join of current rows against the update batch;
    history rows stream through untouched.  At scale the current slice
    is |keys| rows (dimension-sized → often broadcast-able), never the
    full history.
    """
    upd = updates.select(
        *key_cols, *attr_cols, F.col(effective_col).alias("_eff")
    )
    exists = os.path.isdir(target_dir) and any(
        not f.startswith(("_", ".")) for f in os.listdir(target_dir)
    )
    if not exists:
        fresh = upd.select(
            *key_cols,
            *attr_cols,
            F.col("_eff").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        fresh.write.mode("overwrite").parquet(target_dir)
        return

    base = spark.read.parquet(target_dir)
    history = base.where(~F.col("is_current"))
    current = base.where(F.col("is_current"))

    upd_renamed = upd.select(
        *[F.col(k).alias(f"_u_{k}") for k in key_cols],
        *[F.col(a).alias(f"_u_{a}") for a in attr_cols],
        "_eff",
    )
    key_match = [F.col(k) == F.col(f"_u_{k}") for k in key_cols]
    cond = key_match[0]
    for extra in key_match[1:]:
        cond = cond & extra
    joined = current.join(upd_renamed, cond, "full_outer")

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | (
            ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
        )
    has_update = F.col("_eff").isNotNull()
    had_current = F.col("is_current").isNotNull()

    # current rows: closed if a differing update arrived, else kept as-is
    kept_current = joined.where(had_current).select(
        *key_cols,
        *attr_cols,
        F.col("valid_from"),
        F.when(has_update & changed, F.col("_eff")).otherwise(
            F.col("valid_to")
        ).alias("valid_to"),
        F.when(has_update & changed, F.lit(False)).otherwise(
            F.lit(True)
        ).alias("is_current"),
    )
    # update rows that open a new version: changed keys + brand-new keys
    opened = joined.where(
        has_update & (changed | ~had_current)
    ).select(
        *[F.col(f"_u_{k}").alias(k) for k in key_cols],
        *[F.col(f"_u_{a}").alias(a) for a in attr_cols],
        F.col("_eff").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    merged = history.unionByName(kept_current).unionByName(opened)

    scratch = tempfile.mkdtemp(prefix="scd2_stage_")
    try:
        merged.write.mode("overwrite").parquet(scratch)
        spark.read.parquet(scratch).write.mode("overwrite").parquet(target_dir)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _dedupe(
    df: DataFrame, key_cols: list[str], version_col: str | None
) -> DataFrame:
    order = [F.col(_PRECEDENCE).desc()]
    if version_col:
        order.insert(0, F.col(version_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn(_RANK, F.row_number().over(w))
        .where(F.col(_RANK) == 1)
        .drop(_RANK, _PRECEDENCE)
    )

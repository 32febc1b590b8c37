"""Shared staging-directory discipline for contract queries that land
fixture data in a non-parquet shape before scanning it back.

Two rules, both learned from review findings (ADVICE r3):

* **App-scoped paths.** A shared /tmp path with non-atomic
  ``mode("overwrite")`` lets two concurrent sessions (pytest +
  run_parity, hostile + normal — explicitly supported) race: one session
  reads a partially committed landing dir and silently aggregates fewer
  rows (a transient hash-fail) or errors mid-scan.  Scoping by Spark
  applicationId makes every staging dir single-writer; dirs are written
  once then only read.

* **Deep-mtime reaping.** App-scoped dirs are never reused, so stale
  siblings are deleted after 6 h of inactivity to keep /tmp bounded.
  Liveness is judged by the most recent mtime anywhere UNDER the dir —
  the top-level mtime is not refreshed by nested writes (Derby
  touches only nested files after creation), so a root-mtime rule
  would reap a live 7-hour session's in-use database.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession

_REAP_AFTER_SECS = 6 * 3600


def tree_mtime(path: str) -> float:
    """Most recent mtime anywhere under ``path`` (0.0 if unreadable)."""
    try:
        latest = os.path.getmtime(path)
    except OSError:
        return 0.0
    for root, _dirs, files in os.walk(path):
        for name in files:
            try:
                latest = max(latest, os.path.getmtime(os.path.join(root, name)))
            except OSError:
                continue
    return latest


def reap_stale_siblings(base: str, prefix: str, keep: str) -> None:
    """Delete sibling staging dirs idle (by deep tree mtime) > 6 h.

    Matches both the app-scoped naming (``<prefix><appId>``) and the
    exact legacy pre-app-scoping name (``prefix`` minus its trailing
    underscore, e.g. ``hsep_csv_stage_sf0.1``) — without the legacy
    match those dirs would persist in /tmp forever (ADVICE r4)."""
    cutoff = time.time() - _REAP_AFTER_SECS
    legacy = prefix.rstrip("_")
    try:
        siblings = os.listdir(base)
    except OSError:
        return
    for d in siblings:
        if (d.startswith(prefix) or d == legacy) and d != keep:
            full = os.path.join(base, d)
            if tree_mtime(full) < cutoff:
                shutil.rmtree(full, ignore_errors=True)


def reap_stale_tables(
    spark: SparkSession, prefixes: tuple[str, ...], keep: set[str]
) -> None:
    """DROP + delete app-scoped ``saveAsTable`` staging tables idle > 6 h.

    ``saveAsTable`` leaks TWO artifacts per session: a warehouse
    directory AND a Derby metastore row — neither is covered by the
    /tmp reaper, so bucketed-join fixtures accrete forever (review
    finding r5: 35 leaked table dirs).  Same deep-mtime liveness rule
    as :func:`reap_stale_siblings` (a concurrent hostile/normal parity
    session's tables stay warm and are never dropped).  Keyed off the
    warehouse LISTING, not the catalog, so dirs orphaned by a rebuilt
    metastore are still removed; DROP TABLE IF EXISTS covers the
    catalog row when one exists."""
    from urllib.parse import urlparse

    raw = spark.conf.get("spark.sql.warehouse.dir", "")
    wh = urlparse(raw).path or raw
    cutoff = time.time() - _REAP_AFTER_SECS
    try:
        siblings = os.listdir(wh)
    except OSError:
        return
    for d in siblings:
        if any(d.startswith(p) for p in prefixes) and d not in keep:
            full = os.path.join(wh, d)
            if tree_mtime(full) < cutoff:
                spark.sql(f"DROP TABLE IF EXISTS `{d}`")
                shutil.rmtree(full, ignore_errors=True)


def warehouse_table_dir(spark: SparkSession, table: str) -> str:
    """On-disk warehouse directory backing a ``saveAsTable`` table
    (Spark lowercases table names on the filesystem)."""
    from urllib.parse import urlparse

    raw = spark.conf.get("spark.sql.warehouse.dir", "")
    wh = urlparse(raw).path or raw
    return os.path.join(wh, table.lower())


def touch_table_heartbeat(spark: SparkSession, table: str) -> None:
    """Bump a ``_HEARTBEAT`` marker inside the table's warehouse dir.

    Reads never refresh parquet mtimes, so a session alive longer than
    the reap window would look STALE to a newer concurrent session's
    :func:`reap_stale_tables` even while actively joining against the
    table (ADVICE r5).  Touching an underscore-prefixed marker (hidden
    from Spark's file index, like ``_SUCCESS``) makes deep-tree-mtime
    liveness reflect last *use*, not last write."""
    hb = os.path.join(warehouse_table_dir(spark, table), "_HEARTBEAT")
    try:
        with open(hb, "a"):
            pass
        os.utime(hb, None)
    except OSError:
        pass


def table_live(spark: SparkSession, table: str) -> bool:
    """True iff the catalog row AND its warehouse data both exist.

    A concurrent session's reaper may rmtree the data while this
    session's Derby metastore keeps the row (each session has its own
    metastore, so the reaper's DROP TABLE cannot reach it) — then
    ``tableExists()`` alone would route to a read that fails on a
    missing path.  When the dir is gone, drop the dangling row so the
    caller rebuilds; when live, bump the heartbeat so THIS session's
    continued use is visible to other sessions' reapers (ADVICE r5)."""
    if not spark.catalog.tableExists(table):
        return False
    if not os.path.isdir(warehouse_table_dir(spark, table)):
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        return False
    touch_table_heartbeat(spark, table)
    return True


def app_scoped_dir(spark: SparkSession, kind: str, sf_dir: str) -> str:
    """Per-(kind, scale, application) staging path; reaps stale siblings
    of the same kind+scale on the way.  The dir itself is NOT created —
    Spark writers create it."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    app = spark.sparkContext.applicationId
    base = tempfile.gettempdir()
    out = os.path.join(base, f"hsep_{kind}_stage_{tag}_{app}")
    reap_stale_siblings(base, f"hsep_{kind}_stage_{tag}_", os.path.basename(out))
    return out


def app_scoped_stream_root(spark: SparkSession, kind: str, sf_dir: str) -> str:
    """Per-(query, scale, application) root for streaming file sinks.

    Repeated invocations in one long-lived process (notebook, repeated
    parity loops) previously accumulated one ``mkdtemp`` tree plus one
    atexit handler each (ADVICE r10) — this reuses a single app-scoped
    tree per query instead, wiped on entry so every invocation re-runs
    the stream from a clean checkpoint, deterministically.  Trees from
    dead applications are reaped on the shared deep-mtime rule;
    concurrent sessions never collide (applicationId is unique)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    app = spark.sparkContext.applicationId
    base = tempfile.gettempdir()
    root = os.path.join(base, f"hsep_{kind}_{tag}_{app}")
    reap_stale_siblings(base, f"hsep_{kind}_{tag}_", os.path.basename(root))
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    return root

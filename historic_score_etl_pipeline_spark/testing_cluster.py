"""Standalone-cluster session builder for the multi-PROCESS test axis.

Shared by ``run_parity.py --cluster`` (correctness: the full registry
against real executor JVMs) and ``bench.py --cluster`` (throughput: the
headline queries priced with real RPC/shuffle instead of the driver-JVM
shortcuts local mode silently provides — broadcast over the wire,
Python workers per executor, shuffle through files, no shared
interpreter).

The cluster itself is started out-of-process (commands in the
docstring below); this module only builds a session against it and
ships the engine package to the executors the way a real deployment
does (the ``spark-submit --py-files`` mechanism) — executor Python
workers deserialize UDF closures that import this package, and their
sys.path knows nothing of the driver's checkout.  The round-10
full-registry cluster run failed all 20 codec/UDF keys with
ModuleNotFoundError until the code was shipped; local mode can never
see that class of failure because every task shares the driver's
interpreter.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession


def cluster_spark(
    app_name: str = "parity-cluster",
    cores_max: int = 8,
    executor_memory: str = "4g",
    shuffle_partitions: int = 8,
) -> SparkSession:
    """Session against a REAL 2-worker standalone cluster (VERDICT r9
    ask #3) — the first multi-PROCESS execution axis: separate executor
    JVMs, real RPC, no driver-JVM shortcuts for broadcast/state/temp
    files.  Start the cluster with::

        SPARK_LOG_DIR=/tmp/spark-cluster-logs SPARK_PID_DIR=/tmp/spark-cluster-pids \\
        SPARK_MASTER_WEBUI_PORT=0 /opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077
        SPARK_WORKER_WEBUI_PORT=8081 SPARK_WORKER_INSTANCES=2 \\
        /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 \\
            --cores 4 --memory 6g --host 127.0.0.1

    (For the bench cell, start the workers with ``--cores 16 --memory
    30g`` instead so total cores match the local[32] baseline.)

    Both workers run on this host, so the filesystem is genuinely shared
    — SPARK_GRAFT_SHARED_FS=1 tells staging code (surface76) that
    executor-side open() lands on a shared mount, the documented
    production path."""
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ["SPARK_GRAFT_SHARED_FS"] = "1"
    url = os.environ.get("SPARK_GRAFT_CLUSTER_URL", "spark://127.0.0.1:7077")
    spark = (
        SparkSession.builder.master(url)
        .appName(app_name)
        .config("spark.cores.max", str(cores_max))
        .config("spark.executor.memory", executor_memory)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import historic_score_etl_pipeline_spark as _pkg

    pkg_dir = os.path.dirname(os.path.abspath(_pkg.__file__))
    zip_base = os.path.join(
        tempfile.mkdtemp(prefix="hsep_pyfiles_"), "hsep_engine"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    spark.sparkContext.addPyFile(zip_path)
    return spark

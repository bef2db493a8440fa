"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-vs-oracle (UTC timestamps; ANSI
mode stays at the Spark 4 default ON — every oracle-checked query
passes under it, and it surfaces overflow/cast bugs instead of wrapping)
and for scale (AQE on, Arrow on, shuffle partitions sized to cores locally —
on a real cluster leave ``spark.sql.shuffle.partitions`` to AQE's
coalescing and size ``spark.sql.files.maxPartitionBytes`` so scan tasks
stay ~128MB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "providenciasbigdata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Local test/bench runs honor ``SPARK_GRAFT_CPUS`` (default 32).
    On a cluster, pass ``master=None`` and let spark-submit decide.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # transformWithStateInPandas shim (verdict-r5 item 5): where
    # google.protobuf is absent, every Spark PYTHON WORKER must see the
    # miniproto stand-in for StateMessage_pb2. Workers are fresh
    # interpreters, so the hook rides PYTHONPATH: the vendor/pythonpath
    # dir carries a sitecustomize that lazily registers the shim
    # finder, and the repo root makes the package importable there.
    # Must happen BEFORE the JVM starts — local-mode workers inherit
    # the driver JVM's env. No-op (real runtime wins) when protobuf
    # exists; fail-open everywhere else.
    from providenciasbigdata_spark.vendor import protoshim

    if protoshim.install():
        # …/repo_root/providenciasbigdata_spark/vendor/protoshim.py
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(protoshim.__file__)))
        )
        entries = [protoshim.pythonpath_dir(), repo_root]
        existing = os.environ.get("PYTHONPATH", "")
        merged = [e for e in entries if e not in existing.split(os.pathsep)]
        if merged:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                merged + ([existing] if existing else [])
            )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting — the
        # 100TB levers; harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for toPandas()/pandas_udf transfers.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # DuckDB oracle compares timestamps UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

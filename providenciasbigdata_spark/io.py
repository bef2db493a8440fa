"""Table loading — the engine's source layer.

The reference's sources are live MongoDB/Neo4j handles
(streamlit_app.py:19-22,159 in the reference); ours are columnar files
read through Spark's datasource API so Catalyst gets predicate pushdown,
column pruning and partition pruning for free.

At 100TB the documents table should be written partitioned by a
low-cardinality facet column (e.g. ``anio``) and the edges table
bucketed by ``src`` (SURVEY.md §4.3) — ``write_partitioned`` below is
the sink for that layout. Tests read the driver's flat fixture files.
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
    """Read one fixture table (Parquet). Lazy; columns prune at scan.

    ``events.ts`` is written as Parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos
    as LONG (runtime-settable SQL conf) and rebuild a microsecond
    TimestampType column; ``ts div 1000`` matches DuckDB's
    ``epoch_us(ts)`` exactly (floor for positive epochs).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_any(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Generic reader covering the file formats the engine supports.

    parquet/orc: columnar with pushdown (prefer). csv/json: row formats,
    pass an explicit schema at scale (inference = extra full scan).
    binaryFile: multimodal payloads (SURVEY.md C-X6).
    """
    reader = spark.read.format(fmt)
    if options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    return reader.load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partitioned columnar sink — enables static/dynamic partition
    pruning on later reads (SURVEY.md §4.3)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory of (many, small)
    files into ceil(total_bytes / target) files of ~target size — the
    maintenance pass every long-running ingest needs (streaming sinks
    and over-parallel writers fragment; a 100 TB table in 1 MB files
    spends more time opening footers than scanning).

    Uses coalesce (narrow — no shuffle: target count is always <= the
    scan's partition count for a fragmented input); row ordering within
    files is not preserved. Returns the output file count.
    """
    import math

    df = spark.read.format(fmt).load(src_path)
    n_files = max(1, math.ceil(_dir_bytes(src_path) / target_file_bytes))
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(dst_path)
    return n_files


def _dir_bytes(path: str) -> int:
    """Recursive on-disk byte count (local filesystem paths)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total

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

    ``events.ts`` has shipped in two fixture vintages: Parquet
    TIMESTAMP(NANOS) — which Spark's vectorized reader rejects
    ([PARQUET_TYPE_ILLEGAL]), so we read nanos as LONG and rebuild a
    microsecond TimestampType column (``ts div 1000`` matches DuckDB's
    ``epoch_us(ts)`` exactly: floor for positive epochs) — and plain
    TIMESTAMP(MICROS), which both engines read natively. Detect which
    by footer inspection so either vintage loads unchanged.
    """
    if name == "events":
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        path = os.path.join(sf_dir, "events.parquet")
        nanos = tz_aware = False
        try:
            field = pq.read_schema(path).field("ts")
            nanos = getattr(field.type, "unit", None) == "ns"
            tz_aware = getattr(field.type, "tz", None) is not None
        except Exception:
            pass
        if nanos:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            # nanosAsLong surfaces the stored count either way; for a
            # tz-aware file that count is already the UTC epoch, and
            # for the fixture's naive vintage the naive-as-UTC contract
            # makes it one too — both rebuild identically.
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = spark.read.parquet(path)
        if tz_aware:
            # instant semantics (isAdjustedToUTC=true): Spark already
            # reads TimestampType holding the right absolute instant —
            # applying the NTZ epoch rebuild here would coerce through
            # the session timezone, the exact dependence this branch
            # exists to avoid (ADVICE r2).
            return df
        # micros vintage reads as TIMESTAMP_NTZ (isAdjustedToUTC=false).
        # Convert to TimestampType with the naive value interpreted AS
        # UTC *independently of the session timezone*: timestampdiff on
        # NTZ operands gives the naive epoch, timestamp_micros rebuilds
        # the absolute instant. (A plain cast("timestamp") interprets
        # the naive value in the session zone — correct only when that
        # zone is UTC, and the verifying session's zone is not ours to
        # assume.) DuckDB's epoch_us(naive) matches by construction.
        epoch_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        return df.withColumn("ts", F.timestamp_micros(epoch_us))
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
    binaryFile: multimodal payloads (SURVEY.md C-X6). avro: supported
    when the external module is deployed (``--packages
    org.apache.spark:spark-avro_2.13:<spark-version>``); absent, the
    error names the exact coordinate instead of a bare classpath
    failure.
    """
    reader = spark.read.format(fmt)
    if options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    try:
        return reader.load(path)
    except Exception as e:
        if fmt == "avro" and "Failed to find data source" in str(e):
            ver = spark.version
            raise RuntimeError(
                "the avro data source is an external Spark module; launch "
                f"with --packages org.apache.spark:spark-avro_2.13:{ver}"
            ) from e
        raise


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


def zorder_key(
    cols: list,
    mins: list,
    maxs: list,
    bits_per_col: int = 16,
):
    """Morton (Z-order) interleave of ``len(cols)`` numeric columns,
    each uniform-bucketed to ``bits_per_col`` bits over [min, max].

    Entirely flat bitwise expressions (shiftleft/or — no overflow
    checks, fully codegen'd). Bucketing is width_bucket over the
    min/max range; for heavily skewed columns substitute quantile cut
    points upstream (compute approxQuantile once, map to ranks) — the
    interleave below is unchanged.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits_per_col > 63:
        raise ValueError("interleaved key must fit in a signed 64-bit long")
    bucketed = [
        (
            F.width_bucket(
                F.col(c).cast("double"),
                F.lit(float(lo)),
                F.lit(float(hi)),
                F.lit((1 << bits_per_col) - 1),
            )
            - 1
        ).cast("bigint")
        for c, lo, hi in zip(cols, mins, maxs)
    ]
    key = F.lit(0).cast("bigint")
    # bit j of column i lands at position j*n + i
    for j in range(bits_per_col):
        for i, b in enumerate(bucketed):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits_per_col: int = 16,
    fmt: str = "parquet",
) -> None:
    """Multi-dimensional clustering sink: range-partition + sort by the
    Morton key of ``cols`` so every output file covers a small
    hyper-rectangle of the key space. Parquet min/max footer stats on
    EACH clustered column then prune files for predicates on ANY of
    them — single-column sorting only prunes its leading column. This
    is the table-maintenance half of data skipping at 100 TB; the read
    half is Spark's built-in scan-level min/max filtering.

    One shuffle (range partition on the key); min/max bounds for the
    bucketing come from one cheap agg over the input.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[f(c).alias(f"{p}_{c}") for c in cols for p, f in (("lo", F.min), ("hi", F.max))]
    ).first()
    mins = [bounds[f"lo_{c}"] for c in cols]
    maxs = [bounds[f"hi_{c}"] for c in cols]
    key = zorder_key(cols, mins, maxs, bits_per_col)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """CSV ingest that survives dirty data at scale: explicit schema
    (inference is an extra full pass), parse mode PERMISSIVE (malformed
    rows land with NULL fields and the raw line captured in
    ``corrupt_col`` for quarantine), DROPMALFORMED (silently drop), or
    FAILFAST (abort on first bad row). The quarantine pattern:
    ``df.filter(col(corrupt_col).isNotNull())`` routes bad lines to a
    dead-letter sink while the clean subset flows on — one scan, no
    pre-validation pass."""
    full_schema = schema
    if mode.upper() == "PERMISSIVE" and corrupt_col not in schema:
        full_schema = f"{schema}, {corrupt_col} string"
    reader = (
        spark.read.schema(full_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.csv(path)


def collect_file_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Build a per-FILE statistics manifest (file, n_rows, min/max per
    column) — the Iceberg/Delta manifest idea as a plain DataFrame:
    one scan amortized across every later pruned read. Engines with
    footer access get this for free; building it as a job keeps the
    result a first-class table you can store, join, and re-derive
    after compaction."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def pruned_read(
    spark: SparkSession,
    path: str,
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Manifest-driven file skipping: read ONLY the files whose
    [min, max] range for ``col`` overlaps [lo, hi], then apply the
    exact predicate (files still hold non-qualifying rows). Results
    are pinned EQUAL to the full scan + filter; the point is the file
    list — on a clustered layout (write_zordered / a sorted write) the
    overlap set is a small fraction of the table, and the driver holds
    only the manifest rows, never data.
    """
    from pyspark.sql import functions as F

    hits = [
        r["file"]
        for r in stats.filter(
            (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
        ).collect()
    ]
    base = spark.read.parquet(*hits) if hits else spark.read.parquet(path).limit(0)
    return base.filter(F.col(col).between(F.lit(lo), F.lit(hi)))


def collect_file_blooms(
    spark: SparkSession,
    path: str,
    col: str,
    n_bits: int = 8192,
    seeds: tuple[int, ...] = (0x51ED, 0xC0FFEE, 0xB100D),
) -> DataFrame:
    """Per-FILE bloom bitmaps over ``col`` — the point-lookup sibling
    of collect_file_stats: min/max ranges prune nothing for a
    high-cardinality column written unsorted (every file's range spans
    the domain), but a per-file bloom answers "could value v be in
    this file?" with no false negatives. This is Parquet's own
    bloom_filter_enabled / Delta's bloom index as a first-class
    DataFrame you can store, join, and rebuild after compaction.

    One scan: k = len(seeds) hash positions per row (JVM xxhash64,
    codegen'd), bit_or hash aggregate per (file, word) — map-side
    combine collapses the probe stream, the shuffle carries at most
    files x n_bits/64 rows — then one row per file with a sparse
    word map. Size the filter as usual: ~10 bits/distinct-key with
    k=3 gives ~1% fpr; fpr only costs extra files READ, never a
    wrong result (pruned_read_bloom re-applies the exact predicate).
    """
    from pyspark.sql import functions as F

    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    df = spark.read.parquet(path).where(F.col(col).isNotNull())
    # hash the STRING form: xxhash64 is type-sensitive (the same value
    # as INT vs BIGINT hashes differently), and the probe side builds
    # its literal from a Python value whose Catalyst type need not
    # match the column's — the string canonicalization makes manifest
    # and probe agree by construction
    probes = df.select(
        F.input_file_name().alias("file"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(col).cast("string"), F.lit(s)),
                        F.lit(n_bits),
                    )
                    for s in seeds
                ]
            )
        ).alias("__pos"),
    )
    words = (
        probes.select(
            "file",
            F.shiftright(F.col("__pos"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias("__m"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("__m").alias("word_bits"))
    )
    return words.groupBy("file").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word_idx", "word_bits")))
        ).alias("words")
    )


def pruned_read_bloom(
    spark: SparkSession,
    path: str,
    blooms: DataFrame,
    col: str,
    value,
    n_bits: int = 8192,
    seeds: tuple[int, ...] = (0x51ED, 0xC0FFEE, 0xB100D),
) -> DataFrame:
    """Bloom-manifest-driven file skipping for an equality probe: read
    ONLY files whose bloom has every probe bit of ``value`` set, then
    apply the exact predicate. No false negatives (every file that
    holds the value is read — bloom contract), so results are pinned
    EQUAL to the full scan + filter; false positives only add files.

    The probe's hash positions are computed by Catalyst itself (one
    1-row, zero-scan job) so the driver never re-implements xxhash64
    — manifest and probe can't drift. The manifest filter runs on the
    (files-sized) manifest frame; data files outside the hit list are
    never opened.
    """
    from pyspark.sql import functions as F

    pos_row = (
        spark.range(1)
        .select(
            *[
                F.pmod(
                    F.xxhash64(F.lit(value).cast("string"), F.lit(s)), F.lit(n_bits)
                ).alias(f"p{i}")
                for i, s in enumerate(seeds)
            ]
        )
        .first()
    )
    cond = None
    for i in range(len(seeds)):
        p = pos_row[f"p{i}"]
        # shiftleft, not a Python 1 << b literal: bit 63's mask is the
        # NEGATIVE long 0x8000...0, which F.lit would reject as overflow
        bit_ok = (
            F.coalesce(
                F.element_at(F.col("words"), F.lit(p >> 6).cast("bigint")), F.lit(0)
            ).bitwiseAND(F.expr(f"shiftleft(CAST(1 AS BIGINT), {p % 64})"))
            != 0
        )
        cond = bit_ok if cond is None else (cond & bit_ok)
    hits = [r["file"] for r in blooms.filter(cond).collect()]
    base = spark.read.parquet(*hits) if hits else spark.read.parquet(path).limit(0)
    return base.filter(F.col(col) == F.lit(value))

"""Source/sink layer: format round-trips and partition pruning.

The 100 TB claim in io.write_partitioned's docstring is load-bearing:
writing documents partitioned by anio must turn the year facet into
partition pruning (PartitionFilters at the scan, not a post-scan
filter). Pinned here against a real written layout.
"""

from __future__ import annotations

import contextlib
import io as _io

import pytest
from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.documents import rulings_view
from providenciasbigdata_spark.io import load_table, read_any, write_partitioned

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def rulings(spark):
    return rulings_view(load_table(spark, SF, "documents")).drop("tokens")


def test_partitioned_write_prunes_year_facet(spark, rulings, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rulings_by_anio"))
    write_partitioned(rulings, path, partition_by=["anio"])
    back = read_any(spark, path)
    filtered = back.filter(F.col("anio") == 2003)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the year predicate must appear as a partition filter on the scan
    assert any(
        "anio" in line for line in plan.splitlines() if "PartitionFilters" in line
    ), plan
    want = rulings.filter(F.col("anio") == 2003)
    cols = ["providencia", "tipo", "texto"]
    assert _sorted_rows(filtered, cols) == _sorted_rows(want, cols)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_round_trip(spark, rulings, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp(f"rt_{fmt}"))
    df = rulings.select("doc_id", "providencia", "tipo", "anio")
    opts = {"header": True} if fmt == "csv" else {}
    df.write.mode("overwrite").format(fmt).options(
        **{k: str(v) for k, v in opts.items()}
    ).save(path)
    read_opts = dict(opts)
    if fmt == "csv":
        # explicit schema at scale: inference would cost an extra full scan
        back = (
            spark.read.format(fmt)
            .schema("doc_id long, providencia string, tipo string, anio int")
            .options(**{k: str(v) for k, v in read_opts.items()})
            .load(path)
        )
    else:
        back = read_any(spark, path, fmt=fmt, **read_opts)
    cols = ["doc_id", "providencia", "tipo", "anio"]
    assert _sorted_rows(back.select(*cols), cols) == _sorted_rows(df, cols)


def test_binary_file_source(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    (d / "a.bin").write_bytes(b"\x00\x01payload-a")
    (d / "b.bin").write_bytes(b"payload-b" * 10)
    from providenciasbigdata_spark.multimodal import read_binary_dir

    df = read_binary_dir(spark, str(d), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: r.content for r in df.collect()}
    assert rows["a.bin"] == b"\x00\x01payload-a"
    assert len(rows["b.bin"]) == 90


def _plan(df):
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_static_and_dynamic(spark, tmp_path_factory):
    """Year-partitioned fact + broadcast dim: a statically-derivable
    dim filter folds into a literal PartitionFilter; a filter only
    computable at run time (aggregate threshold) injects a
    dynamicpruning subquery — the two mechanisms that turn the A6 year
    facet and dim-filtered fact joins into partition-pruned scans at
    100 TB."""
    path = str(tmp_path_factory.mktemp("orders_by_year"))
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    orders.withColumn("o_year", F.year("o_orderdate")).write.mode(
        "overwrite"
    ).partitionBy("o_year").parquet(path)
    fact = spark.read.parquet(path)

    # static: constant-foldable dim filter becomes a literal partition filter
    dim_static = (
        orders.select(F.year("o_orderdate").alias("y")).distinct().filter(F.col("y") == 1995)
    )
    plan = _plan(fact.join(F.broadcast(dim_static), fact.o_year == F.col("y")))
    assert "PartitionFilters: [(o_year" in plan.replace("#", " #").replace("  ", " ") or (
        "(o_year" in plan and "= 1995)" in plan
    ), plan

    # dynamic: runtime-only dim filter -> dynamicpruning subquery on the scan
    dim_dynamic = (
        orders.groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .filter(F.col("rev") > 0)
    )
    plan = _plan(fact.join(F.broadcast(dim_dynamic), fact.o_year == F.col("y")))
    assert "dynamicpruning" in plan.lower(), plan


def test_compact_small_files(spark, tmp_path_factory):
    from providenciasbigdata_spark.io import compact_small_files

    src = str(tmp_path_factory.mktemp("fragmented"))
    dst = str(tmp_path_factory.mktemp("compacted"))
    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    orders.repartition(64).write.mode("overwrite").parquet(src)  # ~64 tiny files
    import glob
    assert len(glob.glob(f"{src}/*.parquet")) >= 32

    n = compact_small_files(spark, src, dst, target_file_bytes=512 * 1024)
    out_files = glob.glob(f"{dst}/*.parquet")
    assert len(out_files) == n < 32
    # lossless: same rows
    assert spark.read.parquet(dst).count() == orders.count()


def test_events_ts_epoch_is_timezone_independent(spark):
    """The events loader must produce the same absolute epochs whatever
    the session timezone is — the verifying session's zone is not ours
    to assume. (A bare cast(ntz as timestamp) fails this.)"""
    from providenciasbigdata_spark.io import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.session.timeZone")
    utc = (
        load_table(spark, sf, "events")
        .select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .limit(5)
        .collect()
    )
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Bogota")
        shifted = (
            load_table(spark, sf, "events")
            .select(F.unix_micros("ts").alias("us"))
            .orderBy("us")
            .limit(5)
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert [r["us"] for r in utc] == [r["us"] for r in shifted]


def test_events_tz_aware_micros_vintage(spark, tmp_path_factory):
    """A TIMESTAMP(MICROS) file with isAdjustedToUTC=true (instant
    semantics) must load as the same absolute instants with NO epoch
    rebuild — and stay session-timezone-independent (ADVICE r2: the
    NTZ rebuild on a tz-aware column would coerce through the session
    zone)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from providenciasbigdata_spark.io import load_table

    d = str(tmp_path_factory.mktemp("tzaware_sf"))
    epochs = [0, 1_000_000, 86_400_000_000]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(epochs, pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Bogota")
        got = (
            load_table(spark, d, "events")
            .select(F.unix_micros("ts").alias("us"))
            .orderBy("us")
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert [r["us"] for r in got] == epochs


def test_avro_reader_reports_missing_module(spark, tmp_path):
    """avro is an external Spark module this runtime doesn't ship; the
    generic reader must fail with the exact package coordinate."""
    import pytest

    from providenciasbigdata_spark.io import read_any

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_any(spark, str(tmp_path), fmt="avro")


def test_read_csv_robust_quarantines_corrupt_rows(spark, tmp_path):
    """PERMISSIVE mode: malformed lines parse to NULL fields with the
    raw line captured for quarantine; clean rows flow through; the
    same file FAILFASTs when asked."""
    import pytest

    from providenciasbigdata_spark.io import read_csv_robust

    p = tmp_path / "dirty.csv"
    p.write_text("1,alpha,10.5\n2,beta,not_a_number\n3,gamma,7.25\n")
    df = read_csv_robust(spark, str(p), "id int, name string, score double").cache()
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score == 10.5 and rows[1]._corrupt_record is None
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt_record
    clean = df.filter(F.col("_corrupt_record").isNull())
    assert clean.count() == 2
    df.unpersist()

    dropped = read_csv_robust(
        spark, str(p), "id int, name string, score double", mode="DROPMALFORMED"
    )
    # collect, not count(): count() prunes every column so the parser
    # never sees the malformed field and nothing is dropped — the
    # documented reason the quarantine pattern beats DROPMALFORMED
    assert len(dropped.collect()) == 2
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_csv_robust(
            spark, str(p), "id int, name string, score double", mode="FAILFAST"
        ).collect()


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution: a vintage written without a column and a newer
    vintage with it read together via mergeSchema — old rows NULL-fill,
    pruning still works on the union schema."""
    old = tmp_path / "t" / "v=1"
    new = tmp_path / "t" / "v=2"
    spark.range(3).selectExpr("id", "CAST(id AS STRING) AS name").write.parquet(str(old))
    spark.range(3, 6).selectExpr(
        "id", "CAST(id AS STRING) AS name", "id * 2 AS extra"
    ).write.parquet(str(new))
    df = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(df.columns) >= {"id", "name", "extra"}
    assert df.count() == 6
    assert df.filter(F.col("extra").isNull()).count() == 3  # old vintage NULL-fills
    assert df.filter(F.col("extra") == 8).count() == 1

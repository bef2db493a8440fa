"""Bucketed-table co-located joins (SURVEY.md §4.3): pre-bucketing both
sides of a recurring join key eliminates its shuffle — on 100 TB the
difference between re-shuffling the fact table per query and a local
zip of co-located buckets. Verified on real written tables: the bucket
join plan must contain NO Exchange on the bucketed key.
"""

from __future__ import annotations

import contextlib
import io as _io

import pytest
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # external tables via .option("path") — the (static) warehouse dir
    # never comes into play. At fixture scale the planner would rather
    # broadcast the small side / skip the bucketed scan, hiding the
    # behavior that matters at 100 TB where neither side broadcasts —
    # pin both knobs for the module.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    wh = str(tmp_path_factory.mktemp("warehouse"))
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    for name, df, key in (("li_b", li, "l_orderkey"), ("ord_b", orders, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    yield spark
    for name in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    joined = (
        spark.table("li_b")
        .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderstatus")
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # co-located buckets: the join reads both sides WITHOUT an Exchange
    assert "Exchange hashpartitioning" not in plan, plan
    # and produces the same rows as the plain shuffle join
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    want = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert joined.count() == want


def test_bucket_pruning_on_key_equality(bucketed):
    spark = bucketed
    one = spark.table("li_b").filter(F.col("l_orderkey") == 42)
    plan = _plan(one)
    # bucket pruning: only 1 of 8 buckets selected at the scan
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_anio_partitioned_layout_prunes_partitions(spark, tmp_path):
    """The A6 production layout claim (SURVEY §2.2): rulings stored
    partitioned by anio turn the year facet into partition PRUNING —
    the filter lands in PartitionFilters and only that year's
    directory is read. (Same mechanism the persisted IVF index proves
    at cluster= granularity.)"""
    from providenciasbigdata_spark.compat.documents import rulings_view
    from providenciasbigdata_spark.io import load_table

    out = str(tmp_path / "rulings_by_anio")
    rulings_view(load_table(spark, "/root/testdata/sf0.001", "documents")).drop(
        "tokens"
    ).write.partitionBy("anio").parquet(out)

    df = spark.read.parquet(out).filter(F.col("anio") == 2003)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "anio" in plan.split("PartitionFilters")[1][:200], plan
    files = df.select(F.input_file_name().alias("f")).distinct().collect()
    dirs = {r.f.split("anio=")[1].split("/")[0] for r in files}
    assert dirs == {"2003"}
    assert df.count() > 0


def test_zorder_key_matches_python_reference(spark):
    """io.zorder_key == a pure-Python Morton over the same width_bucket
    quantization (bit j of column i at position j*n + i), and the
    64-bit overflow guard raises."""
    from providenciasbigdata_spark.io import zorder_key

    bits = 8
    lo, hi = 0.0, 1000.0
    rows = [(0, 0), (1000, 0), (0, 1000), (123, 456), (999, 1), (500, 500)]

    def wb(v):
        # width_bucket(v, lo, hi, nb) semantics, minus 1 (as zorder_key)
        nb = (1 << bits) - 1
        if v >= hi:
            return nb
        return int((v - lo) / (hi - lo) * nb)

    def ref(x, y):
        bx, by = wb(x), wb(y)
        out = 0
        for j in range(bits):
            out |= ((bx >> j) & 1) << (j * 2)
            out |= ((by >> j) & 1) << (j * 2 + 1)
        return out

    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_key(["x", "y"], [lo, lo], [hi, hi], bits_per_col=bits)
    )
    for r in df.collect():
        assert r.z == ref(r.x, r.y), (r.x, r.y, r.z)
    import pytest
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key(["x", "y"], [0, 0], [1, 1], bits_per_col=32)


def test_zorder_layout_shrinks_both_dimensions(spark, tmp_path):
    """The measured claim behind Z-ordering: write orders range-
    partitioned by the Morton key of (custkey-bucket, price-bucket)
    and the per-file min/max SPAN of BOTH dimensions shrinks well
    below a single-column sort's — i.e. a filter on EITHER column can
    skip most files, which is what footer-based file pruning consumes
    at 100 TB."""
    from providenciasbigdata_spark.io import load_table, zorder_key

    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bounds = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    zcol = zorder_key(
        ["o_custkey", "o_totalprice"],
        [bounds[0], bounds[2]], [bounds[1], bounds[3]], bits_per_col=12,
    )
    n_files = 16
    tag = [0]

    def spans(df, order_col):
        tag[0] += 1
        out = str(tmp_path / f"layout_{tag[0]}")
        (
            df.withColumn("_k", order_col)
            .repartitionByRange(n_files, F.col("_k"))
            .sortWithinPartitions("_k")
            .write.mode("overwrite").parquet(out)
        )
        per_file = (
            spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("cspan"),
                (F.max("o_totalprice") - F.min("o_totalprice")).alias("pspan"),
            )
            .agg(F.avg("cspan").alias("c"), F.avg("pspan").alias("p"))
            .first()
        )
        return per_file["c"], per_file["p"]

    glob_c, glob_p = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")),
        (F.max("o_totalprice") - F.min("o_totalprice")),
    ).first()

    c_single, p_single = spans(orders, F.col("o_custkey"))
    c_z, p_z = spans(orders, zcol)

    # single-column sort: tight on custkey, but price spans ~everything
    assert c_single < glob_c / 4
    assert p_single > glob_p * 0.8
    # z-order: BOTH dimensions shrink meaningfully below global span
    assert c_z < glob_c * 0.6, (c_z, glob_c)
    assert p_z < glob_p * 0.6, (p_z, glob_p)
    # and the price dimension is far tighter than the single-col layout
    assert p_z < p_single * 0.75


def test_manifest_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    """The read half of data skipping: on a z-ordered layout the
    manifest-driven pruned read touches a MINORITY of files for a
    narrow predicate on either clustered column, and returns exactly
    the full-scan answer."""
    from providenciasbigdata_spark.io import (
        collect_file_stats,
        load_table,
        pruned_read,
        write_zordered,
    )

    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders_z")
    write_zordered(orders, out, ["o_custkey", "o_totalprice"], n_files=16)
    stats = collect_file_stats(spark, out, ["o_custkey", "o_totalprice"]).cache()
    n_files = stats.count()
    assert n_files >= 12  # layout really split

    for col, lo, hi in (("o_totalprice", 100000.0, 120000.0), ("o_custkey", 50, 120)):
        got = pruned_read(spark, out, stats, col, lo, hi)
        touched = {r.f for r in got.select(F.input_file_name().alias("f")).distinct().collect()}
        assert len(touched) <= n_files / 2, (col, len(touched), n_files)
        want = sorted(
            r.o_orderkey
            for r in spark.read.parquet(out)
            .filter(F.col(col).between(lo, hi))
            .collect()
        )
        assert sorted(r.o_orderkey for r in got.collect()) == want and want
    # empty overlap -> empty frame, schema intact
    nothing = pruned_read(spark, out, stats, "o_totalprice", -10.0, -5.0)
    assert nothing.count() == 0 and "o_custkey" in nothing.columns


def test_bloom_manifest_pruned_read_equality(spark, tmp_path):
    """Bloom-manifest file skipping for point lookups: on a layout
    where each orderkey lives in exactly one file, an equality probe
    reads a minority of files (no false NEGATIVES ever — every file
    holding the value is in the hit list) and returns exactly the
    full-scan answer; a value absent from the table prunes to (almost)
    nothing and returns an empty frame with the schema intact."""
    from providenciasbigdata_spark.io import (
        collect_file_blooms,
        load_table,
        pruned_read_bloom,
        write_partitioned,
    )

    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders_files")
    # range-partition by orderkey -> each key in exactly ONE file, but
    # files are NOT usable by min/max pruning on custkey (spans domain)
    orders.repartitionByRange(16, "o_orderkey").write.parquet(out)
    blooms = collect_file_blooms(spark, out, "o_orderkey", n_bits=1 << 16).cache()
    n_files = blooms.count()
    assert n_files >= 12

    some = [r.o_orderkey for r in orders.limit(3).collect()]
    for key in some:
        got = pruned_read_bloom(spark, out, blooms, "o_orderkey", key, n_bits=1 << 16)
        touched = {
            r.f for r in got.select(F.input_file_name().alias("f")).distinct().collect()
        }
        assert len(touched) == 1  # the one file that holds the key
        want = sorted(
            tuple(r) for r in spark.read.parquet(out)
            .filter(F.col("o_orderkey") == key).collect()
        )
        assert sorted(tuple(r) for r in got.collect()) == want and want

    missing = pruned_read_bloom(
        spark, out, blooms, "o_orderkey", -123456789, n_bits=1 << 16
    )
    assert missing.count() == 0 and "o_custkey" in missing.columns

"""Z-order clustering: every output file must cover a SMALL range of
EVERY clustered column (the property parquet min/max skipping needs),
unlike single-column sort where only the leading column clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table, write_zordered, zorder_key


def _mean_file_span(spark, path, col, lo, hi):
    """Mean per-file (max-min)/(global range) for ``col`` — 1.0 means
    files span the whole domain (no skipping possible), ~1/n_files
    means perfect clustering."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    spans = (
        df.groupBy("_f")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .agg(F.avg("span"))
        .first()[0]
    )
    return spans / (hi - lo)


def test_zorder_clusters_both_dims(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.01", "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_us"), F.max("ts_us")
    ).first()

    z_path = f"{tmp_path}/z"
    s_path = f"{tmp_path}/s"
    write_zordered(ev, z_path, ["user_id", "ts_us"], n_files=16)
    # control: single-column sort by user_id only
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    # round-trip integrity
    assert spark.read.parquet(z_path).count() == ev.count()

    z_user = _mean_file_span(spark, z_path, "user_id", lo_u, hi_u)
    z_ts = _mean_file_span(spark, z_path, "ts_us", lo_t, hi_t)
    s_user = _mean_file_span(spark, s_path, "user_id", lo_u, hi_u)
    s_ts = _mean_file_span(spark, s_path, "ts_us", lo_t, hi_t)

    # sorted layout: leading col clusters tightly, second col doesn't
    assert s_user < 0.2, s_user
    assert s_ts > 0.8, s_ts
    # z-order: BOTH dims cluster well below the no-skipping baseline
    assert z_user < 0.5, (z_user, s_user)
    assert z_ts < 0.5, (z_ts, s_ts)


def test_zorder_key_bit_budget():
    import pytest

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], [0] * 4, [1] * 4, bits_per_col=16)


def test_zorder_key_locality(spark):
    """Nearby points in both dims get nearby keys: the key of (x, y)
    and (x+1, y+1) must differ less than the key of (x, y) and
    (x, y_far) — the interleaving property itself."""
    df = spark.createDataFrame(
        [(10, 10), (11, 11), (10, 60000)], "x long, y long"
    ).withColumn("k", zorder_key(["x", "y"], [0, 0], [65535, 65535]))
    k = [r["k"] for r in df.collect()]
    assert abs(k[1] - k[0]) < abs(k[2] - k[0])

"""Format connectors (csv/json/orc round-trips) and the salted join."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from movie_data_etl_pipeline_spark.operators.skew import salted_join
from movie_data_etl_pipeline_spark.sources import load_table
from movie_data_etl_pipeline_spark.sources.formats import read_format, write_format


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_format_round_trips(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    cols = nation.columns
    for fmt in ("csv", "json", "orc", "parquet"):
        path = str(tmp_path / f"nation_{fmt}")
        write_format(nation, path, fmt)
        back = read_format(spark, path, fmt, nation.schema)
        assert _rows(back, cols) == _rows(nation, cols), fmt


def test_csv_corrupt_row_quarantine(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("id,qty\n1,10\n2,not_a_number\n3,30\n")
    schema = StructType().add("id", "long").add("qty", "long")
    df = read_format(spark, str(p), "csv", schema, keep_corrupt=True).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 3}
    assert bad.count() == 1  # quarantined, not job-fatal


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_format(events, path, "parquet", partition_by=("day",))
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("day") == F.lit(back.agg(F.min("day")).first()[0]))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the day filter must prune partitions at the scan, not post-filter
    assert "PartitionFilters: [isnotnull(day" in plan, plan


def test_salted_join_matches_plain_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plain = lineitem.join(
        supplier, lineitem.l_suppkey == supplier.s_suppkey
    ).groupBy("s_name").agg(F.sum("l_quantity").alias("q"))
    salted = salted_join(
        lineitem.withColumnRenamed("l_suppkey", "s_suppkey"), supplier, ["s_suppkey"], n_salts=8
    ).groupBy("s_name").agg(F.sum("l_quantity").alias("q"))
    assert _rows(salted, ["s_name", "q"]) == _rows(plain, ["s_name", "q"])


def test_read_text_lines_and_whole(spark, tmp_path):
    from movie_data_etl_pipeline_spark.sources.formats import read_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("alpha\nbeta\n")
    (p / "b.txt").write_text("gamma\n")
    lines = read_text(spark, str(p))
    assert sorted(r.value for r in lines.collect()) == ["alpha", "beta", "gamma"]
    whole = read_text(spark, str(p), whole=True)
    assert sorted(r.value for r in whole.collect()) == ["alpha\nbeta\n", "gamma\n"]


def test_read_binary_files_content_and_glob(spark, tmp_path):
    from movie_data_etl_pipeline_spark.sources.formats import read_binary_files

    p = tmp_path / "assets"
    p.mkdir()
    (p / "x.bin").write_bytes(b"\x00\x01\x02")
    (p / "y.txt").write_bytes(b"skip me")
    df = read_binary_files(spark, str(p), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].path.endswith("x.bin")
    assert bytes(rows[0].content) == b"\x00\x01\x02"
    assert rows[0].length == 3


def test_load_table_survives_physical_type_drift(spark, tmp_path):
    """Fixture regenerations have shipped different physical types for
    the same logical column (round 2: events.ts flipped NANOS→µs and
    silently corrupted 8 queries). load_table normalizes the native
    read to the declared schema, so an int32/float32-narrowed file
    still loads with the declared types and values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movie_data_etl_pipeline_spark.sources import load_table

    drifted = pa.table(
        {
            "r_regionkey": pa.array([0, 1, 2], type=pa.int64()),  # declared int
            "r_name": pa.array(["AFRICA", "AMERICA", "ASIA"], type=pa.string()),
            "r_comment": pa.array(["a", "b", "c"], type=pa.string()),
        }
    )
    pq.write_table(drifted, str(tmp_path / "region.parquet"))
    df = load_table(spark, str(tmp_path), "region")
    assert dict(df.dtypes)["r_regionkey"] == "int"  # declared schema wins
    assert sorted(r["r_regionkey"] for r in df.collect()) == [0, 1, 2]

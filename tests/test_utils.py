"""Direct coverage for utility layers used indirectly elsewhere:
partitioned sinks and scalar expression helpers."""

import datetime

import pyspark.sql.functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.functions import (
    day_key,
    epoch_day_to_date,
    money,
    safe_div,
)
from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table
from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
    write_json_partitioned,
    write_parquet_partitioned,
)

from tests.conftest import SF_SMOKE


def test_write_parquet_partitioned_layout_and_file_cap(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    write_parquet_partitioned(
        df, str(tmp_path / "out"), partition_by=["status"], max_records_per_file=100
    )
    dirs = [p.name for p in (tmp_path / "out").iterdir() if p.name.startswith("status=")]
    assert set(dirs) == {"status=O", "status=F", "status=P"}
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == df.count()
    # maxRecordsPerFile honored: no file holds more than 100 rows
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.catalog import file_inventory

    assert all(r.n_rows <= 100 for r in file_inventory(back).collect())


def test_write_json_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    write_json_partitioned(df, str(tmp_path / "j"), partition_by=["tag"])
    back = spark.read.json(str(tmp_path / "j"))
    assert {(r.id, r.tag) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_scalar_helpers(spark):
    df = spark.createDataFrame(
        [(19000, "2024-03-05 10:30:00", 12.345, 10.0, 0.0)],
        "d int, ts string, amt double, num double, zero double",
    ).select(
        epoch_day_to_date("d").alias("date"),
        day_key(F.col("ts").cast("timestamp")).alias("day"),
        money("amt").alias("m"),
        safe_div(F.col("num"), F.col("zero")).alias("div0"),
        safe_div(F.col("num"), F.lit(4.0)).alias("div4"),
    )
    r = df.collect()[0]
    assert r.date == datetime.date(1970, 1, 1) + datetime.timedelta(days=19000)
    assert r.day == "2024-03-05"
    assert str(r.m) == "12.35"  # decimal(18,2), HALF_UP
    assert r.div0 is None  # zero-guard: NULL, not error/inf
    assert r.div4 == 2.5


def test_flatten_struct_recursive_and_depth(spark):
    from dea05_e2e_kafka_streaming_pipeline_spark.functions.nested import (
        flatten_struct,
    )

    df = spark.sql(
        "SELECT 1 AS id, named_struct('a', 2, 'b', "
        "named_struct('c', 3, 'd', array(4, 5))) AS s, array(6) AS arr"
    )
    flat = flatten_struct(df)
    assert flat.columns == ["id", "s_a", "s_b_c", "s_b_d", "arr"]
    row = flat.collect()[0]
    assert (row.id, row.s_a, row.s_b_c, row.s_b_d, row.arr) == (1, 2, 3, [4, 5], [6])
    # bounded depth: inner struct survives whole
    d1 = flatten_struct(df, max_depth=1)
    assert d1.columns == ["id", "s_a", "s_b", "arr"]
    assert d1.collect()[0].s_b.asDict() == {"c": 3, "d": [4, 5]}


def test_flatten_struct_collision_raises(spark):
    import pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.functions.nested import (
        flatten_struct,
    )

    df = spark.sql("SELECT named_struct('b', 1) AS a, 2 AS a_b")
    with pytest.raises(ValueError, match="collision"):
        flatten_struct(df)


def test_flatten_struct_is_pure_projection(spark):
    """No exchange, no aggregate — the flatten must stay scan-side."""
    from dea05_e2e_kafka_streaming_pipeline_spark.functions.nested import (
        flatten_struct,
    )

    df = spark.sql(
        "SELECT id, named_struct('x', id * 2, 'y', "
        "named_struct('z', id + 1)) AS s FROM range(10)"
    )
    plan = flatten_struct(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "HashAggregate" not in plan


def test_read_json_quarantine_splits_malformed(spark, tmp_path):
    """Parse-level quarantine: well-formed rows land typed, malformed
    bytes land raw in the quarantine side, nothing is silently folded
    into all-NULL rows."""
    from pyspark.sql import types as T

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import (
        read_json_quarantine,
    )

    p = tmp_path / "landing"
    p.mkdir()
    (p / "a.json").write_text(
        '{"id": 1, "v": "ok"}\n'
        '{"id": 2 "v": "missing comma"}\n'  # malformed
        '{"id": 3, "v": "fine"}\n'
        "not json at all\n"
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, bad = read_json_quarantine(spark, str(p), schema)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    raws = [r.corrupt_record for r in bad.collect()]
    assert len(raws) == 2 and any("missing comma" in r for r in raws)
    assert all(r is not None for r in raws)


def test_parse_kv_log_udtf(spark):
    """Python UDTF surface (Spark 4 @udtf): variable-shaped typed rows
    per input, lateral-joined from SQL and from the DataFrame API."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.functions.udtf import (
        ParseKVLog,
        register_udtfs,
    )

    # DataFrame use: lateral join against a payload column
    assert register_udtfs(spark) == ["parse_kv_log"]
    df = spark.createDataFrame(
        [(1, "user=7 action=click x"), (2, ""), (3, None), (4, "a=b=c")],
        "id int, payload string",
    )
    df.createOrReplaceTempView("kvlogs")
    rows = spark.sql(
        "SELECT id, p.key, p.value, p.position "
        "FROM kvlogs, LATERAL parse_kv_log(payload) p ORDER BY id, position"
    ).collect()
    got = [(r.id, r.key, r.value, r.position) for r in rows]
    assert got == [
        (1, "user", "7", 0),
        (1, "action", "click", 1),
        (4, "a", "b=c", 0),  # split-once-from-left; "x" token skipped
    ]

    # direct table-function call
    direct = ParseKVLog(F.lit("k=v")).collect()
    assert [(r.key, r.value, r.position) for r in direct] == [("k", "v", 0)]


def test_core_operators_handle_empty_input(spark):
    """Empty-corpus robustness: the core operator families return
    empty (not crash) on zero-row input — the shape every incremental
    pipeline hits on a quiet day."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
        connected_components,
        dedup_exact,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
        profile_table,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        with_text_stats,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        global_row_number,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_exact(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    assert ngram_jaccard_pairs_prefix(docs).count() == 0
    assert with_text_stats(docs).count() == 0
    assert global_row_number(docs, ["doc_id"]).count() == 0
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(docs, empty_pairs, algorithm="auto").count() == 0
    prof = {r.col_name: r for r in profile_table(docs).collect()}
    assert prof["doc_id"].total == 0 and prof["doc_id"].n_distinct == 0

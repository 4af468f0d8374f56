"""DQ validator: threshold boundary semantics (FIXTURES.md §5), single-pass
report shape, gate behavior, empty-input zero-guard."""

import pyspark.sql.functions as F
import pytest

from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
    DataQualityValidator,
)


def _orders_with_nulls(spark, n=1000, null_rate=0.0):
    """n rows; the first round(n*null_rate) have NULL customer_id."""
    k = round(n * null_rate)
    return spark.range(n).select(
        F.col("id").alias("order_id"),
        F.when(F.col("id") >= k, F.col("id") % 50).cast("int").alias("customer_id"),
        (F.col("id") % 100 + 1.0).alias("order_amount"),
    )


@pytest.mark.parametrize(
    "null_rate,expected",
    [(0.0, "PASS"), (0.049, "PASS"), (0.05, "FAIL"), (0.06, "FAIL")],
)
def test_completeness_strict_threshold(spark, null_rate, expected):
    """PASS iff null% < 5 — strict inequality, reference data_quality.py:48."""
    df = _orders_with_nulls(spark, 1000, null_rate)
    report = (
        DataQualityValidator(df)
        .check_completeness(["customer_id"])
        .report()
        .collect()
    )
    assert len(report) == 1
    assert report[0].status == expected
    assert report[0].failed_count == round(1000 * null_rate)


@pytest.mark.parametrize(
    "viol_rate,expected", [(0.0, "PASS"), (0.009, "PASS"), (0.01, "FAIL")]
)
def test_accuracy_strict_threshold(spark, viol_rate, expected):
    """PASS iff violation% < 1 — reference data_quality.py:67."""
    n, k = 1000, round(1000 * viol_rate)
    df = spark.range(n).select(
        F.when(F.col("id") < k, -1.0).otherwise(10.0).alias("order_amount")
    )
    report = (
        DataQualityValidator(df)
        .check_accuracy("positive_amount", F.col("order_amount") > 0)
        .report()
        .collect()
    )
    assert report[0].status == expected


@pytest.mark.parametrize(
    "orphan_rate,expected", [(0.0, "PASS"), (0.009, "PASS"), (0.02, "FAIL")]
)
def test_consistency_orphans(spark, orphan_rate, expected):
    n, k = 1000, round(1000 * orphan_rate)
    # customer_id < k → orphan (dim only has ids >= k)
    facts = spark.range(n).select((F.col("id") % 1000).cast("int").alias("customer_id"))
    dim = spark.range(k, 1000).select(F.col("id").cast("int").alias("customer_id"))
    report = (
        DataQualityValidator(facts)
        .check_consistency("fk", dim, "customer_id")
        .report()
        .collect()
    )
    assert report[0].failed_count == k
    assert report[0].status == expected


def test_volume_bounds(spark):
    df = spark.range(500)
    rows = (
        DataQualityValidator(df)
        .check_volume(100, 1000)
        .check_volume(600, 1000, name="too_low")
        .report()
        .collect()
    )
    by_name = {r.check_name: r.status for r in rows}
    assert by_name == {"row_volume": "PASS", "too_low": "FAIL"}


def test_empty_input_no_crash(spark):
    """Reference divides by count() with no zero-guard (data_quality.py:40-43)
    → ZeroDivisionError on empty input. Engine yields 0% / PASS."""
    df = spark.range(0).select(F.col("id").alias("order_id"))
    rows = (
        DataQualityValidator(df).check_completeness(["order_id"]).report().collect()
    )
    assert rows[0].failed_pct == 0.0
    assert rows[0].status == "PASS"


def test_null_rule_rows_not_violations(spark):
    """A row where the rule evaluates NULL is not a violation — matches
    the reference's filter(~rule) semantics."""
    df = spark.createDataFrame([(None,), (5.0,), (-1.0,)], "order_amount double")
    rows = (
        DataQualityValidator(df)
        .check_accuracy("positive_amount", F.col("order_amount") > 0, threshold_pct=50.0)
        .report()
        .collect()
    )
    assert rows[0].failed_count == 1  # only the -1.0 row


def test_gate_branches(spark, tmp_path):
    """all-PASS → curated write; any FAIL → quarantine (data_quality.py:169-175)."""
    good = _orders_with_nulls(spark, 200, 0.0)
    bad = _orders_with_nulls(spark, 200, 0.5)
    for df, expect_ok, sub in [(good, True, "good"), (bad, False, "bad")]:
        curated, quarantine = tmp_path / f"{sub}/curated", tmp_path / f"{sub}/quarantine"
        ok = (
            DataQualityValidator(df)
            .check_completeness(["customer_id"])
            .gate(
                lambda d, p=curated: d.write.mode("overwrite").parquet(str(p)),
                lambda d, p=quarantine: d.write.mode("overwrite").json(str(p)),
            )
        )
        assert ok is expect_ok
        assert curated.exists() is expect_ok
        assert quarantine.exists() is (not expect_ok)


def test_single_pass_plan(spark):
    """All completeness+accuracy checks must fold into ONE aggregate over
    one scan — the core scalability fix vs the reference's per-check jobs."""
    df = _orders_with_nulls(spark, 100)
    report = (
        DataQualityValidator(df)
        .check_completeness(["order_id", "customer_id", "order_amount"])
        .check_accuracy("positive_amount", F.col("order_amount") > 0)
        .report()
    )
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    # exactly one Aggregate (all checks are conditional sums in it) and
    # one scan — the explode happens on the 1-row aggregate output
    assert plan.count("Aggregate") == 1
    assert plan.count("Range") == 1


def test_summary_shape(spark):
    """Report summary matches the reference's JSON shape
    (curated/data_quality.py:108-126)."""
    df = _orders_with_nulls(spark, 100, 0.5)
    s = (
        DataQualityValidator(df)
        .check_completeness(["order_id", "customer_id"])
        .summary()
    )
    assert s["summary"] == {"total_checks": 2, "passed": 1, "failed": 1}
    assert len(s["details"]) == 2
    assert {d["check_name"] for d in s["details"]} == {"order_id", "customer_id"}


def test_consistency_broadcast_opt_out(spark):
    """broadcast_dim=False must give identical results with no forced
    broadcast hint in the logical plan — the fallback for fact-to-fact
    FK checks whose key set would OOM a broadcast (round-1 verdict's
    scale hazard #2)."""
    facts = spark.range(100).select((F.col("id") % 100).cast("int").alias("customer_id"))
    dim = spark.range(10, 100).select(F.col("id").cast("int").alias("customer_id"))

    forced = DataQualityValidator(facts).check_consistency("fk", dim, "customer_id")
    free = DataQualityValidator(facts).check_consistency(
        "fk", dim, "customer_id", broadcast_dim=False
    )
    got_forced = forced.report().collect()
    got_free = free.report().collect()
    assert [r.asDict() for r in got_forced] == [r.asDict() for r in got_free]

    # the hint is present only when requested
    plan_forced = forced.report()._jdf.queryExecution().optimizedPlan().toString()
    plan_free = free.report()._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" in plan_forced.lower()
    assert "broadcast" not in plan_free.lower()


def test_write_report_lands_summary_json(spark, tmp_path):
    import json

    df = spark.range(10).select(F.col("id").cast("int").alias("order_id"))
    path = str(tmp_path / "reports" / "dq.json")
    v = DataQualityValidator(df).check_completeness(["order_id"])
    written = v.write_report(path)
    on_disk = json.loads(open(path).read())
    assert on_disk == json.loads(json.dumps(written, default=str))
    assert on_disk["summary"]["total_checks"] == 1
    assert on_disk["summary"]["passed"] == 1
    assert on_disk["details"][0]["check_name"] == "order_id"


def test_observed_audit_batch_piggybacks_metrics(spark):
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
        observed_audit,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.5)], "id long, amount double"
    )
    out, obs = observed_audit(df, "batch_audit", value_col="amount")
    assert out.count() == 3  # the action that materializes the metrics
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_nonnull"] == 2
    assert got["value_sum"] == 15.5


def test_observed_audit_streaming_surfaces_per_batch(spark, tmp_path):
    import pyspark.sql.types as T

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
        observed_audit,
    )

    spark.createDataFrame(
        [(1, 2.0), (2, 3.0)], "id long, amount double"
    ).coalesce(1).write.json(str(tmp_path / "in"))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amount", T.DoubleType())]
    )
    stream = spark.readStream.schema(schema).json(str(tmp_path / "in"))
    observed, name = observed_audit(stream, "stream_audit", value_col="amount")
    q = (
        observed.writeStream.format("memory")
        .queryName("obs_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    found = None
    for p in q.recentProgress:
        om = p.get("observedMetrics") or {}
        if "stream_audit" in om:
            found = om["stream_audit"]
    assert found is not None, "no observed metrics in any progress"
    assert found["n_rows"] == 2 and found["value_sum"] == 5.0


def test_profile_table_single_scan_and_values(spark):
    """profile_table: one scan feeds every column's stats, and the
    numbers are right on a frame with planted nulls/dups."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        "id int, tag string",
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["id"].total == 4 and prof["id"].nulls == 1
    assert prof["id"].n_distinct == 3
    assert prof["id"].min_value == "1" and prof["id"].max_value == "3"
    assert prof["tag"].nulls == 1 and prof["tag"].n_distinct == 2

    # numeric min/max must use NATIVE ordering before the string cast
    df2 = spark.createDataFrame([(9,), (10,)], "n int")
    p2 = profile_table(df2).collect()[0]
    assert p2.min_value == "9" and p2.max_value == "10"

    # single scan: exactly one parquet read in the registered query plan
    from dea05_e2e_kafka_streaming_pipeline_spark import queries as registry

    plan = (
        registry.queries()["profile_orders"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1

    # approx mode swaps the Expand-planning exact distinct for HLL
    prof_a = {r.col_name: r for r in profile_table(df, approx=True).collect()}
    assert prof_a["id"].n_distinct == 3  # HLL exact at tiny cardinality

"""Runtime-filter capability pins — the two optimizer features that keep
100 TB joins from shuffling (bloom-filter injection) or scanning
(dynamic partition pruning) data that cannot match. Both are session
defaults (session.py); these tests assert they actually fire on this
Spark build so a silent default change or a conf typo can't strand the
scale design.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_injected_on_shuffle_join(spark):
    """A shuffle join whose build side carries a selective filter must
    get a bloom filter of the build keys injected into the probe side
    (`might_contain(...)` in the optimized plan) — the probe scan then
    discards non-matching rows BEFORE the shuffle. Thresholds are
    lowered only because the toy tables are far below the production
    defaults (10 MB creation / 10 GB application)."""
    conf_keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    with _confs(spark, **conf_keys):
        lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        optimized = (
            joined._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "might_contain" in optimized, optimized[:2000]
        # and the result is still correct under the injected filter
        rows = joined.collect()
        assert len(rows) == 1 and rows[0]["n"] > 0


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A fact table partitioned on a join column, joined to a dim with a
    selective filter, must plan a `dynamicpruning` PartitionFilter — at
    scale the fact scan reads only partitions the filtered dim can
    reach, without the user writing the partition predicate."""
    fact_path = str(tmp_path / "orders_by_priority")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
        fact_path
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", "critical"), ("2-HIGH", "expedite")],
        ["priority", "tier"],
    ).filter(F.col("tier") == "critical")
    with _confs(
        spark,
        **{
            "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
            "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10.0",
        },
    ):
        joined = fact.join(
            dim, fact["o_orderpriority"] == dim["priority"]
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan, plan[:2000]
        n = joined.collect()[0]["n"]
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert n == urgent

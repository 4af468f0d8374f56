"""Gold-layer queries vs DuckDB oracle (driver-style comparison)."""

from dea05_e2e_kafka_streaming_pipeline_spark import queries as registry

from tests.conftest import SF_DIR, assert_matches_oracle


def test_daily_sales_matches_oracle(spark, duck):
    q = registry.queries()["daily_sales_by_region"]
    sql = registry.oracles()["daily_sales_by_region"]
    assert_matches_oracle(q(spark, SF_DIR), duck, sql)


def test_clv_matches_oracle(spark, duck):
    q = registry.queries()["customer_lifetime_value"]
    sql = registry.oracles()["customer_lifetime_value"]
    assert_matches_oracle(q(spark, SF_DIR), duck, sql)


def test_all_registered_queries_run_and_match(spark, duck):
    """Every registry entry with an oracle must hash-match — this is the
    same sweep the driver runs; keep it green as the registry grows."""
    qs = registry.queries()
    oracles = registry.oracles()
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert_matches_oracle(qs[name](spark, SF_DIR), duck, sql)

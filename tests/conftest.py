"""Shared test fixtures: one local SparkSession and a DuckDB oracle
comparator that mirrors the driver's correctness gate (row-count + schema
+ order-insensitive value comparison, exact — including floats, which is
deliberate: the engine's aggregation discipline must make float outputs
bit-reproducible across engines)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from dea05_e2e_kafka_streaming_pipeline_spark.schemas import TESTDATA_TABLES
from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything so dtype differences (int32 vs int64, date vs
    # datetime) don't mask value-level agreement — this approximates the
    # driver's value-hash
    out = df.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want)

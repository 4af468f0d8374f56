"""Canonical schemas for the engine's entities.

The reference declares (but inconsistently applies) explicit StructTypes for
its two entities (reference ``curated/data_quality.py:9-24``, duplicated in
``curated/dq_kafka.py:10-25``). This engine applies them everywhere —
Structured Streaming sources require explicit schemas, and schema-on-read
inference is a full-scan cost we never pay at 100 TB.

The Debezium CDC envelope schema is reconstructed from the writer schemas
embedded in the reference's Avro fixtures
(``testing/streaming.public.order.avro`` / ``...customers.avro``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Entity schemas (reference curated/data_quality.py:9-24)
# ---------------------------------------------------------------------------

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType(), True),
        T.StructField("order_date", T.TimestampType(), True),
        T.StructField("order_amount", T.DoubleType(), True),
        T.StructField("customer_id", T.IntegerType(), True),
        # pipeline-added processing-time stamp (ingestion layer)
        T.StructField("ingest_time", T.StringType(), True),
    ]
)

CUSTOMERS_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("customer_tenure_days", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Debezium CDC envelope (reference testing/*.avro embedded writer schemas;
# flattened at curated/dq_kafka.py:148-165)
# ---------------------------------------------------------------------------

# Per-entity `Value` payloads. Note the CDC dtype quirks the engine must
# handle: order_date arrives as io.debezium.time.Date = int32 days since
# epoch; order_amount as Avro bytes logical decimal(10,2).
CDC_ORDER_VALUE = T.StructType(
    [
        T.StructField("order_id", T.IntegerType(), True),
        T.StructField("order_date", T.IntegerType(), True),  # epoch days
        T.StructField("order_amount", T.DecimalType(10, 2), True),
        T.StructField("customer_id", T.IntegerType(), True),
    ]
)

CDC_CUSTOMER_VALUE = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("customer_tenure_days", T.IntegerType(), True),
    ]
)

_CDC_SOURCE = T.StructType(
    [
        T.StructField("version", T.StringType(), True),
        T.StructField("connector", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("snapshot", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("sequence", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("txId", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("xmin", T.LongType(), True),
    ]
)

_CDC_TRANSACTION = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("total_order", T.LongType(), True),
        T.StructField("data_collection_order", T.LongType(), True),
    ]
)


def cdc_envelope(value_schema: T.StructType) -> T.StructType:
    """Debezium envelope wrapping a per-entity ``Value`` payload."""
    return T.StructType(
        [
            T.StructField("before", value_schema, True),
            T.StructField("after", value_schema, True),
            T.StructField("source", _CDC_SOURCE, True),
            T.StructField("op", T.StringType(), True),  # c/u/d/r
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("transaction", _CDC_TRANSACTION, True),
        ]
    )


CDC_ORDERS_ENVELOPE = cdc_envelope(CDC_ORDER_VALUE)
CDC_CUSTOMERS_ENVELOPE = cdc_envelope(CDC_CUSTOMER_VALUE)

# ---------------------------------------------------------------------------
# Driver testdata schemas (TESTDATA.md / FIXTURES.md §4) — the TPC-H-ish
# star schema every oracle-checked query runs over.
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = (
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


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# events.parquet has shipped ``ts`` as TIMESTAMP(NANOS) in some driver
# testdata generations and TIMESTAMP(MICROS) in others; load_table sniffs
# the footer (pyarrow, driver-side metadata read — not a Spark job) and
# picks the matching schema. NANOS reads go through the session-wide
# ``spark.sql.legacy.parquet.nanosAsLong`` policy (session.py): the scan
# yields a LONG and load_table converts with integer division (ns exceeds
# double's 53-bit mantissa, so ``div``, never ``/``).
EVENTS_RAW_SCHEMA = _st(
    ("event_id", T.LongType()),
    ("ts", T.LongType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
)

# MICROS generations map straight onto Spark's native TimestampType.
EVENTS_TS_SCHEMA = _st(
    ("event_id", T.LongType()),
    ("ts", T.TimestampType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
)

# Explicit read schemas for every driver testdata table (column order =
# file order; types = exactly what footer inference yields) so scans
# never run the footer-inference job at plan-build time — a requirement
# of the zero-jobs-at-build registry contract (tests/test_plans.py) and
# the right default anyway: inference over a 100 TB prefix is a scan.
TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _st(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _st(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _st(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": EVENTS_RAW_SCHEMA,
    "documents": DOCUMENTS_SCHEMA,
    "embeddings": EMBEDDINGS_SCHEMA,
}

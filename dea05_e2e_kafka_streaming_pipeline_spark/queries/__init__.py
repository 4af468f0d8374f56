"""Query registry — the driver-facing catalog of every implemented operator.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle string DuckDB runs over the same
parquet tables (pre-registered views: region nation customer supplier part
orders lineitem events documents embeddings). Column names/aliases match
exactly — the driver sorts columns by name and hash-compares values.

Determinism rules applied throughout (so hashes can match at all):

- Monetary sums aggregate as DECIMAL(18,2) then cast to double in BOTH
  engines (order-insensitive exact sums; see plans/gold.py docstring).
- No ``current_timestamp``/``current_date`` in oracle-checked outputs;
  fixed literals replace wall-clock bounds.
- Ratios divide an exact decimal (cast to double) by an exact count —
  a single IEEE double op, identical in both engines.
"""

from __future__ import annotations

from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401
    QueryFn,
    audited_by,
    bench_exhibits,
    bench_queries,
    oracles,
    queries,
    register,
)

# family modules self-register on import; the order keeps the
# original registry sequence (first query stays the bench warmup)
from dea05_e2e_kafka_streaming_pipeline_spark.queries import core_sql  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import core_sql_2  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import cdc_lake  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import curation  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import misc_ops  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import stats  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import dedup_ann  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import text  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import quality  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import multimodal  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import sketches  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import incremental  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import graph  # noqa: F401,E402
from dea05_e2e_kafka_streaming_pipeline_spark.queries import linkage  # noqa: F401,E402

# tests reach shared helpers (incl. underscore names) through
# the package, exactly as they did through the old module
from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403,E402

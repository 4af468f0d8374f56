"""Scalar expression helpers (SURVEY §2.7 F1-F13).

Everything here is a pure Column expression — JVM-side, codegen'd, no
Python in the executor path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPOCH = "1970-01-01"


def epoch_day_to_date(col: Column | str) -> Column:
    """Debezium ``io.debezium.time.Date`` decode: int days-since-epoch →
    DATE (reference curated/dq_kafka.py:176-179 via
    ``expr("date_add('1970-01-01', order_date)")``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.lit(EPOCH).cast("date"), c.cast("int"))


def day_key(col: Column | str) -> Column:
    """Normalize a date/timestamp to the reference's ``yyyy-MM-dd`` string
    group key (reference daily_sales_aggregation.py:17)."""
    return F.date_format(col, "yyyy-MM-dd")


def money(col: Column | str) -> Column:
    """Cast a monetary value to the engine's exact aggregation type.

    Decimal partial sums are order-insensitive; double sums are not, and
    at cluster scale combine order is nondeterministic. See plans/gold.py.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def safe_div(num: Column, den: Column) -> Column:
    """Division that yields NULL (not error / inf) on zero denominator —
    the zero-guard the reference's DQ percentage math lacked
    (curated/data_quality.py:40-43)."""
    return F.when(den != 0, num / den)

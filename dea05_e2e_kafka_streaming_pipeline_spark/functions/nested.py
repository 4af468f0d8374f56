"""Nested-schema utilities: recursive struct flattening.

The reference's one flatten is CDC-specific (``after.*`` projection,
curated/dq_kafka.py:148-165 — see ``operators/cdc.py``); semi-
structured lake tables (JSON ingests, event ``props``, Debezium
payloads) need the general form: collapse arbitrarily nested structs
into scalar columns.

Flattening is a pure projection — Catalyst evaluates the nested field
accesses in the scan's projection, and parquet's columnar layout means
ONLY the referenced leaves are read (nested-schema pruning,
``spark.sql.optimizer.nestedSchemaPruning.enabled`` is on by default).
No shuffle, no UDF, works identically on batch and streaming frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["flatten_struct", "leaf_fields"]


def _q(name: str) -> str:
    """Backtick-quote a field name so dots inside a single field name
    survive the path expression."""
    return f"`{name}`"


def leaf_fields(
    schema: StructType,
    sep: str = "_",
    max_depth: int | None = None,
) -> list[tuple[str, str]]:
    """``(column.path, flat_name)`` pairs for every leaf reachable
    through struct nesting (depth-first, declaration order). Arrays
    and maps stop recursion — they stay whole at their depth (explode
    is a row-multiplying choice the caller makes deliberately, never
    silently). ``max_depth=0`` flattens nothing; ``None`` is
    unbounded."""
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        if isinstance(f.dataType, StructType) and (
            max_depth is None or max_depth >= 1
        ):
            inner = leaf_fields(
                f.dataType,
                sep=sep,
                max_depth=None if max_depth is None else max_depth - 1,
            )
            out.extend(
                (f"{_q(f.name)}.{path}", f"{f.name}{sep}{flat}")
                for path, flat in inner
            )
        else:
            out.append((_q(f.name), f.name))
    return out


def flatten_struct(
    df: DataFrame,
    sep: str = "_",
    max_depth: int | None = None,
) -> DataFrame:
    """Flatten every struct column (recursively, to ``max_depth``)
    into top-level scalar columns named by joining the path with
    ``sep``; non-struct columns pass through in declaration order.
    Collisions (two paths producing the same flat name) raise rather
    than silently shadow.

    A 100 TB note: prefer flattening IN THE QUERY over rewriting the
    table — the projection costs nothing at scan time (nested-schema
    pruning still reads only referenced leaves), while a materialized
    flatten loses parquet's nested-column statistics and doubles
    storage during the rewrite."""
    pairs = leaf_fields(df.schema, sep=sep, max_depth=max_depth)
    names = [flat for _, flat in pairs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"flatten_struct: flat-name collision(s) {sorted(dupes)}; "
            f"use a different sep or rename before flattening"
        )
    return df.select(*[F.col(path).alias(flat) for path, flat in pairs])

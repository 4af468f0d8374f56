"""Python user-defined TABLE functions (Spark 4 ``@udtf``) — the
one-row-in / many-typed-rows-out API.

The reference imports ``udf`` and never calls it (SURVEY §2.9:
``mage-programs/delta_metadata.py:2``); the engine's standing policy is
built-in expressions first, Arrow-vectorized pandas UDFs second, and
row-at-a-time Python — which a UDTF is — LAST, never on a 100 TB hot
path (every native explode/sequence/posexplode shape in this repo stays
native: chunking, frame plans, audio windows). A UDTF earns its place
when per-row output is variable-shaped AND the parse logic is genuinely
imperative — the canonical case being messy log/KV payload extraction
where regex-only SQL becomes unreadable. ``parse_kv_log`` is that
template, registered for both DataFrame and SQL use.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, value: string, position: int")
class ParseKVLog:
    """Explode a ``k=v k2=v2 ...`` log payload into one typed row per
    pair: ``(key, value, position)``. Tokens without ``=`` are skipped;
    values may contain ``=`` (split once, from the left); NULL/empty
    payloads yield no rows. Deterministic, so Catalyst may cache/reorder
    freely."""

    def eval(self, line: str):  # noqa: D102 (Spark UDTF contract)
        if not line:
            return
        for pos, tok in enumerate(line.split()):
            if "=" not in tok:
                continue
            k, v = tok.split("=", 1)
            if k:
                yield k, v, pos


def register_udtfs(spark) -> list[str]:
    """Register the module's UDTFs for SQL use (``SELECT ... FROM
    parse_kv_log(...)``); returns the registered names."""
    spark.udtf.register("parse_kv_log", ParseKVLog)
    return ["parse_kv_log"]

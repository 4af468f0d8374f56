"""Catalog / lake-management operators (SURVEY §2.1 S15-S18).

The reference registers lake tables in a metastore via SQL DDL
(``mage-programs/delta_metadata.py:99-107``: CREATE SCHEMA + CREATE TABLE
... USING <format> LOCATION) and inventories lake files with a hand-rolled
S3 paginator (``curated/crawler.py:50-88``). Here both are engine
operators:

- :func:`register_table` — the same DDL pattern over ``spark.sql``
  (works against the in-memory catalog locally and a Hive/Glue
  metastore in production unchanged).
- :func:`file_inventory` — distributed file metadata from
  ``input_file_name()`` instead of driver-side listing: one aggregate
  over the scan, no object-store pagination loop, works on any
  readable format.

Delta-specific history/time-travel (S18) needs delta-spark on the
classpath; :func:`delta_history` degrades with a clear error when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_table(
    spark: SparkSession,
    schema_name: str,
    table_name: str,
    path: str,
    fmt: str = "parquet",
) -> None:
    """CREATE SCHEMA IF NOT EXISTS + CREATE TABLE ... USING fmt LOCATION
    (reference delta_metadata.py:99-107, format generalized)."""
    spark.sql(f"CREATE SCHEMA IF NOT EXISTS {schema_name}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {schema_name}.{table_name} "
        f"USING {fmt} LOCATION '{path}'"
    )


def file_inventory(df: DataFrame) -> DataFrame:
    """Per-file row counts AND byte sizes for whatever scan backs
    ``df`` — the distributed replacement for the reference's S3 listing
    crawler, which pages the bucket and sums object sizes
    (curated/crawler.py:72-84). Sizes come from the hidden
    ``_metadata.file_size`` column: populated by the scan itself, zero
    extra I/O. One aggregate job; no driver-side pagination.

    Falls back to counts-only (``size_bytes`` NULL) when ``df`` is not
    directly backed by a file scan (e.g. after a join) — ``_metadata``
    is only resolvable on the scan relation."""
    try:
        base = df.select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("__size"),
        )
    except Exception:
        base = df.select(
            F.input_file_name().alias("file"),
            F.lit(None).cast("long").alias("__size"),
        )
    return (
        base.groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # constant per file; max() = the file's size
            F.max("__size").alias("size_bytes"),
        )
        .orderBy("file")
    )


def rowgroup_stats(
    spark: SparkSession,
    path: str,
    columns: list[str],
) -> DataFrame:
    """Zone-map collection — per-(file, row-group, column) min/max/null
    statistics straight from the parquet FOOTERS, the ANALYZE step that
    feeds data-skipping decisions (which files/row-groups can a
    predicate possibly match?) without touching data pages.

    Scale shape: the driver only LISTS the dataset (names, no I/O);
    footer decoding fans out as an Arrow ``mapInPandas`` over the file
    list, so a million-file lake reads a million footers across the
    cluster, ~8 KB each, embarrassingly parallel. This is how
    lakehouse table formats bootstrap their stats tables; on a single
    local file it degrades to one task.

    min/max surface as STRINGS (the cross-engine common form of footer
    statistics — DuckDB's ``parquet_metadata()`` does the same);
    numeric consumers cast back. Only leaf columns with stats are
    emitted.
    """
    import pyarrow.dataset as ds

    files = sorted(ds.dataset(path).files)
    cols = list(columns)

    def _read_footers(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        for batch in batches:
            out = []
            for fpath in batch["file"]:
                md = pq.ParquetFile(fpath).metadata
                name_to_idx = {
                    md.schema.column(i).path: i for i in range(md.num_columns)
                }
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    for col in cols:
                        chunk = row_group.column(name_to_idx[col])
                        st = chunk.statistics
                        if st is None:
                            continue
                        out.append(
                            {
                                "file_name": os.path.basename(fpath),
                                "row_group": rg,
                                "column": col,
                                "min_value": str(st.min) if st.has_min_max else None,
                                "max_value": str(st.max) if st.has_min_max else None,
                                "null_count": st.null_count,
                                "num_values": chunk.num_values,
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "file_name", "row_group", "column",
                    "min_value", "max_value", "null_count", "num_values",
                ],
            )

    schema = (
        "file_name string, row_group int, column string, "
        "min_value string, max_value string, null_count long, num_values long"
    )
    return (
        spark.createDataFrame([(f,) for f in files], "file string")
        .repartition(max(1, min(len(files), 64)))
        .mapInPandas(_read_footers, schema=schema)
    )


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """Delta transaction history (reference delta_metadata.py:114-116).
    Requires delta-spark; raises a clear error otherwise."""
    try:
        from delta.tables import DeltaTable  # type: ignore

        return DeltaTable.forPath(spark, path).history()
    except ImportError as exc:  # pragma: no cover - optional dependency
        raise RuntimeError(
            "Delta history needs the delta-spark package on the classpath"
        ) from exc


def pruned_parquet_scan(
    spark: SparkSession,
    path: str,
    column: str,
    lo=None,
    hi=None,
    value_type: str = "double",
) -> tuple[DataFrame, list[str], list[str]]:
    """DATA SKIPPING from the zone maps :func:`rowgroup_stats` collects:
    scan only the files whose footer [min, max] for ``column`` can
    intersect ``[lo, hi]`` (either bound may be None = unbounded).

    This is the manual form of what lakehouse table formats do with
    their stats tables — and the payoff of range-clustered layouts
    (``repartitionByRange``/Z-order writers in ``sinks``): on a table
    range-sorted by ``column``, a narrow predicate keeps O(1) of the
    files regardless of table size, BEFORE any Spark scan is planned.
    The stats pass is footer-metadata only (distributed, ~8 KB/file);
    the keep/drop decision is driver-side over one row per file. Files
    lacking stats for the column are conservatively KEPT, and the exact
    predicate is re-applied to the scan, so pruning can never change
    results — only skip I/O.

    ``value_type`` is the cast applied to the footer's string-form
    min/max before comparison ("double", "date", "string", ...);
    ``lo``/``hi`` must be of a comparable Python type.

    Returns ``(dataframe, kept_files, all_files)`` so callers (and
    tests) can observe the skip rate.
    """
    import os

    import pyarrow.dataset as ds

    def _cast(c: str):
        return F.col(c).cast(value_type)

    per_file = (
        rowgroup_stats(spark, path, [column])
        .groupBy("file_name")
        .agg(
            F.min(_cast("min_value")).alias("mn"),
            F.max(_cast("max_value")).alias("mx"),
            F.sum(
                F.when(
                    F.col("min_value").isNull() | F.col("max_value").isNull(), 1
                ).otherwise(0)
            ).alias("no_stats"),
        )
        .collect()
    )
    keep = set()
    for r in per_file:
        if r.no_stats or r.mn is None or r.mx is None:
            keep.add(r.file_name)  # unknown range: must scan
            continue
        if lo is not None and r.mx < lo:
            continue
        if hi is not None and r.mn > hi:
            continue
        keep.add(r.file_name)
    all_files = sorted(ds.dataset(path).files)
    kept = [f for f in all_files if os.path.basename(f) in keep]
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(column) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(column) <= F.lit(hi))
    if kept:
        df = spark.read.parquet(*kept).filter(pred)
    else:  # every file pruned: empty result with the table's schema
        df = spark.read.parquet(path).filter(F.lit(False))
    return df, kept, all_files


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Make the WHOLE engine surface reachable from RAW SQL: every
    driver testdata table becomes a temp view under its own name, plus
    the reference entity mappings as ``orders_entity`` /
    ``customers_entity`` (the bare names stay the raw TPC-H-ish
    tables). Views are metadata only — each query against them still
    plans straight to the pruned parquet scan. Returns the view names."""
    from dea05_e2e_kafka_streaming_pipeline_spark.schemas import TESTDATA_TABLES
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.entities import (
        load_customers,
        load_orders,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    names = []
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    load_orders(spark, sf_dir).createOrReplaceTempView("orders_entity")
    load_customers(spark, sf_dir).createOrReplaceTempView("customers_entity")
    return names + ["orders_entity", "customers_entity"]


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """SQL-string entry point: register the testdata + entity views,
    run one statement. A reference user's ad-hoc Spark SQL (or a BI
    tool speaking SQL) needs nothing but this call — same Catalyst
    plans as the DataFrame API, so every plan assertion in
    tests/test_plans.py holds for the SQL spelling too."""
    register_testdata_views(spark, sf_dir)
    return spark.sql(sql)


def small_files_report(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-files doctor: listing-only diagnosis of a lake prefix —
    file count, byte totals, size quartiles, the fraction of files
    under half the ``target_bytes`` (the classic driver/NameNode-
    pressure + scan-overhead symptom), and the file count a compaction
    to ``target_bytes`` would produce (what ``sinks.compact_parquet``
    then executes). Pure metadata: no data pages are read at any table
    size."""
    import pyarrow.dataset as ds
    import pyarrow.fs as pafs

    fs = pafs.LocalFileSystem()
    files = ds.dataset(path).files
    sizes = sorted(fs.get_file_info(f).size for f in files)
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "advice": "empty prefix"}
    total = sum(sizes)
    n = len(sizes)
    small = sum(1 for s in sizes if s < target_bytes // 2)
    ideal = max(1, -(-total // target_bytes))  # ceil div
    report = {
        "n_files": n,
        "total_bytes": total,
        "p25_bytes": sizes[n // 4],
        "median_bytes": sizes[n // 2],
        "p75_bytes": sizes[(3 * n) // 4],
        "small_file_fraction": round(small / n, 4),
        "ideal_file_count": ideal,
        "advice": (
            f"compact to ~{ideal} files of ~{target_bytes} B"
            if small / n > 0.5 and n > ideal * 2
            else "layout healthy"
        ),
    }
    return report

"""Data-quality validation suite.

Re-architecture of the reference's ``DataQualityValidator`` (defined three
times, near-identically: ``curated/data_quality.py:31-126``,
``curated/dq_kafka.py:34-133``, ``mage-programs/data_quality.py:40-150``)
with the same checks and the same fluent call shape, but a fundamentally
different execution plan:

**The reference runs one Spark job per column/rule** (a ``.filter().count()``
inside a loop — O(checks) full scans). **This engine folds every
completeness/accuracy/volume check into ONE aggregate job** over the input
(conditional-sum pattern), and each referential-integrity check into one
anti-join job. At 100 TB the difference is "12 scans" vs "1 scan + 1
broadcast anti-join".

Faithful semantics preserved:

- thresholds are strict ``<`` (PASS iff failure% < threshold), defaults
  5% nulls / 1% rule violations / 1% orphans
  (``curated/data_quality.py:48,67,86``) — here they are parameters.
- accuracy counts ``filter(~rule)`` rows: a row where the rule evaluates
  to NULL is *not* a violation (Spark filter semantics) — preserved via
  ``when(~rule, 1).otherwise(0)``.

Fixed (documented, deliberate): the reference divides by ``df.count()``
with no zero-guard (``curated/data_quality.py:40-43`` → ZeroDivisionError
on empty input); here empty input yields 0% failure and a PASS/volume
decision, not a crash.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLUMNS = (
    "check_type",
    "check_name",
    "total_rows",
    "failed_count",
    "failed_pct",
    "threshold_pct",
    "status",
)


@dataclass
class _AggCheck:
    check_type: str
    name: str
    fail_condition: Column  # 1 when the row FAILS the check
    threshold_pct: float


@dataclass
class _ConsistencyCheck:
    name: str
    dim: DataFrame
    key: str
    threshold_pct: float
    broadcast_dim: bool = True


@dataclass
class _VolumeCheck:
    name: str
    expected_min: int
    expected_max: int


class DataQualityValidator:
    """Fluent DQ check builder; ``report()`` executes everything in
    one aggregate job plus one anti-join job per consistency check.

    Usage (mirrors reference curated/data_quality.py:137-157)::

        report = (DataQualityValidator(orders)
                  .check_completeness(["order_id", "customer_id"])
                  .check_accuracy("positive_amount", F.col("order_amount") > 0)
                  .check_consistency("orders_customers", customers, "customer_id")
                  .check_volume(10_000, 50_000)
                  .report())
    """

    def __init__(self, df: DataFrame, name: str = "table"):
        self._df = df
        self._name = name
        self._agg_checks: list[_AggCheck] = []
        self._consistency: list[_ConsistencyCheck] = []
        self._volume: list[_VolumeCheck] = []

    # -- check builders (fluent, lazy) ------------------------------------

    def check_completeness(
        self, required_columns: list[str], threshold_pct: float = 5.0
    ) -> "DataQualityValidator":
        """Null-rate per required column (reference data_quality.py:36-53)."""
        for c in required_columns:
            self._agg_checks.append(
                _AggCheck("completeness", c, F.col(c).isNull(), threshold_pct)
            )
        return self

    def check_accuracy(
        self, rule_name: str, rule: Column, threshold_pct: float = 1.0
    ) -> "DataQualityValidator":
        """Violation-rate for an arbitrary Column predicate
        (reference data_quality.py:55-72). ``rule`` states validity;
        failures are rows where ``~rule`` holds."""
        self._agg_checks.append(_AggCheck("accuracy", rule_name, ~rule, threshold_pct))
        return self

    def check_consistency(
        self,
        check_name: str,
        dim: DataFrame,
        key: str,
        threshold_pct: float = 1.0,
        broadcast_dim: bool = True,
    ) -> "DataQualityValidator":
        """Referential integrity: % of rows whose ``key`` has no match in
        ``dim`` (reference data_quality.py:74-91, left-anti join).

        ``broadcast_dim=True`` (default) force-broadcasts the distinct
        dim-key set — right for real dimensions (the reference's
        customers dim has ≤50 keys). Pass ``False`` for fact-to-fact FK
        checks whose key set is unbounded: the marker join then falls
        back to whatever strategy AQE picks (shuffle join at scale),
        instead of OOMing the driver on an unbroadcastable build side."""
        self._consistency.append(
            _ConsistencyCheck(check_name, dim, key, threshold_pct, broadcast_dim)
        )
        return self

    def check_volume(
        self, expected_min: int, expected_max: int, name: str = "row_volume"
    ) -> "DataQualityValidator":
        """Row-count bounds (reference data_quality.py:93-106)."""
        self._volume.append(_VolumeCheck(name, expected_min, expected_max))
        return self

    # -- execution --------------------------------------------------------

    def report(self) -> DataFrame:
        """Long-format report DataFrame (one row per check).

        Physical shape: **one pass over the fact table**. Consistency
        checks become broadcast LEFT joins against the (distinct) dim
        keys with a hit-marker column, so orphan counting is just another
        conditional sum in the same aggregate as completeness/accuracy —
        no separate anti-join jobs, no second scan. One explode turns the
        1-row aggregate into the long-format report.
        """
        spark = self._df.sparkSession

        # Augment the fact side with one hit-marker per FK check. Dim keys
        # are deduplicated so the left join cannot fan out fact rows.
        aug = self._df
        for j, con in enumerate(self._consistency):
            dim_keys = (
                con.dim.select(F.col(con.key))
                .distinct()
                .withColumn(f"__dim{j}", F.lit(1))
            )
            if con.broadcast_dim:
                dim_keys = F.broadcast(dim_keys)
            aug = aug.join(dim_keys, con.key, "left")

        aggs = [F.count(F.lit(1)).cast("long").alias("__total")]
        for i, chk in enumerate(self._agg_checks):
            aggs.append(
                F.sum(F.when(chk.fail_condition, 1).otherwise(0))
                .cast("long")
                .alias(f"__c{i}")
            )
        for j, _con in enumerate(self._consistency):
            # NULL marker ⇔ no dim match ⇔ orphan (NULL fact keys never
            # match — same as the reference's left-anti semantics)
            aggs.append(
                F.sum(F.when(F.col(f"__dim{j}").isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"__k{j}")
            )
        base = aug.agg(*aggs)  # 1 row

        # All scan-side checks come off the single aggregate row via ONE
        # explode — no union of N copies of the aggregate subtree, no
        # reliance on physical exchange reuse.
        entries = []
        for i, chk in enumerate(self._agg_checks):
            entries.append(
                F.struct(
                    F.lit(chk.check_type).alias("check_type"),
                    F.lit(chk.name).alias("check_name"),
                    F.col("__total").alias("total_rows"),
                    F.col(f"__c{i}").alias("failed_count"),
                    self._pct(F.col(f"__c{i}"), F.col("__total")).alias("failed_pct"),
                    F.lit(float(chk.threshold_pct)).alias("threshold_pct"),
                )
            )
        for vol in self._volume:
            in_bounds = (F.col("__total") >= vol.expected_min) & (
                F.col("__total") <= vol.expected_max
            )
            entries.append(
                F.struct(
                    F.lit("volume").alias("check_type"),
                    F.lit(vol.name).alias("check_name"),
                    F.col("__total").alias("total_rows"),
                    F.when(in_bounds, F.lit(0)).otherwise(F.lit(1))
                    .cast("long")
                    .alias("failed_count"),
                    F.when(in_bounds, F.lit(0.0))
                    .otherwise(F.lit(100.0))
                    .alias("failed_pct"),
                    F.lit(100.0).alias("threshold_pct"),
                )
            )

        for j, con in enumerate(self._consistency):
            entries.append(
                F.struct(
                    F.lit("consistency").alias("check_type"),
                    F.lit(con.name).alias("check_name"),
                    F.col("__total").alias("total_rows"),
                    F.col(f"__k{j}").alias("failed_count"),
                    self._pct(F.col(f"__k{j}"), F.col("__total")).alias("failed_pct"),
                    F.lit(float(con.threshold_pct)).alias("threshold_pct"),
                )
            )

        if not entries:
            return spark.createDataFrame([], schema=self._empty_schema())

        out = base.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
        # strict-< threshold (reference semantics); volume uses failed_pct
        # ∈ {0,100} with threshold 100 so PASS iff in-bounds
        return out.withColumn(
            "status",
            F.when(F.col("failed_pct") < F.col("threshold_pct"), "PASS").otherwise(
                "FAIL"
            ),
        )

    @staticmethod
    def _pct(failed: Column, total: Column) -> Column:
        # zero-guard the reference lacked: empty table → 0.0%
        return F.when(
            total != 0, failed.cast("double") * 100.0 / total
        ).otherwise(F.lit(0.0))

    @staticmethod
    def _empty_schema():
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("check_type", T.StringType()),
                T.StructField("check_name", T.StringType()),
                T.StructField("total_rows", T.LongType()),
                T.StructField("failed_count", T.LongType()),
                T.StructField("failed_pct", T.DoubleType()),
                T.StructField("threshold_pct", T.DoubleType()),
                T.StructField("status", T.StringType()),
            ]
        )

    def summary(self) -> dict:
        """Driver-side report summary in the reference's shape
        (curated/data_quality.py:108-126): ``{"summary": {total_checks,
        passed, failed}, "details": [...]}`` — ready for any JSON sink.
        Collects only the tiny report, never the data."""
        rows = [r.asDict() for r in self.report().collect()]
        passed = sum(1 for r in rows if r["status"] == "PASS")
        return {
            "summary": {
                "total_checks": len(rows),
                "passed": passed,
                "failed": len(rows) - passed,
            },
            "details": rows,
        }

    def passed(self) -> bool:
        """True iff every check PASSes (drives the gate). Collects the
        tiny report — never the data."""
        rows = self.report().select("status").collect()
        return all(r.status == "PASS" for r in rows)

    def write_report(self, path: str) -> dict:
        """Land :meth:`summary` as one JSON object at ``path`` — the
        reference's report sink (curated/data_quality.py:118-125 puts
        the dict to object storage as a single JSON key; MinIO variant
        mage-programs/data_quality.py:131-147). Driver-side plain-file
        write: the report is O(checks) rows, never data-sized. Returns
        the summary dict it wrote."""
        import json
        import os

        summary = self.summary()
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "w") as f:
            json.dump(summary, f, indent=2, default=str)
        return summary

    def gate(
        self,
        curated_writer,
        quarantine_writer,
    ) -> bool:
        """The reference's write gate (curated/data_quality.py:169-175):
        all checks pass → ``curated_writer(df)``; any failure →
        ``quarantine_writer(df)``. Returns the pass/fail decision."""
        ok = self.passed()
        (curated_writer if ok else quarantine_writer)(self._df)
        return ok


def observed_audit(
    df: DataFrame,
    name: str = "audit",
    value_col: str | None = None,
):
    """Attach an ``observe`` audit to a DataFrame: row count, null-free
    row count of ``value_col`` (when given) and its exact decimal sum —
    collected as a side effect of whatever action runs downstream, with
    ZERO extra passes over the data (vs the reference's separate
    ``count()`` jobs per metric, curated/data_quality.py:32-45).

    Returns ``(df, handle)``. On batch DataFrames ``handle`` is a
    ``pyspark.sql.Observation`` — read ``handle.get`` after the first
    action. On streaming DataFrames metrics surface per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]`` and ``handle`` is
    the ``name`` string."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics += [
            F.count(value_col).alias("n_nonnull"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        ]
    if df.isStreaming:
        return df.observe(name, *metrics), name
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """ONE-SCAN column profiler (the Deequ/Glue-profiler shape the
    reference's DQ suite gestures at with its per-check jobs —
    reference curated/data_quality.py:37-39 runs a job per column; this
    runs one for the whole table): per column — row total, null count,
    distinct count, min and max (cast to string AFTER the native-type
    min/max, so numeric ordering is preserved).

    All per-column aggregates land in a single ``agg`` (one scan); the
    per-column reshape afterward is a zero-cost projection + explode of
    a one-row frame. ``approx=True`` swaps exact countDistinct (which
    plans an Expand — fine at audit scale, heavy at 100 TB) for
    approx_count_distinct's one-pass HLL sketch; exact is the default
    because it is the oracle-checkable form.
    """
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__total").alias("total"),
            (F.col("__total") - F.col(f"__nn_{c}")).alias("nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")

"""Incremental aggregate maintenance: merge algebra and equivalence
with one-shot aggregation."""

from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
    finalize_aggregate,
    incremental_update,
    merge_partials,
    partial_aggregate,
)

SPEC = [
    ("n", "v", "count"),
    ("total", "v", "sum"),
    ("mean", "v", "avg"),
    ("lo", "v", "min"),
    ("hi", "v", "max"),
]


def _rows(spark, data):
    return spark.createDataFrame(data, "k string, v double")


def _final(df):
    return {
        r.k: (r.n, r.total, r.mean, r.lo, r.hi)
        for r in finalize_aggregate(df, ["k"], SPEC).collect()
    }


def test_incremental_equals_one_shot(spark):
    data = [("a", 1.0), ("a", 2.5), ("b", 10.0), ("a", -3.0), ("c", 0.0)]
    full = partial_aggregate(_rows(spark, data), ["k"], SPEC)
    state = None
    for i in range(len(data)):  # one row per "batch" — worst-case folding
        state = incremental_update(state, _rows(spark, data[i : i + 1]), ["k"], SPEC)
    assert _final(state) == _final(full)


def test_merge_is_associative_and_handles_disjoint_groups(spark):
    p1 = partial_aggregate(_rows(spark, [("a", 1.0), ("b", 2.0)]), ["k"], SPEC)
    p2 = partial_aggregate(_rows(spark, [("b", 5.0), ("c", 7.0)]), ["k"], SPEC)
    p3 = partial_aggregate(_rows(spark, [("c", -1.0)]), ["k"], SPEC)
    left = merge_partials(merge_partials(p1, p2, ["k"], SPEC), p3, ["k"], SPEC)
    right = merge_partials(p1, merge_partials(p2, p3, ["k"], SPEC), ["k"], SPEC)
    assert _final(left) == _final(right)
    assert _final(left)["a"] == (1, 1.0, 1.0, 1.0, 1.0)  # group in one side only


def test_nulls_do_not_count(spark):
    df = spark.createDataFrame([("a", None), ("a", 4.0)], "k string, v double")
    state = partial_aggregate(df, ["k"], SPEC)
    n, total, mean, lo, hi = _final(state)["a"]
    assert (n, total, mean, lo, hi) == (1, 4.0, 4.0, 4.0, 4.0)


def test_unknown_kind_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown agg kind"):
        partial_aggregate(
            _rows(spark, [("a", 1.0)]), ["k"], [("x", "v", "median")]
        )


def test_incremental_gold_sink_streaming_matches_batch(spark, tmp_path):
    """Streaming materialized view: epoch-keyed partial-state dirs make
    replays idempotent; the merged read equals the one-shot batch
    aggregate bit-for-bit."""
    import pyspark.sql.functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.schemas import EVENTS_SCHEMA
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        incremental_gold_sink,
        read_incremental_gold,
    )

    from tests.conftest import SF_SMOKE

    keys, spec = ["event_type"], [
        ("total_value", "value", "sum"),
        ("n_events", "event_id", "count"),
        ("max_value", "value", "max"),
    ]
    events = load_table(spark, SF_SMOKE, "events")
    # land as two files -> two micro-batches
    for part, cond in enumerate(
        [F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1]
    ):
        events.filter(cond).write.mode("append").json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    state = str(tmp_path / "gold_state")
    q = incremental_gold_sink(
        stream, state, str(tmp_path / "ckpt"), keys, spec, available_now=True
    )
    assert q.awaitTermination(600)

    got = {
        r.event_type: (r.total_value, r.n_events, r.max_value)
        for r in read_incremental_gold(spark, state, keys, spec).collect()
    }
    want = {
        r.event_type: (r.total_value, r.n_events, r.max_value)
        for r in events.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("total_value"),
            F.count("event_id").alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want

    # replay idempotence: a re-run epoch re-derives the same partials
    # and OVERWRITES its own directory — simulate by rewriting epoch 0
    # with its current content (exactly what a foreachBatch replay does)
    replayed = spark.read.parquet(f"{state}/epoch=0").localCheckpoint()
    replayed.write.mode("overwrite").parquet(f"{state}/epoch=0")
    again = {
        r.event_type: (r.total_value, r.n_events, r.max_value)
        for r in read_incremental_gold(spark, state, keys, spec).collect()
    }
    assert again == want


def test_retractable_full_delete_removes_group(spark):
    """Deleting every row of a group removes the group from the state
    (exactly as a from-scratch GROUP BY would), and a group-changing
    update moves mass between groups without inventing or losing any."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_retractable,
        retractable_update,
        signed_cdc_facts,
    )

    base = spark.createDataFrame(
        [("c", None, None, "g1", 10.0), ("c", None, None, "g1", 20.0),
         ("c", None, None, "g2", 5.0)],
        "op string, before_grp string, before_v double, after_grp string, after_v double",
    )
    changes = spark.createDataFrame(
        [("d", "g2", 5.0, None, None),          # g2 fully deleted
         ("u", "g1", 10.0, "g3", 11.0)],        # group-changing update
        "op string, before_grp string, before_v double, after_grp string, after_v double",
    )
    ms = [("total", "v")]
    st = retractable_update(
        None, signed_cdc_facts(base, ["grp", "v"]), ["grp"], ms
    )
    st = retractable_update(
        st, signed_cdc_facts(changes, ["grp", "v"]), ["grp"], ms
    )
    got = {
        r.grp: (r.total, r.n_rows)
        for r in finalize_retractable(st, ["grp"], ms).collect()
    }
    assert got == {"g1": (20.0, 1), "g3": (11.0, 1)}


def test_retractable_equals_monoid_on_append_only(spark):
    """On an insert-only feed the abelian path and the monoid path
    agree: retractable sum/count == incremental_update sum/count."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_aggregate,
        finalize_retractable,
        incremental_update,
        retractable_update,
        signed_cdc_facts,
    )

    rows = [(i % 5, float(i) + 0.25) for i in range(200)]
    facts = spark.createDataFrame(rows, "grp int, v double")
    cdc = facts.select(
        F.lit("c").alias("op"),
        F.lit(None).cast("int").alias("before_grp"),
        F.lit(None).cast("double").alias("before_v"),
        F.col("grp").alias("after_grp"),
        F.col("v").alias("after_v"),
    )
    ms = [("total", "v")]
    ret = {
        r.grp: (r.total, r.n_rows)
        for r in finalize_retractable(
            retractable_update(
                None, signed_cdc_facts(cdc, ["grp", "v"]), ["grp"], ms
            ),
            ["grp"],
            ms,
        ).collect()
    }
    spec = [("total", "v", "sum"), ("n_rows", "v", "count")]
    mono = {
        r.grp: (r.total, r.n_rows)
        for r in finalize_aggregate(
            incremental_update(None, facts, ["grp"], spec), ["grp"], spec
        ).collect()
    }
    assert ret == mono


def test_retractable_gold_sink_kill_resume_and_replay_idempotent(spark, tmp_path):
    """The CDC materialized view across a kill: run 1 processes only
    the base-insert file, a 'crash' stops it, run 2 resumes from the
    checkpoint and applies the update/delete file. The final read
    equals the post-change GROUP BY, a fully-deleted group is gone,
    and re-writing an epoch's partials (the at-least-once replay case)
    changes nothing because the epoch dir is overwritten, not
    appended."""
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        read_retractable_gold,
        retractable_gold_sink,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )

    schema = StructType(
        [
            StructField("op", StringType()),
            StructField("before_grp", StringType()),
            StructField("before_v", DoubleType()),
            StructField("after_grp", StringType()),
            StructField("after_v", DoubleType()),
        ]
    )
    landing = tmp_path / "cdc"
    base = [("c", None, None, "g1", 10.0), ("c", None, None, "g1", 30.0),
            ("c", None, None, "g2", 5.0)]
    spark.createDataFrame(base, schema).write.mode("append").json(
        str(landing / "b0")
    )

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    cols, keys, ms = ["grp", "v"], ["grp"], [("total", "v")]

    def run_once():
        q = retractable_gold_sink(
            file_stream(
                spark, str(landing / "*"), schema, max_files_per_trigger=1
            ),
            state, ckpt, cols, keys, ms, available_now=True,
        )
        assert q.awaitTermination(600)

    run_once()  # run 1: base only, then "crash"
    mid = {
        r.grp: (r.total, r.n_rows)
        for r in read_retractable_gold(spark, state, keys, ms).collect()
    }
    assert mid == {"g1": (40.0, 2), "g2": (5.0, 1)}

    changes = [("d", "g2", 5.0, None, None),       # g2 fully deleted
               ("u", "g1", 10.0, "g3", 12.0)]      # moves g1 -> g3
    spark.createDataFrame(changes, schema).write.mode("append").json(
        str(landing / "b1")
    )
    run_once()  # run 2: resumes from checkpoint, applies only b1
    final = {
        r.grp: (r.total, r.n_rows)
        for r in read_retractable_gold(spark, state, keys, ms).collect()
    }
    assert final == {"g1": (30.0, 1), "g3": (12.0, 1)}

    # simulate the at-least-once replay: re-running with the same
    # landing files and a FRESH checkpoint rewrites epoch dirs with
    # identical content -> the read is unchanged
    import shutil

    shutil.rmtree(ckpt)
    run_once()
    again = {
        r.grp: (r.total, r.n_rows)
        for r in read_retractable_gold(spark, state, keys, ms).collect()
    }
    assert again == final


def test_retractable_value_only_update_batch_not_dropped(spark):
    """ADVICE r4 (high): a batch containing ONLY same-group value
    updates has count delta 0 but a non-zero sum delta. The stateless
    per-batch partial (state=None — exactly what retractable_gold_sink
    writes per epoch) must KEEP that group so the delta reaches the
    merge; dropping it silently loses the measure change."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_retractable,
        retractable_update,
        signed_cdc_facts,
    )

    schema = (
        "op string, before_grp string, before_v double, "
        "after_grp string, after_v double"
    )
    base = spark.createDataFrame(
        [("c", None, None, "g1", 10.0), ("c", None, None, "g1", 20.0)],
        schema,
    )
    # same-group value update only: count delta 0, sum delta +5
    upd = spark.createDataFrame(
        [("u", "g1", 10.0, "g1", 15.0)], schema
    )
    ms = [("total", "v")]

    part = retractable_update(
        None, signed_cdc_facts(upd, ["grp", "v"]), ["grp"], ms
    )
    # the stateless partial must carry the zero-count group
    rows = part.collect()
    assert len(rows) == 1 and rows[0]["__cnt"] == 0
    assert float(rows[0]["__total_sum"]) == 5.0

    st = retractable_update(
        None, signed_cdc_facts(base, ["grp", "v"]), ["grp"], ms
    )
    st = retractable_update(st, signed_cdc_facts(upd, ["grp", "v"]), ["grp"], ms)
    got = {
        r.grp: (r.total, r.n_rows)
        for r in finalize_retractable(st, ["grp"], ms).collect()
    }
    assert got == {"g1": (35.0, 2)}


def test_signed_cdc_snapshot_read_op_is_insert(spark):
    """ADVICE r4 (low): Debezium's initial-snapshot rows arrive with
    op='r' — they must sign +1 like inserts, not silently vanish."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        signed_cdc_facts,
    )

    cdc = spark.createDataFrame(
        [("r", None, None, "g1", 7.0), ("c", None, None, "g1", 3.0)],
        "op string, before_grp string, before_v double, "
        "after_grp string, after_v double",
    )
    got = sorted(
        (r.grp, r.v, r.sign)
        for r in signed_cdc_facts(cdc, ["grp", "v"]).collect()
    )
    assert got == [("g1", 3.0, 1), ("g1", 7.0, 1)]


def test_signed_cdc_unknown_op_raises(spark):
    """ADVICE r4 (low): an unrecognized op value is a contract
    violation — the job fails with the value in the message instead of
    silently dropping the change."""
    import pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        signed_cdc_facts,
    )

    cdc = spark.createDataFrame(
        [("c", None, None, "g1", 1.0), ("t", "g1", 1.0, None, None)],
        "op string, before_grp string, before_v double, "
        "after_grp string, after_v double",
    )
    signed = signed_cdc_facts(cdc, ["grp", "v"])
    with pytest.raises(Exception, match="unrecognized op"):
        signed.groupBy("grp").agg(F.sum("sign")).collect()


def _minmax_want(facts):
    """From-scratch GROUP BY min/max over the current fact rows."""
    want = {}
    for g, v in facts:
        lo, hi = want.get(g, (v, v))
        want[g] = (min(lo, v), max(hi, v))
    return want


def test_retractable_minmax_matches_recompute_under_deletes(spark):
    """r4 verdict item 5: min/max under deletion via bounded per-group
    value buffers. A delete-heavy CDC stream — including a storm that
    burns through ALL k runner-ups of one group (forcing the underflow
    rebuild) — must keep finalize == from-scratch GROUP BY after every
    step."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_retractable_minmax,
        minmax_state_from_base,
        retractable_minmax_update,
        signed_cdc_facts,
    )

    schema = (
        "op string, before_grp string, before_v double, "
        "after_grp string, after_v double"
    )
    k = 3
    facts = [("g1", float(v)) for v in (1, 2, 3, 4, 5, 6)] + [
        ("g2", 10.0), ("g2", 20.0), ("g2", 20.0)
    ]
    base_rows = facts[:]
    base = spark.createDataFrame(base_rows, "grp string, v double")
    state = minmax_state_from_base(base, ["grp"], "v", k=k)

    batches = [
        # delete STORM: g1 loses 1,2,3,4 — more than k=3 runner-ups on
        # the min side -> underflow -> rebuild from base
        [("d", "g1", 1.0, None, None), ("d", "g1", 2.0, None, None),
         ("d", "g1", 3.0, None, None), ("d", "g1", 4.0, None, None)],
        # duplicate-multiplicity delete: one of g2's two 20s goes; max
        # stays 20
        [("d", "g2", 20.0, None, None)],
        # update moves g2's min in place; insert new group g3
        [("u", "g2", 10.0, "g2", 15.0), ("c", None, None, "g3", 7.0)],
        # delete g2 entirely
        [("d", "g2", 15.0, None, None), ("d", "g2", 20.0, None, None)],
    ]
    for rows in batches:
        cdc = spark.createDataFrame(rows, schema)
        signed = signed_cdc_facts(cdc, ["grp", "v"])
        for op, bg, bv, ag, av in rows:
            if op in ("c", "r"):
                base_rows.append((ag, av))
            elif op == "d":
                base_rows.remove((bg, bv))
            else:
                base_rows.remove((bg, bv))
                base_rows.append((ag, av))
        base_after = spark.createDataFrame(base_rows, "grp string, v double")
        state = retractable_minmax_update(
            state, signed, base_after, ["grp"], "v", k=k
        ).localCheckpoint()
        got = {
            r.grp: (r.min_val, r.max_val)
            for r in finalize_retractable_minmax(state, ["grp"]).collect()
        }
        assert got == _minmax_want(base_rows), rows


def test_retractable_minmax_replay_is_idempotent(spark, tmp_path):
    """Epoch-layout recovery for the non-abelian path: state_N derives
    from state_{N-1} + batch_N and OVERWRITES its own directory, so an
    at-least-once replay of epoch N rewrites identical content."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_retractable_minmax,
        minmax_state_from_base,
        retractable_minmax_update,
        signed_cdc_facts,
    )

    schema = (
        "op string, before_grp string, before_v double, "
        "after_grp string, after_v double"
    )
    base = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g1", 3.0)], "grp string, v double"
    )
    s0 = str(tmp_path / "epoch=0")
    minmax_state_from_base(base, ["grp"], "v", k=2).write.parquet(s0)

    batch = spark.createDataFrame([("d", "g1", 1.0, None, None)], schema)
    base_after = spark.createDataFrame(
        [("g1", 2.0), ("g1", 3.0)], "grp string, v double"
    )

    def step():
        st = spark.read.parquet(s0)
        nxt = retractable_minmax_update(
            st, signed_cdc_facts(batch, ["grp", "v"]), base_after,
            ["grp"], "v", k=2,
        ).localCheckpoint()
        nxt.write.mode("overwrite").parquet(str(tmp_path / "epoch=1"))

    step()
    first = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "epoch=1")).collect()
    )
    step()  # replay: same inputs -> identical epoch content
    again = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "epoch=1")).collect()
    )
    assert first == again
    got = finalize_retractable_minmax(
        spark.read.parquet(str(tmp_path / "epoch=1")), ["grp"]
    ).collect()
    assert [(r.grp, r.min_val, r.max_val) for r in got] == [("g1", 2.0, 3.0)]

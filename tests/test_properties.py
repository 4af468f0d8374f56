"""Property-based tests (hypothesis): asof_join and apply_cdc_changes
checked against tiny Python reference models on randomized inputs.
Example counts are kept low — each example is a Spark job."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join
from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import (
    apply_cdc_changes,
    normalize_cdc,
)
from dea05_e2e_kafka_streaming_pipeline_spark.schemas import CDC_ORDERS_ENVELOPE

BASE = dt.datetime(2024, 1, 1)


def _t(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200)),  # (key, minute)
        min_size=1,
        max_size=12,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200), st.integers(0, 999)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: (r[0], r[1]),  # unique (key, ts): determinism contract
    ),
)
def test_asof_join_matches_model(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, k, _t(m)) for i, (k, m) in enumerate(lefts)],
        "row_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, _t(m), float(v)) for k, m, v in rights],
        "user_id long, ts timestamp, value double",
    ) if rights else spark.createDataFrame([], "user_id long, ts timestamp, value double")

    got = {
        r.row_id: (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            value_cols=["value"],
        ).collect()
    }
    assert set(got) == set(range(len(lefts)))
    for i, (k, m) in enumerate(lefts):
        cands = [(rm, rv) for rk, rm, rv in rights if rk == k and rm <= m]
        want = max(cands) if cands else None
        if want is None:
            assert got[i] == (None, None), (i, got[i])
        else:
            assert got[i] == (_t(want[0]), float(want[1])), (i, got[i], want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    changes=st.lists(
        st.tuples(
            st.integers(1, 4),          # key
            st.sampled_from(["c", "u", "d"]),
            st.integers(0, 100),        # order_date payload
        ),
        min_size=0,
        max_size=15,
    ),
)
def test_cdc_merge_matches_fold_model(spark, changes):
    """Applying a change batch must equal folding the changes in ts
    order over the initial snapshot (ties impossible: ts = index)."""
    target_rows = [(1, 10, None, 1), (2, 20, None, 2)]
    target = spark.createDataFrame(
        target_rows,
        "order_id int, order_date int, order_amount decimal(10,2), customer_id int",
    )
    env_rows = []
    for ts, (key, op, payload) in enumerate(changes):
        if op == "d":
            env_rows.append(((key, payload, None, 1), None, None, "d", ts, None))
        else:
            env_rows.append((None, (key, payload, None, 1), None, op, ts, None))
    envelope = spark.createDataFrame(env_rows, CDC_ORDERS_ENVELOPE) if env_rows else (
        spark.createDataFrame([], CDC_ORDERS_ENVELOPE)
    )
    merged = apply_cdc_changes(
        target, normalize_cdc(envelope, keep_meta=True, drop_deletes=False), "order_id"
    )
    got = {r.order_id: r.order_date for r in merged.collect()}

    state = {k: d for k, d, _, _ in target_rows}
    for key, op, payload in changes:  # list order == ts order
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = payload
    assert got == state


# ---------------------------------------------------------------------------
# Connected components: star contraction ≡ label propagation ≡ union-find
# ---------------------------------------------------------------------------


def _uf_components(n_nodes, edges):
    """Driver-side union-find reference model."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 23), st.integers(0, 23)),
        min_size=0,
        max_size=30,
    ),
)
def test_cc_star_matches_label_and_model(spark, edges):
    """Both distributed CC algorithms must agree with the union-find
    model (and hence each other) on random graphs — including self
    loops, duplicate edges, and isolated nodes."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
        connected_components,
    )

    n = 24
    nodes = spark.range(n).selectExpr("id AS doc_id")
    pair_rows = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    pairs = (
        spark.createDataFrame(pair_rows, "id_a long, id_b long")
        if pair_rows
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    want = _uf_components(n, pair_rows)
    for algo in ("label", "star"):
        got = {
            r.doc_id: r.component_id
            for r in connected_components(nodes, pairs, algorithm=algo).collect()
        }
        assert got == want, f"{algo}: {got} != {want}"


def test_cc_star_long_chain(spark):
    """A 40-node path graph: the worst case for label propagation
    (diameter rounds) and exactly where star contraction's O(log²)
    bound matters. Both must produce one component rooted at 0 — star
    within far fewer than diameter iterations."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
        connected_components,
    )

    n = 40
    nodes = spark.range(n).selectExpr("id AS doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = connected_components(nodes, pairs, algorithm="star", max_iterations=10)
    assert {r.component_id for r in got.collect()} == {0}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 9), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    chunk_tokens=st.integers(2, 5),
)
def test_dedup_chunks_model(spark, docs, chunk_tokens):
    """dedup_chunks against a direct python model: same chunking, same
    first-occurrence-wins keep set, same reassembly — for arbitrary
    corpora including heavy duplication."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dedup_chunks,
    )

    texts = {i: " ".join(f"t{v}" for v in toks) for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.total_chunks, r.kept_chunks, r.dedup_text)
        for r in dedup_chunks(df, chunk_tokens=chunk_tokens).collect()
    }

    # model: chunk, first-occurrence-wins in (doc_id, chunk_id) order
    seen: set[str] = set()
    model: dict[int, tuple[int, int, str]] = {}
    for doc_id in sorted(texts):
        toks = texts[doc_id].split()
        chunks = [
            " ".join(toks[i : i + chunk_tokens])
            for i in range(0, len(toks), chunk_tokens)
        ] or [""]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        model[doc_id] = (
            len(chunks),
            len(kept),
            " ".join(kept),
        )
    assert got == model


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    pcts=st.tuples(st.integers(1, 98), st.integers(1, 1)),
)
def test_assign_splits_partition_property(spark, keys, pcts):
    """Split labels partition the input: every row gets exactly one
    label, labels only from the configured set, and the assignment is
    a pure function of the key (duplicated keys agree)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        assign_splits,
    )

    train_pct, valid_pct = pcts
    splits = {
        "train": train_pct,
        "valid": valid_pct,
        "test": 100 - train_pct - valid_pct,
    }
    df = spark.createDataFrame([(k,) for k in keys * 2], "doc_id long")
    rows = assign_splits(df, splits=splits).collect()
    assert len(rows) == 2 * len(keys)
    by_key: dict[int, set] = {}
    for r in rows:
        by_key.setdefault(r.doc_id, set()).add(r.split)
    assert all(len(v) == 1 for v in by_key.values())
    assert set().union(*by_key.values()) <= set(splits)


# ---------------------------------------------------------------------------
# Avro round trip (pure Python — no Spark jobs, so examples are cheap)
# ---------------------------------------------------------------------------

_AVRO_PROP_SCHEMA = {
    "type": "record",
    "name": "Prop",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "b", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
        {"name": "props", "type": {"type": "map", "values": "string"}},
    ],
}

_avro_record = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "f": st.floats(width=32, allow_nan=False),
        "d": st.floats(allow_nan=False),
        "s": st.none() | st.text(max_size=40),
        "b": st.binary(max_size=40),
        "flag": st.booleans(),
        "tags": st.lists(st.integers(-(2**31), 2**31), max_size=8),
        "props": st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=5),
    }
)


@settings(max_examples=200, deadline=None)
@given(records=st.lists(_avro_record, max_size=20), deflate=st.booleans())
def test_avro_write_read_identity(records, deflate):
    """encode→decode is the identity for arbitrary records under the
    supported schema subset, both codecs, any block framing."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources import avro_lite

    buf = avro_lite.write_avro_bytes(
        _AVRO_PROP_SCHEMA,
        records,
        codec="deflate" if deflate else "null",
        block_records=7,
    )
    schema, back = avro_lite.read_avro_bytes(buf)
    assert schema == _AVRO_PROP_SCHEMA
    assert back == records


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=-(2**63), max_value=2**63 - 1),
)
def test_avro_zigzag_varint_identity(n):
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.avro_lite import (
        _Reader,
        _Writer,
    )

    w = _Writer()
    w.long(n)
    assert _Reader(w.getvalue()).long() == n


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=20,
    )
)
def test_zorder_key_matches_python_morton(spark, pts):
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.layout import zorder_key

    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.zval
        for r in df.select("x", "y", zorder_key(["x", "y"])).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in set(pts)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    )
)
def test_triangle_counts_match_bruteforce_model(spark, edges):
    """Degree-oriented counting == brute-force enumeration over all
    vertex triples, for random multigraphs with self-loops and
    duplicate/reversed edges (all of which must be canonicalized away)."""
    from itertools import combinations

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    verts = {v for e in eset for v in e}
    want = {}
    for a, b, c in combinations(sorted(verts), 3):
        if {(a, b), (b, c), (a, c)} <= eset:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1

    df = spark.createDataFrame(
        list(edges) or [(0, 0)], "src long, dst long"
    )
    got = {r.v: r.triangles for r in triangle_counts(df).collect()}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),  # block
            st.sampled_from(["ann", "bob", "cyd"]),
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_blocked_linkage_matches_python_scoring(spark, rows):
    """Engine pair scores == a per-pair Python fold of the same match
    points (NULL-neutral), over every same-block id-ordered pair."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        FieldComparison,
        blocked_linkage,
        exact,
        within,
    )

    data = [(i, str(b), n, a) for i, (b, n, a) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, blk string, name string, age double")
    cmps = [
        FieldComparison("name", "name", "name", exact, 11, -3),
        FieldComparison("age", "age", "age", within(5.0), 7, -13),
    ]
    got = {
        (r.left_id, r.right_id): r.score
        for r in blocked_linkage(
            df, df, ["blk"], cmps, "id", "id",
            min_score=-10**9, dedup_self_pairs=True,
        ).collect()
    }
    want = {}
    for i, bi, ni, ai in [(d[0], d[1], d[2], d[3]) for d in data]:
        for j, bj, nj, aj in [(d[0], d[1], d[2], d[3]) for d in data]:
            if i < j and bi == bj:
                s = 11 if ni == nj else -3  # names never NULL here
                if ai is None or aj is None:
                    s += 0
                else:
                    s += 7 if abs(ai - aj) <= 5.0 else -13
                want[(i, j)] = s
    assert got == want


def test_containment_dominates_jaccard(spark):
    """For every pair, containment >= Jaccard (min(n_a,n_b) <= union):
    checked on the real corpus by joining the two operators' outputs at
    threshold 0."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    import pyspark.sql.functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    j = ngram_jaccard_pairs(docs, threshold=0.0)
    c = ngram_containment_pairs(docs, threshold=0.0)
    both = j.join(c, ["id_a", "id_b"], "inner")
    assert both.count() == j.count() == c.count()  # same pair space
    assert both.filter(F.col("containment") < F.col("jaccard")).count() == 0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(2, 4),
)
def test_kcore_is_fixpoint_and_matches_reference_peel(spark, edges, k):
    """k_core on random graphs: (a) every returned vertex has
    core_degree >= k; (b) the result IS a fixpoint (degrees recomputed
    over the induced subgraph don't change); (c) membership matches a
    driver-side reference peel."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import k_core

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r.core_degree for r in k_core(e, k=k).collect()}
    assert all(d >= k for d in got.values())

    # reference peel over the canonical undirected simple graph
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for n in adj[v]:
                adj[n].discard(v)
            del adj[v]
            changed = True
    want = {v: len(ns) for v, ns in adj.items() if ns}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    arms=st.lists(
        st.lists(
            st.tuples(st.integers(0, 20), st.floats(0, 10, allow_nan=False)),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=3,
    ),
    k=st.integers(1, 10),
)
def test_rrf_fuse_matches_reference_arithmetic(spark, arms, k):
    """rrf_fuse on random bounded rankings must reproduce the
    driver-computed reciprocal-rank fusion exactly (ranks by the input
    score desc then id; absent arm contributes 0; top-k by fused score
    then id)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.similarity import (
        rrf_fuse,
    )

    dfs = [
        (
            spark.createDataFrame(arm, "doc_id long, score double"),
            "doc_id",
            "score",
        )
        for arm in arms
    ]
    got = [
        (r.id, r.rrf_score)
        for r in rrf_fuse(dfs, k=k, c=60).collect()
    ]

    ranks: list[dict[int, int]] = []
    for arm in arms:
        ordered = sorted(arm, key=lambda t: (-t[1], t[0]))
        ranks.append({doc: i + 1 for i, (doc, _) in enumerate(ordered)})
    ids = {doc for arm in arms for doc, _ in arm}
    fused = {
        doc: round(sum(1.0 / (60 + rk[doc]) for rk in ranks if doc in rk), 6)
        for doc in ids
    }
    want = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:k]
    assert got == want

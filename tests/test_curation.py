"""Corpus-curation operators: semantics on crafted inputs + plan-shape
guarantees (the per-document operators must compile to shuffle-free
projections)."""

from __future__ import annotations

import pytest

from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
    hash_sample,
    ngram_contamination,
    stratified_sample,
    vocab_topk,
    with_pii_redaction,
    with_quality_rules,
    with_repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_rules_flags(spark):
    df = _docs(
        spark,
        [
            # passes everything: >=10 words incl 2 stopwords, sane lengths
            (1, "the quick brown fox jumps over and over the lazy sleeping dog"),
            (2, "too short"),  # fails word count + stopword floor
            (3, "### ## # " + "the and word " * 5),  # symbol-heavy
        ],
    )
    out = {r.doc_id: r for r in with_quality_rules(df).collect()}
    assert out[1].passes_quality == 1
    assert out[2].rule_word_count == 0 and out[2].passes_quality == 0
    assert out[3].rule_symbol_ratio == 0 and out[3].passes_quality == 0
    # metrics sanity
    assert out[1].n_words == 12
    assert out[1].distinct_stopwords >= 2


def test_repetition_stats_values(spark):
    df = _docs(spark, [(1, "a a a b"), (2, "w x y z")])
    out = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    assert out[1].top_token_ratio == 0.75
    # 2-grams of (a,a,a,b): "a a","a a","a b" -> 2 distinct of 3
    assert out[1].dup_2gram_ratio == round(1 - 2 / 3, 6)
    assert out[2].top_token_ratio == 0.25
    assert out[2].dup_2gram_ratio == 0.0


def test_contamination_hits_and_misses(spark):
    docs = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, "totally different words here")],
    )
    bench = _docs(spark, [(99, "alpha beta gamma epsilon")])
    out = {r.doc_id: r for r in ngram_contamination(docs, bench, n=3).collect()}
    # doc1 3-grams: "alpha beta gamma", "beta gamma delta" -> 1 contaminated
    assert out[1].total_ngrams == 2 and out[1].contaminated_ngrams == 1
    assert out[1].contamination_ratio == 0.5
    assert out[2].contaminated_ngrams == 0 and out[2].contamination_ratio == 0.0


def test_hash_sample_deterministic_and_bounded(spark):
    df = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    s1 = sorted(r.doc_id for r in hash_sample(df, "doc_id", pct=10).collect())
    s2 = sorted(r.doc_id for r in hash_sample(df, "doc_id", pct=10).collect())
    assert s1 == s2 and 0 < len(s1) < 200
    assert hash_sample(df, "doc_id", pct=0).count() == 0
    assert hash_sample(df, "doc_id", pct=100).count() == 200
    # salt decorrelates
    s3 = sorted(r.doc_id for r in hash_sample(df, "doc_id", pct=10, salt="x").collect())
    assert s3 != s1
    with pytest.raises(ValueError, match="pct"):
        hash_sample(df, "doc_id", pct=101)


def test_stratified_sample_sizes(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", "doc_id", n_per_stratum=10)
    sizes = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {"en": 10, "de": 10}
    # stratum smaller than n: keep all of it
    tiny = spark.createDataFrame([(1, "fr"), (2, "fr")], "doc_id long, lang string")
    assert stratified_sample(tiny, "lang", "doc_id", n_per_stratum=10).count() == 2
    # deterministic
    a = sorted((r.lang, r.doc_id) for r in out.collect())
    b = sorted(
        (r.lang, r.doc_id)
        for r in stratified_sample(df, "lang", "doc_id", n_per_stratum=10).collect()
    )
    assert a == b


def test_pii_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob@corp.example.com or 10.1.2.3 card 4111222233334444 ok"),
            (2, "clean text with plain words and the number 42"),
        ],
    )
    out = {r.doc_id: r for r in with_pii_redaction(df).collect()}
    assert out[1].n_email == 1 and out[1].n_ipv4 == 1 and out[1].n_long_digits == 1
    assert out[1].text_redacted == "mail <EMAIL> or <IP> card <NUMBER> ok"
    assert out[2].n_email == out[2].n_ipv4 == out[2].n_long_digits == 0
    assert out[2].text_redacted == out[2].text


def test_vocab_topk_order_and_ties(spark):
    df = _docs(spark, [(1, "b b a a c"), (2, "a b z")])
    out = [(r.tok, r.term_freq, r.doc_freq) for r in vocab_topk(df, k=3).collect()]
    # a:3 in 2 docs, b:3 in 2 docs (tie -> token asc), c:1/z:1 -> 'c' wins tie
    assert out == [("a", 3, 2), ("b", 3, 2), ("c", 1, 1)]


def test_per_row_curation_ops_are_shuffle_free(spark):
    """quality rules / repetition / PII are projections: no Exchange in
    the optimized plan — the property that makes them free at 100 TB."""
    df = _docs(spark, [(1, "some text here")])
    for op in (with_quality_rules, with_repetition_stats, with_pii_redaction):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{op.__name__} shuffles:\n{plan}"


def test_contamination_broadcast_tristate_plans(spark):
    """broadcast_benchmark: True must broadcast the benchmark side,
    False must pin the join to sort-merge (the forbid path)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        ngram_contamination,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(20)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "iota kappa lambda")],
        "doc_id long, text string",
    )
    forced = ngram_contamination(docs, bench, broadcast_benchmark=True)
    plan_t = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_t
    forbidden = ngram_contamination(docs, bench, broadcast_benchmark=False)
    plan_f = forbidden._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_f


def test_chunk_documents_semantics(spark):
    """Chunk windows: stride = chunk_tokens - overlap, last chunk may be
    short, every non-empty doc yields >= 1 chunk, consecutive chunks
    overlap by exactly `overlap` tokens, and concatenating the
    non-overlapped heads reconstructs the document."""
    import pytest as _pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        chunk_documents,
    )

    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame(
        [(0, " ".join(words)), (1, "only three words"), (2, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=10, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # whitespace-only doc dropped
    # doc 0: 25 tokens, stride 6 → ceil((25-4)/6) = 4 chunks
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in c0] == [0, 1, 2, 3]
    assert all(r.n_chunks == 4 for r in c0)
    assert c0[0].chunk_text.split() == words[0:10]
    assert c0[1].chunk_text.split() == words[6:16]
    assert c0[3].chunk_text.split() == words[18:25]  # short tail
    assert c0[3].n_chunk_tokens == 7
    # overlap property
    for a, b in zip(c0, c0[1:]):
        assert a.chunk_text.split()[-4:] == b.chunk_text.split()[:4]
    # single short chunk for the 3-token doc
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tokens == 3
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_mixture_sample_rates_and_determinism(spark):
    """Per-source keep-rates: 100% sources keep everything, 0% / default
    drop everything, intermediate rates land near the target, and the
    pick is identical across runs."""
    import pytest as _pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        mixture_sample,
    )

    rows = [(i, ["keep", "half", "drop", "tail"][i % 4]) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"keep": 100, "half": 50, "drop": 0}
    out = mixture_sample(df, rates).collect()
    by_src = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src["keep"] == 500
    assert "drop" not in by_src and "tail" not in by_src  # default_pct=0
    assert 200 <= by_src["half"] <= 300  # ~50% of 500
    again = mixture_sample(df, rates).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)
    with _pytest.raises(ValueError, match="rate"):
        mixture_sample(df, {"keep": 101})


def test_apply_dedup_cc_quality_representative(spark):
    """quality_col keeps the best-scoring member per cluster (id
    tiebreak), min-id policy unchanged when quality_col is None."""
    import pyspark.sql.functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
        apply_dedup_cc,
    )

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1)],
        "doc_id long, quality_score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )  # {1,2,3} one cluster, {10} singleton
    best = apply_dedup_cc(docs, pairs, quality_col="quality_score")
    assert sorted(r.doc_id for r in best.collect()) == [2, 10]  # 0.9 tie -> min id 2
    minid = apply_dedup_cc(docs, pairs)
    assert sorted(r.doc_id for r in minid.collect()) == [1, 10]


def test_dedup_chunks_drops_shared_boilerplate(spark):
    """A boilerplate window shared by every document survives only in
    the first document (by doc_id order); unique prose is untouched;
    a document that is ALL boilerplate comes back empty with
    kept_chunks = 0."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dedup_chunks,
    )

    boiler = " ".join(f"b{i}" for i in range(4))  # one full 4-token chunk
    uniq = {d: " ".join(f"u{d}_{i}" for i in range(4)) for d in (1, 2)}
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + uniq[1]),  # chunks: [boiler, uniq1]
            (2, boiler + " " + uniq[2]),  # boiler duplicated -> dropped
            (3, boiler),  # all boilerplate -> empty
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_chunks(docs, chunk_tokens=4).collect()
    }
    assert out[1].kept_chunks == 2 and out[1].dedup_text == boiler + " " + uniq[1]
    assert out[2].kept_chunks == 1 and out[2].dedup_text == uniq[2]
    assert out[3].kept_chunks == 0 and out[3].dedup_text == ""
    assert out[3].total_chunks == 1 and out[1].kept_tokens == 8


def test_assign_splits_fractions_and_determinism(spark):
    """98/1/1 split: labels partition the corpus, assignment is stable
    across repartitioning, and bad percentages are rejected."""
    import pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        assign_splits,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    out = assign_splits(docs).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert set(counts) <= {"train", "valid", "test"}
    assert counts["train"] > counts.get("valid", 0) + counts.get("test", 0)
    # repartition-stable: same assignment regardless of layout
    a = {r.doc_id: r.split for r in assign_splits(docs).collect()}
    b = {
        r.doc_id: r.split
        for r in assign_splits(docs.repartition(13)).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        assign_splits(docs, splits={"train": 90, "valid": 5})


def test_bpe_train_matches_python_model(spark):
    """BPE merge table against a direct python reference on a tiny
    corpus with known merge order (ties broken lexicographically)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import bpe_train

    corpus = ["low low low lower lowest", "new newer newest low"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(df, n_merges=5).collect()
    ]

    # python model: word-frequency BPE with greedy left-to-right merges
    from collections import Counter

    words = Counter(w for t in corpus for w in t.split())
    vocab = {w: list(w) for w in words}
    model = []
    for rank in range(1, 6):
        pair_counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += words[w]
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        model.append((rank, l, r, l + r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert got == model


def test_html_strip_known_document(spark):
    """Every rule on one crafted document: script payload dropped,
    comment dropped, tags counted and stripped, entities decoded,
    whitespace collapsed."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        with_html_stripped,
    )

    html = (
        '<html><head><style>.x{color:red}</style>'
        "<script>var hidden = 'SECRET';</script></head>"
        "<body><h1>Hello</h1><!-- chrome -->"
        '<p class="a">A &amp; B &lt;ok&gt; &quot;q&quot; &nbsp;end</p>'
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "plain text")], "id int, text string")
    rows = {r.id: r for r in with_html_stripped(df).collect()}
    assert rows[1].text_clean == 'Hello A & B <ok> "q" end'
    assert "SECRET" not in rows[1].text_clean  # script payload gone
    # tags counted after block removal: html,head,/head,body,h1,/h1,p,/p,/body,/html
    assert rows[1].n_tags == 10
    assert rows[2].text_clean == "plain text" and rows[2].n_tags == 0


def test_dictionary_encode_known_corpus(spark):
    """Ids follow the (count desc, token asc) total order; OOV maps to
    0; positions preserved; empty docs keep empty sequences."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dictionary_encode,
    )

    df = spark.createDataFrame(
        [
            (1, "b b b a a c"),
            (2, "a b zz"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dictionary_encode(df, vocab_size=2).collect()}
    # counts: b=4, a=3, c=1, zz=1 → vocab: b→1, a→2; c/zz OOV→0
    assert rows[1].ids == [1, 1, 1, 2, 2, 0]
    assert rows[1].n_tokens == 6 and rows[1].n_oov == 1
    assert rows[2].ids == [2, 1, 0] and rows[2].n_oov == 1
    assert rows[3].ids == [] and rows[3].n_tokens == 0 and rows[3].n_oov == 0


def test_bigram_surprisal_detects_scrambled_transitions(spark):
    """A document whose unigrams match the corpus but whose TRANSITIONS
    are scrambled must score higher bigram surprisal than the
    well-formed repetition of the dominant pattern."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        bigram_surprisal,
    )

    normal = "the cat sat on the mat " * 10
    scrambled = "mat the on sat cat the " * 10
    df = spark.createDataFrame(
        [(1, normal), (2, normal), (3, normal), (4, scrambled), (5, "one")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    assert 5 not in rows  # single-token doc: no bigram
    assert rows[4].surprisal_nats > rows[1].surprisal_nats
    assert rows[1].surprisal_nats == rows[2].surprisal_nats  # identical docs


def test_systematic_pps_sample_properties(spark):
    """PPS invariants: ticket counts per group sum exactly to n; every
    row heavier than one grid step is a certainty selection; output is
    repartition-stable (deterministic, no rand())."""
    import pyspark.sql.functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        systematic_pps_sample,
    )

    rows = [(i, "a" if i < 30 else "b", (i % 7 + 1) * 10) for i in range(50)]
    rows.append((99, "b", 100000))  # dominates group b -> certainty multi-ticket
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    out = systematic_pps_sample(
        df, weight_col="n_chars", group_col="source", n_per_group=10
    )
    per_group = {
        r.source: r.t
        for r in out.groupBy("source").agg(F.sum("n_tickets").alias("t")).collect()
    }
    assert per_group == {"a": 10, "b": 10}
    heavy = out.filter(F.col("doc_id") == 99).collect()[0]
    assert heavy.n_tickets >= 9  # ~all of group b's weight

    re = systematic_pps_sample(
        df.repartition(13, "doc_id"),
        weight_col="n_chars",
        group_col="source",
        n_per_group=10,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, re.collect()))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        systematic_pps_sample(df, "n_chars", "source", n_per_group=0)


def test_l_diversity_flags_homogeneous_class(spark):
    """A class of 5 sharing one diagnosis is k-anonymous (k=5) but
    1-diverse: exactly the leak l-diversity exists to catch."""
    import math

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        l_diversity_report,
    )

    rows = [("z1", "flu")] * 5 + [("z2", "flu"), ("z2", "cold"), ("z2", "ulcer")]
    df = spark.createDataFrame(rows, "zip string, diagnosis string")
    got = {r.zip: r for r in l_diversity_report(df, ["zip"], "diagnosis", l=2).collect()}
    assert got["z1"].class_size == 5
    assert got["z1"].distinct_sensitive == 1
    assert got["z1"].at_risk
    assert got["z1"].entropy_r6 == round(
        math.log(5) - 5 * round(1e6 * math.log(5)) / (1e6 * 5), 6
    )  # ~0: a homogeneous class has zero sensitive entropy
    assert abs(got["z1"].entropy_r6) < 1e-5
    assert got["z2"].distinct_sensitive == 3
    assert not got["z2"].at_risk
    assert got["z2"].entropy_r6 == round(math.log(3), 6) - 0.0  # uniform over 3


def test_dp_noisy_counts_deterministic_and_seed_sensitive(spark):
    """Same seed -> identical release (re-runs spend no budget);
    different seed -> different noise; noise centered near zero."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(300)], "id long, grp string"
    )
    a = {r.grp: r.noisy_count_r4 for r in dp_noisy_counts(df, ["grp"]).collect()}
    b = {r.grp: r.noisy_count_r4 for r in dp_noisy_counts(df, ["grp"]).collect()}
    c = {r.grp: r.noisy_count_r4 for r in dp_noisy_counts(df, ["grp"], seed="dp-v2").collect()}
    assert a == b
    assert a != c
    # Laplace(1) noise: |noisy - true| < 30 with overwhelming margin
    assert all(abs(v - 100) < 30 for v in a.values())
    # and the release is actually noisy, not the raw count
    assert any(v != 100 for v in a.values())


def test_aes_weighted_sample_properties(spark):
    """Huge-weight rows dominate the sample (key -> 0 as w -> inf);
    non-positive weights are excluded; same salt -> same sample."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        aes_weighted_sample,
    )

    rows = [(i, 1.0) for i in range(50)] + [(100, 1e9), (101, -2.0), (102, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = aes_weighted_sample(df, "w", n=5, id_col="doc_id").collect()
    ids = [r.doc_id for r in got]
    assert ids[0] == 100            # ln(u)/1e9 ~ 0 beats every unit weight
    assert 101 not in ids and 102 not in ids
    again = [r.doc_id for r in aes_weighted_sample(df, "w", n=5).collect()]
    assert ids == again
    other = [
        r.doc_id
        for r in aes_weighted_sample(df, "w", n=5, salt="aes-v2").collect()
    ]
    assert ids != other             # salt re-deals the draw


def test_epoch_shuffle_permutations_differ_and_are_complete(spark):
    """Each epoch is a complete 1..N permutation of the corpus; the two
    epochs order the keys differently (independent md5 keying); and the
    order is reproducible across invocations."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        epoch_shuffle,
    )

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id").repartition(5)
    out = epoch_shuffle(df, key_col="doc_id", epochs=2).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = r.shuffle_pos
    assert set(by_epoch) == {0, 1}
    for positions in by_epoch.values():
        assert sorted(positions.values()) == list(range(1, 201))
    assert by_epoch[0] != by_epoch[1]  # different permutations

    again = epoch_shuffle(df, key_col="doc_id", epochs=2).collect()
    assert {(r.epoch, r.doc_id): r.shuffle_pos for r in again} == {
        (r.epoch, r.doc_id): r.shuffle_pos for r in out
    }


def test_epoch_shuffle_salt_redeal(spark):
    """A different salt re-deals the permutation without touching data."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        epoch_shuffle,
    )

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    a = {
        r.doc_id: r.shuffle_pos
        for r in epoch_shuffle(df, epochs=1).collect()
    }
    b = {
        r.doc_id: r.shuffle_pos
        for r in epoch_shuffle(df, epochs=1, salt="s2").collect()
    }
    assert set(a) == set(b) and a != b


def test_dsir_importance_upweights_target_like_docs(spark):
    """Documents sharing the target domain's vocabulary must outscore
    documents made of off-domain tokens: with a clean two-vocabulary
    corpus the mean log-weight of target-vocab docs is strictly higher."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dsir_importance,
    )
    from pyspark.sql import functions as F

    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta epsilon", "en"))
    for i in range(30, 60):
        rows.append((i, "zulu yankee xray whiskey victor", "de"))
    # held-out docs, NOT in the target slice, from each vocabulary:
    rows.append((100, "alpha beta gamma", "fr"))
    rows.append((101, "zulu yankee xray", "fr"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir_importance(df, F.col("lang") == "en").collect()
    }
    assert got[100] > got[101]
    assert got[0] > 0 > got[30]  # target vocab up, off-domain down


def test_temperature_mixture_alpha1_is_natural_and_tail_boosts(spark):
    """alpha=1 reproduces the natural mix (boost == 1 everywhere);
    alpha=0.7 up-samples the rare source (boost > 1) and down-samples
    the dominant one (boost < 1), with temperature shares summing to 1."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        temperature_mixture_rates,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    nat = {
        r.source: r for r in temperature_mixture_rates(df, alpha=1.0).collect()
    }
    assert all(abs(r.boost - 1.0) < 1e-6 for r in nat.values())

    hot = {
        r.source: r for r in temperature_mixture_rates(df, alpha=0.7).collect()
    }
    assert hot["small"].boost > 1.0 > hot["big"].boost
    assert abs(sum(r.q_temp for r in hot.values()) - 1.0) < 1e-6
    assert hot["small"].expected_docs > 100  # up-sampled beyond natural


def test_content_defined_chunks_resync_after_insertion(spark):
    """The FastCDC property: insert one token near the front of a long
    document and the LATER chunks still match the original's chunks
    (boundaries re-synchronize on content), while fixed-size chunking
    shares nothing after the edit point. Also: chunks partition the
    token stream exactly (no token lost or duplicated)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        chunk_documents,
        content_defined_chunks,
    )

    words = [f"w{i * 37 % 211}" for i in range(400)]
    original = " ".join(words)
    edited = " ".join(words[:5] + ["zzinserted"] + words[5:])
    df = spark.createDataFrame(
        [(1, original), (2, edited)], "doc_id long, text string"
    )

    cdc = content_defined_chunks(df, window=3, divisor=8).collect()
    by_doc = {1: set(), 2: set()}
    tok_counts = {1: 0, 2: 0}
    for r in cdc:
        by_doc[r.doc_id].add(r.chunk_text)
        tok_counts[r.doc_id] += r.n_tokens
    assert tok_counts == {1: 400, 2: 401}  # exact partition of tokens
    shared_cdc = by_doc[1] & by_doc[2]
    assert len(shared_cdc) >= 0.5 * len(by_doc[1])  # later chunks re-sync

    fixed = chunk_documents(df, chunk_tokens=8, overlap=0).collect()
    fx = {1: set(), 2: set()}
    for r in fixed:
        fx[r.doc_id].add(r.chunk_text)
    shared_fixed = fx[1] & fx[2]
    # the single early insertion shifts every later fixed chunk
    assert len(shared_fixed) < len(shared_cdc)


def test_content_defined_chunks_short_doc_single_chunk(spark):
    """Documents shorter than the gram window can never flag a boundary
    and come back as exactly one whole-document chunk."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        content_defined_chunks,
    )

    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    rows = content_defined_chunks(df).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "ab cd" and rows[0].n_tokens == 2

"""Registry queries: curation family. Split from queries.py
(r4 verdict item 2); registration order within the family preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401
    register,
)
from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403




@register(
    "k_anonymity_customers",
    oracle=f"""
    {_ENTITY_CTES}
    SELECT region, customer_tenure_days AS tenure_days,
           count(*) AS class_size,
           count(*) < 5 AS at_risk
    FROM c GROUP BY 1, 2
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the customer quasi-identifiers
    (region, tenure): every equivalence class under k is a linking
    re-identification risk — the privacy release gate, one aggregate
    at quasi-identifier grain."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        k_anonymity_report,
    )

    customers = load_customers(spark, sf_dir).select(
        "region", F.col("customer_tenure_days").alias("tenure_days")
    )
    return k_anonymity_report(customers, ["region", "tenure_days"], k=5)




@register(
    "chunk_documents_docs",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n,
             greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
      FROM d
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           n_chunks,
           array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text,
           CAST(least(64, n - i * 48) AS INT) AS n_chunk_tokens
    FROM s, UNNEST(range(0, n_chunks)) AS t(i)
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token chunk windows (stride 48) over every
    document — the corpus→training-examples expansion, a map-only
    sequence/slice/explode pass with no shuffle or UDF."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        chunk_documents,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )




@register(
    "dedup_chunks_docs",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n,
             greatest(1, CAST(ceil(len(toks) / 64.0) AS INT)) AS n_chunks
      FROM d
    ), chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_id,
             array_to_string(toks[i * 64 + 1 : i * 64 + 64], ' ') AS chunk_text,
             CAST(least(64, n - i * 64) AS INT) AS n_toks
      FROM s, UNNEST(range(0, n_chunks)) AS t(i)
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_id
             ) AS rk
      FROM chunks
    )
    SELECT doc_id,
           count(*) AS total_chunks,
           CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS INT) AS kept_chunks,
           CAST(sum(CASE WHEN rk = 1 THEN n_toks ELSE 0 END) AS INT)
             AS kept_tokens,
           coalesce(
             string_agg(CASE WHEN rk = 1 THEN chunk_text END,
                        ' ' ORDER BY chunk_id),
             '') AS dedup_text
    FROM ranked GROUP BY 1
    """,
)
def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document chunk-level dedup (CCNet paragraph-dedup analogue
    over 64-token windows): first global occurrence of each chunk
    fingerprint survives, documents reassemble from surviving chunks —
    two digest/doc-keyed shuffles total."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dedup_chunks,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return dedup_chunks(load_table(spark, sf_dir, "documents"), chunk_tokens=64)




@register(
    "dataset_split_docs",
    oracle="""
    WITH b AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT
                  % 100 AS BIGINT) AS bucket
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN bucket < 98 THEN 'train'
                WHEN bucket < 99 THEN 'valid'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/valid/test assignment — a pure
    projection on the md5 bucket of doc_id: reproducible, shuffle-free,
    repartition-stable (no rand(), no side file)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        assign_splits,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return assign_splits(
        load_table(spark, sf_dir, "documents").select("doc_id", "source")
    )




@register(
    "quality_rules_docs",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_extract_all(text, '\S+') AS ws,
             {_DUCK_TOKS} AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             round(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) * 1.0
                   / greatest(len(toks), 1), 6) AS mean_word_len,
             round(((length(text) - length(replace(text, '#', '')))
                    + len(regexp_extract_all(text, '\.{{3}}|…'))) * 1.0
                   / greatest(len(ws), 1), 6) AS symbol_word_ratio,
             round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
                   / greatest(len(ws), 1), 6) AS alpha_word_ratio,
             len(list_intersect(list_distinct(toks), {_DUCK_STOPS_EN}))
               AS distinct_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
           alpha_word_ratio, distinct_stopwords,
           CAST(n_words BETWEEN 10 AND 100000 AS INT) AS rule_word_count,
           CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT) AS rule_mean_word_len,
           CAST(symbol_word_ratio <= 0.1 AS INT) AS rule_symbol_ratio,
           CAST(alpha_word_ratio >= 0.8 AS INT) AS rule_alpha_words,
           CAST(distinct_stopwords >= 2 AS INT) AS rule_stopwords,
           CAST(n_words BETWEEN 10 AND 100000 AS INT)
             * CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT)
             * CAST(symbol_word_ratio <= 0.1 AS INT)
             * CAST(alpha_word_ratio >= 0.8 AS INT)
             * CAST(distinct_stopwords >= 2 AS INT) AS passes_quality
    FROM m
    """,
)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality gate (published Gopher heuristics: word-count
    bounds, mean-word-length band, symbol ratio, alphabetic-word
    fraction, stopword floor) — per-rule int flags + combined verdict,
    all shuffle-free per-row expressions."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import with_quality_rules
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return with_quality_rules(docs).select(
        "doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
        "alpha_word_ratio", "distinct_stopwords", "rule_word_count",
        "rule_mean_word_len", "rule_symbol_ratio", "rule_alpha_words",
        "rule_stopwords", "passes_quality",
    )




@register(
    "repetition_stats_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id, toks,
             list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                            i -> array_to_string(toks[i:i+1], ' ')) AS g2,
             list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                            i -> array_to_string(toks[i:i+2], ' ')) AS g3
      FROM t
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           round(coalesce(list_max(list_transform(list_distinct(toks),
                   t -> len(list_filter(toks, x -> x = t)))), 0) * 1.0
                 / greatest(len(toks), 1), 6) AS top_token_ratio,
           round(1.0 - len(list_distinct(g2)) * 1.0 / greatest(len(g2), 1), 6)
             AS dup_2gram_ratio,
           round(1.0 - len(list_distinct(g3)) * 1.0 / greatest(len(g3), 1), 6)
             AS dup_3gram_ratio
    FROM g
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition family (Gopher): most-frequent-token share and
    duplicate word 2/3-gram fractions, per document, zero shuffle."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        with_repetition_stats,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return with_repetition_stats(docs).select(
        "doc_id", "n_tokens", "top_token_ratio", "dup_2gram_ratio", "dup_3gram_ratio"
    )




@register(
    "contamination_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM t
    ), b AS (
      SELECT DISTINCT unnest(sh) AS s FROM d WHERE doc_id % 50 = 0
    ), e AS (
      SELECT doc_id, unnest(sh) AS s FROM d
    ), h AS (
      SELECT e.doc_id, count(*) AS contaminated_ngrams
      FROM e JOIN b USING (s) GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           len(d.sh) AS total_ngrams,
           coalesce(h.contaminated_ngrams, 0) AS contaminated_ngrams,
           round(coalesce(h.contaminated_ngrams, 0) * 1.0
                 / greatest(len(d.sh), 1), 6) AS contamination_ratio
    FROM d LEFT JOIN h USING (doc_id)
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination screen: fraction of each doc's distinct
    word 3-grams that appear in the 'benchmark' slice (docs with
    doc_id % 50 = 0 stand in for an eval set). Shuffle carries n-gram
    strings, never document bodies."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        ngram_contamination,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter("doc_id % 50 = 0")
    return ngram_contamination(docs, bench, n=3)




@register(
    "hash_sample_docs",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_DUCK_BUCKET} < 10
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample via md5-prefix bucketing — a
    pure pushed-down filter (no rand(), reproducible across runs and
    engines)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import hash_sample
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", pct=10).select("doc_id", "lang", "source")




@register(
    "mixture_sample_docs",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_DUCK_BUCKET} <
          CASE WHEN source = 'src0' THEN 80
               WHEN source = 'src1' THEN 50
               WHEN source = 'src2' THEN 20
               ELSE 5 END
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture sampling (80/50/20% for three named sources,
    5% for the long tail) — the deterministic data-mixing filter; same
    md5-bucket discipline as hash_sample_docs, so exactly reproducible
    in DuckDB."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        mixture_sample,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs, {"src0": 80, "src1": 50, "src2": 20}, default_pct=5
    ).select("doc_id", "lang", "source")




@register(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_DUCK_BUCKET.replace('% 100', '')}, doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-language sample: rank by md5 hash
    within each lang stratum, keep 20 — reproducible train/eval splits
    without a side file."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        stratified_sample,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "doc_id", n_per_stratum=20).select(
        "doc_id", "lang"
    )




@register(
    "dictionary_encode_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, len(toks) + 1)) AS ord
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents) d
    ), vocab AS (
      SELECT tok, tid FROM (
        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS tid
        FROM tok GROUP BY tok
      ) WHERE tid <= 256
    ), enc AS (
      SELECT t.doc_id, t.ord, coalesce(v.tid, 0) AS tid
      FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
    ), agg AS (
      SELECT doc_id, list(tid ORDER BY ord) AS ids,
             count(*) AS n_tokens,
             CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM enc GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(array_to_string(a.ids, ','), '') AS ids,
           coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.n_oov, 0) AS n_oov
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
)
def q_dictionary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → numericalize (operators/curation.py:
    dictionary_encode): 256-token dictionary trained under the total
    order (count desc, token asc), broadcast into the encode join, id
    sequences reassembled positionally — the corpus-to-training-input
    step, engine-exact including OOV counts.

    The id sequence is joined to one csv scalar at the registered
    surface (driver's canonicalizer can't hash array cells — same fix
    as ``inverted_index_docs``); the operator keeps ``array<int>``."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dictionary_encode,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    enc = dictionary_encode(load_table(spark, sf_dir, "documents"))
    return enc.withColumn("ids", F.array_join("ids", ","))




@register(
    "html_strip_docs",
    oracle=r"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN
               '<html><head><script type="text/javascript">var x=1;</script>'
               || '</head><body><h1>Title ' || CAST(doc_id AS VARCHAR)
               || '</h1><!-- nav chrome --><p class="lead">' || text
               || ' &amp; more &lt;3</p></body></html>'
             ELSE text END AS text
      FROM documents
    ), stripped AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(text,
               '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g') AS t
      FROM planted
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '<[^>]+>')) AS n_tags,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(
               regexp_replace(t, '<[^>]+>', ' ', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
             '\s+', ' ', 'g')) AS text_clean
    FROM stripped
    """,
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-scrape markup removal (operators/curation.py:
    with_html_stripped): script/style payloads dropped, comments
    dropped, tags stripped and counted, entities decoded, whitespace
    collapsed. HTML is planted deterministically on every 10th doc in
    BOTH engines (the corpus itself is plain text) so every rule is
    exercised for real."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        with_html_stripped,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.lit(
                    '<html><head><script type="text/javascript">var x=1;'
                    "</script></head><body><h1>Title "
                ),
                F.col("doc_id").cast("string"),
                F.lit('</h1><!-- nav chrome --><p class="lead">'),
                F.col("text"),
                F.lit(" &amp; more &lt;3</p></body></html>"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return with_html_stripped(planted).select("doc_id", "n_tags", "text_clean")




@register(
    "pii_redaction_docs",
    oracle=r"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.0.'
                    || CAST(doc_id % 200 AS VARCHAR) || '.'
                    || CAST(doc_id % 250 AS VARCHAR)
                    || ' card 4111222233334444'
             ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text, '\b\d{13,19}\b')) AS n_long_digits,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{13,19}\b', '<NUMBER>', 'g') AS text_redacted
    FROM planted
    """,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-PII scrub (emails / IPv4 / long digit runs → typed
    placeholders) with per-kind counts. PII is planted deterministically
    on every 20th doc in BOTH engines so the regexes are exercised for
    real (the corpus itself is clean); patterns are alternation-light so
    Java regex and RE2 agree."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        with_pii_redaction,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 250).cast("string"),
                F.lit(" card 4111222233334444"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return with_pii_redaction(planted).select(
        "doc_id", "n_email", "n_ipv4", "n_long_digits", "text_redacted"
    )




@register(
    "vocab_top_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), tf AS (
      SELECT tok, count(*) AS term_freq FROM t GROUP BY tok
    ), dfq AS (
      SELECT tok, count(DISTINCT doc_id) AS doc_freq FROM t GROUP BY tok
    )
    SELECT tok, term_freq, doc_freq
    FROM tf JOIN dfq USING (tok)
    ORDER BY term_freq DESC, tok ASC
    LIMIT 50
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head (top-50 tokens by term frequency with
    document frequency) — explode→partial-agg→TakeOrdered; the shuffle
    carries (token, count) pairs after map-side combine."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import vocab_topk
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return vocab_topk(docs, k=50)




@register(
    "pack_sequences_docs",
    oracle=f"""
    WITH spans AS (
      SELECT doc_id, source,
             len({_DUCK_TOKS}) AS n_tokens,
             CAST(SUM(len({_DUCK_TOKS})) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS token_end
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           token_end - n_tokens AS token_start,
           token_end,
           (token_end - n_tokens) // 256 AS first_seq,
           (token_end - 1) // 256 AS last_seq,
           (token_end - 1) // 256 - (token_end - n_tokens) // 256 + 1
             AS n_seqs
    FROM spans WHERE n_tokens > 0
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal-LM sequence-packing plan at seq_len=256: every document's
    token span in the per-source concatenated stream and the training
    sequences it occupies (integer window arithmetic, engine-exact)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        pack_training_sequences,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return pack_training_sequences(docs, seq_len=256)




@register(
    "pps_sample_docs",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, greatest(CAST(n_chars AS BIGINT), 1) AS wq
      FROM documents
    ), c AS (
      SELECT doc_id, source, wq,
             sum(wq) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum,
             sum(wq) OVER (PARTITION BY source) AS total
      FROM w
    )
    SELECT doc_id, source, wq AS weight,
           CAST((cum * 50) // total
                - ((cum - wq) * 50) // total AS BIGINT) AS n_tickets
    FROM c
    WHERE (cum * 50) // total - ((cum - wq) * 50) // total >= 1
    """,
)
def q_pps_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic size-proportional sampling (systematic PPS,
    operators/curation.py:systematic_pps_sample): ~50 docs per source
    selected with probability ∝ n_chars via an exact-integer ticket
    grid over the per-source cumulative weight line — the rand()-free
    data-mixing sampler (heavier docs favored, certainty selections
    get n_tickets > 1). Per-group windows only (no single-partition
    exchange); bit-identical across engines by integer arithmetic."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        systematic_pps_sample,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return systematic_pps_sample(
        load_table(spark, sf_dir, "documents"),
        weight_col="n_chars",
        group_col="source",
        n_per_group=50,
    )




@register(
    "grouped_split_docs",
    oracle="""
    WITH b AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(source || ''), 1, 8))::BIGINT
                  % 100 AS BIGINT) AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split,
           count(DISTINCT source) AS n_sources,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY 1
    """,
)
def q_grouped_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware dataset split (80/10/10 keyed on md5(source), not
    doc_id): every document from one source lands in the same split, so
    near-duplicates within a source can never leak from train into
    test — the leakage-prevention variant of `dataset_split_docs`
    (GroupShuffleSplit semantics). Still a pure projection per row (one
    md5 of the group key), shuffle-free assignment at any scale; the
    summary aggregate here is the split-balance audit."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        assign_splits,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    split = assign_splits(
        docs, key_col="source", splits={"train": 80, "valid": 10, "test": 10}
    )
    return split.groupBy("split").agg(
        F.countDistinct("source").alias("n_sources"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )




@register(
    "l_diversity_customers",
    oracle="""
    WITH per AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             c_mktsegment, count(*) AS c
      FROM customer GROUP BY 1, 2, 3
    ), cls AS (
      SELECT c_nationkey, bal_bucket,
             SUM(c) AS class_size,
             count(*) AS distinct_sensitive,
             SUM(c * CAST(round(1000000.0 * ln(c), 0) AS BIGINT)) AS s_micro
      FROM per GROUP BY 1, 2
    )
    SELECT c_nationkey, bal_bucket,
           CAST(class_size AS BIGINT) AS class_size,
           distinct_sensitive,
           round(ln(class_size) - s_micro / (1000000.0 * class_size), 6)
             AS entropy_r6,
           distinct_sensitive < 3 AS at_risk
    FROM cls
    """,
)
def q_l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) of market segment within
    (nation, balance-bucket) quasi-identifier classes — the
    homogeneity-attack gate k-anonymity misses: a ≥k class whose
    members all share one segment still leaks it. Entropy per class is
    fixed-point exact (operators/curation.py:l_diversity_report)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        l_diversity_report,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        "c_mktsegment",
    )
    return l_diversity_report(
        cust, ["c_nationkey", "bal_bucket"], "c_mktsegment", l=3
    )




@register(
    "dp_noisy_priority_counts",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1
    ), h AS (
      SELECT o_orderpriority, n,
             ('0x' || substr(md5('dp-v1' || '|' || o_orderpriority), 1, 12))
               ::BIGINT / 281474976710656.0 AS u
      FROM g
    )
    SELECT o_orderpriority,
           round(n + (-1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 4)
             AS noisy_count_r4
    FROM h
    """,
)
def q_dp_noisy_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 differentially-private order counts by priority: Laplace
    noise via inverse CDF with md5-memoized uniforms — the
    re-release-safe noise pattern (same seed ⇒ same release ⇒ no
    budget spent on reruns), bit-reproducible across engines. Priority
    is a public enum, so the group keys themselves leak nothing
    (operators/curation.py:dp_noisy_counts)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dp_noisy_counts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return dp_noisy_counts(
        load_table(spark, sf_dir, "orders"), ["o_orderpriority"], epsilon=1.0
    )




@register(
    "aes_weighted_sample_docs",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
             round(ln(
               ('0x' || substr(md5('aes-v1' || '|'
                   || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
               / 281474976710656.0) / CAST(n_chars AS DOUBLE), 9)
               AS aes_key_r9
      FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
    )
    SELECT doc_id, weight, aes_key_r9
    FROM keyed ORDER BY aes_key_r9 DESC, doc_id LIMIT 20
    """,
)
def q_aes_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sample (n=20, weight = n_chars):
    exact weighted-without-replacement semantics with md5-derived
    uniforms — the principled upgrade over per-stratum systematic PPS,
    reproducible at any parallelism (operators/curation.py:
    aes_weighted_sample)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        aes_weighted_sample,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return aes_weighted_sample(
        load_table(spark, sf_dir, "documents"), "n_chars", n=20
    )




@register(
    "epoch_shuffle_docs",
    oracle="""
    WITH e AS (
      SELECT doc_id, t.epoch,
             md5(CAST(doc_id AS VARCHAR) || '::'
                 || CAST(t.epoch AS VARCHAR)) AS h
      FROM documents, (VALUES (0), (1)) AS t(epoch)
    )
    SELECT epoch, doc_id,
           row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)
             AS shuffle_pos
    FROM e
    """,
)
def q_epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch deterministic training order over the documents
    corpus: each epoch is an independent md5-keyed permutation with
    global positions stamped by ``global_row_number`` (range shuffle +
    broadcast offsets — no single-partition sort), rebased per epoch by
    a tiny broadcast min-offset aggregate."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        epoch_shuffle,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, key_col="doc_id", epochs=2)




@register(
    "dsir_importance_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(lang = 'en' AS INT) AS tgt,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), tb AS (
      SELECT doc_id, tgt,
             CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS bucket
      FROM toks
    ), model AS (
      SELECT bucket, count(*) AS n_raw, SUM(tgt) AS n_tgt
      FROM tb GROUP BY bucket
    ), tot AS (
      SELECT SUM(n_raw) AS tot_raw, SUM(n_tgt) AS tot_tgt FROM model
    ), scored AS (
      SELECT tb.doc_id,
             CAST(round(ln(
               ((CAST(n_tgt AS DOUBLE) + 1) / (CAST(tot_tgt AS DOUBLE) + 1024.0))
               / ((CAST(n_raw AS DOUBLE) + 1) / (CAST(tot_raw AS DOUBLE) + 1024.0))
             ) * 1e6, 0) AS BIGINT) AS lr_q
      FROM tb JOIN model USING (bucket), tot
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           round(SUM(lr_q) / 1e6, 6) AS dsir_logweight
    FROM scored GROUP BY doc_id
    """,
)
def q_dsir_importance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) with English documents
    as the target domain: hashed-unigram Laplace-smoothed bag-of-words
    models for target and raw corpus (1024 md5 buckets — bounded
    trained state), per-token log-ratios quantized to 1e-9 fixed point
    before the order-insensitive per-doc sum."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        dsir_importance,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("lang") == "en")




@register(
    "temperature_mixture_docs",
    oracle="""
    WITH c AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
    ), t AS (SELECT SUM(n_docs) AS tot FROM c),
    p AS (
      SELECT source, n_docs, tot,
             CAST(round(pow(CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE),
                            0.7) * 1e9, 0) AS BIGINT) AS pq_q
      FROM c, t
    ), d AS (SELECT SUM(pq_q) AS den FROM p)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS p_raw,
           round(CAST(pq_q AS DOUBLE) / CAST(den AS DOUBLE), 9) AS q_temp,
           round((CAST(pq_q AS DOUBLE) / CAST(den AS DOUBLE))
                 / (CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE)), 6) AS boost,
           CAST(round(CAST(pq_q AS DOUBLE) / CAST(den AS DOUBLE)
                      * CAST(tot AS DOUBLE), 0) AS BIGINT) AS expected_docs
    FROM p, d
    """,
)
def q_temperature_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.7) per-source sampling rates over the
    documents corpus — the mT5/XLM-R mixture formula with p^alpha
    quantized to 1e-9 fixed point before the normalization sum, so the
    denominator is order-insensitive."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        temperature_mixture_rates,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture_rates(docs, "source", alpha=0.7)




@register(
    "content_chunks_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
      FROM toks
    ), fl AS (
      SELECT doc_id, pos, tok,
             CASE WHEN pos >= 3
                       AND (CAST('0x' || substr(md5(
                              array_to_string(t[pos-2:pos], ' ')), 1, 8)
                            AS BIGINT) % 8) = 0
                  THEN 1 ELSE 0 END AS b
      FROM pos
    ), ch AS (
      SELECT doc_id, pos, tok,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS chunk_id
      FROM fl
    ), chunks AS (
      SELECT doc_id, chunk_id, count(*) AS n_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      FROM ch GROUP BY 1, 2
    )
    SELECT md5(chunk_text) AS chunk_fp,
           CAST(min(n_tokens) AS BIGINT) AS n_tokens,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences
    FROM chunks GROUP BY 1
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_content_chunks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate audit over CONTENT-DEFINED chunks
    (FastCDC-style token-gram boundaries, expected length 8 tokens):
    chunks that recur in >= 2 documents, robust to insertions that
    would misalign every fixed-size chunk after the edit."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        content_defined_chunks,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs, window=3, divisor=8)
    return (
        chunks.groupBy(F.md5("chunk_text").alias("chunk_fp"))
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )

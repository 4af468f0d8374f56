"""Registry queries: text family. Split from queries.py
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
    "text_stats_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             length(text) AS n_chars_calc,
             round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1), 6) AS alpha_ratio,
             round(CAST(len(list_filter(toks, t -> list_contains({_DUCK_STOPS_EN}, t))) AS DOUBLE)
                   / greatest(len(toks), 1), 6) AS stopword_ratio,
             round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / greatest(len(toks), 1), 6) AS mean_token_len
      FROM t
    )
    SELECT doc_id, n_tokens, n_chars_calc, alpha_ratio, stopword_ratio,
           mean_token_len,
           round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                 + alpha_ratio * 0.4
                 + CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0
                        THEN 0.2 ELSE 0.0 END, 6) AS quality_score
    FROM s
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring, all JVM-side expressions."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import with_text_stats
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return with_text_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_tokens",
        "n_chars_calc",
        "alpha_ratio",
        "stopword_ratio",
        "mean_token_len",
        "quality_score",
    )




@register(
    "lang_id_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, text,
        len(list_filter(toks, t -> list_contains({_DUCK_STOPS_EN}, t))) AS s_en,
        len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], t))) AS s_de,
        len(list_filter(toks, t -> list_contains(['el','la','de','que','y','en','un','es','por','con'], t))) AS s_es,
        len(list_filter(toks, t -> list_contains(['le','la','de','et','un','est','pour','que','dans','des'], t))) AS s_fr,
        CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1) AS cjk_ratio
      FROM t
    )
    SELECT doc_id,
           CASE WHEN cjk_ratio > 0.3 THEN 'zh'
                WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language router with CJK-ratio fallback."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import with_lang_id
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return with_lang_id(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang_pred"
    )




@register(
    "fingerprint_docs",
    oracle="""
    SELECT doc_id,
           md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized md5 content fingerprint per document."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        with_fingerprint,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return with_fingerprint(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )




@register(
    "quality_weighted_sample_docs",
    oracle="""
    WITH s AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks, text
      FROM documents
    ), scored AS (
      SELECT doc_id,
             round(least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.4
                   + round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                           / greatest(length(text), 1), 6) * 0.4
                   + CASE WHEN round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                                 / greatest(len(toks), 1), 6)
                               BETWEEN 3.0 AND 10.0
                          THEN 0.2 ELSE 0.0 END, 6) AS quality_score
      FROM s
    )
    SELECT doc_id, quality_score
    FROM scored
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'qw'), 1, 8))::BIGINT
               % 100 AS BIGINT) < CAST(floor(quality_score * 100) AS BIGINT)
    """,
)
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: each document survives with
    probability equal to its quality score — the importance-sampling
    data-mix step (upweight clean text without hard thresholds) — but
    DETERMINISTICALLY: keep iff md5-bucket(doc_id, salt) <
    floor(100·score). Reproducible across runs, engines, and
    repartitioning; no rand() anywhere."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        with_text_stats,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    scored = with_text_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "quality_score"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("qw"))), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return scored.filter(
        bucket < F.floor(F.col("quality_score") * 100).cast("long")
    )




@register(
    "inverted_index_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token
      FROM documents WHERE length(trim(text)) > 0
    ), td AS (
      SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
    )
    SELECT token,
           count(*) AS doc_freq,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string((array_agg(doc_id ORDER BY doc_id))[1:32],
                           ',') AS postings_sample
    FROM td GROUP BY 1
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index build: token → (df, total tf, sorted sample
    postings). The explode re-reduces at (token, doc) grain before the
    token shuffle, and postings are capped — stop-token rows stay
    bounded at any corpus size.

    The registered surface joins the postings array into one scalar
    string: the round driver's pandas canonicalizer cannot sort rows on
    an ``array`` column (round-3 red row was a harness ``TypeError``,
    not an engine mismatch). Library users keep the array grain via
    :func:`operators.text.build_inverted_index` directly."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        build_inverted_index,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    idx = build_inverted_index(load_table(spark, sf_dir, "documents"))
    return idx.select(
        "token",
        "doc_freq",
        "total_tf",
        F.array_join("postings_sample", ",").alias("postings_sample"),
    )




@register(
    "token_estimates_docs",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
           len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
             AS n_bpe_pretokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_chars4
    FROM documents
    """,
)
def q_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token-count estimators: whitespace tokens, GPT-2-style BPE
    pretokens, chars/4 heuristic — native regexp expressions."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        with_token_estimates,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return with_token_estimates(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_ws_tokens", "n_bpe_pretokens", "n_tokens_chars4"
    )




@register(
    "unigram_surprisal_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), counts AS (
      SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ), total AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM counts
    ), scored AS (
      SELECT t.doc_id,
             CAST(round(ln(CAST(c.cnt AS DOUBLE) / tot) * 1e9) AS BIGINT)
               AS logp_q
      FROM toks t JOIN counts c USING (tok) CROSS JOIN total
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(-CAST(sum(logp_q) AS DOUBLE) / 1e9 / count(*), 6)
             AS surprisal_nats
    FROM scored GROUP BY doc_id
    """,
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality filter: per-doc mean −ln p(token) under
    the corpus unigram model, with per-token fixed-point quantization so
    the doc sum is integer-exact and order-insensitive."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        unigram_surprisal,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return unigram_surprisal(load_table(spark, sf_dir, "documents"))




@register(
    "lexical_diversity_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), per AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS type_token_ratio,
           round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE)
                 / count(*), 6) AS hapax_fraction
    FROM per GROUP BY doc_id
    """,
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity screen: per-doc type/token ratio and hapax
    fraction (share of types used exactly once) — low diversity flags
    keyword stuffing and template spam; abnormally high flags word-soup
    noise. One explode + one (doc, token) aggregate + one doc
    aggregate; exact counts, two final rounded divisions. Empty docs
    drop (no tokens)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    per = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_fraction"),
    )




@register(
    "length_bucketing_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS n_tok FROM documents
    ), b AS (
      SELECT doc_id, n_tok,
             CAST(CASE WHEN n_tok <= 1 THEN 1
                  ELSE power(2, ceil(log2(CAST(n_tok AS DOUBLE))))
             END AS BIGINT) AS bucket_len
      FROM t WHERE n_tok > 0
    )
    SELECT bucket_len,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS token_sum,
           CAST(sum(bucket_len - n_tok) AS BIGINT) AS padding_waste,
           round(CAST(sum(n_tok) AS DOUBLE)
                 / (count(*) * bucket_len), 6) AS fill_ratio
    FROM b GROUP BY bucket_len
    """,
)
def q_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing for padded training batches — the PADDING-side
    complement of `pack_sequences_docs`'s concatenation strategy: each
    document lands in its power-of-2 token-length bucket, and the
    report prices each bucket's padding waste and fill ratio (what an
    input pipeline inspects before choosing pad-vs-pack). Pure integer
    bucket arithmetic (ceil-log2 on exact token counts is
    engine-stable: n ≤ 2^53 doubles represent every count exactly);
    the fill ratio is one final rounded division."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    t = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(tokens(F.col("text"))).alias("n_tok"))
        .filter(F.col("n_tok") > 0)
    )
    bucket = F.when(F.col("n_tok") <= 1, F.lit(1).cast("long")).otherwise(
        F.pow(F.lit(2.0), F.ceil(F.log2(F.col("n_tok").cast("double"))))
        .cast("long")
    )
    b = t.withColumn("bucket_len", bucket)
    return b.groupBy("bucket_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("token_sum"),
        F.sum(F.col("bucket_len") - F.col("n_tok")).alias("padding_waste"),
        F.round(
            F.sum("n_tok").cast("double")
            / (F.count(F.lit(1)) * F.col("bucket_len")),
            6,
        ).alias("fill_ratio"),
    )




@register(
    "bigram_surprisal_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(toks[1:len(toks)-1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM t WHERE len(toks) >= 2
    ), bgc AS (
      SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx FROM bgc GROUP BY 1
    ), vocab AS (
      SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT unnest(toks) AS tok FROM t)
    ), scored AS (
      SELECT b.doc_id,
             CAST(round(ln(CAST(c.c_bg + 1 AS DOUBLE)
                           / (CAST(x.c_ctx AS DOUBLE) + vocab.v)) * 1e9)
                  AS BIGINT) AS logp_q
      FROM bg b
      JOIN bgc c USING (w1, w2)
      JOIN ctx x USING (w1)
      CROSS JOIN vocab
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(-CAST(sum(logp_q) AS DOUBLE) / 1e9 / count(*), 6)
             AS surprisal_nats
    FROM scored GROUP BY doc_id
    """,
)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-aware perplexity proxy: per-doc mean −ln p(wᵢ|wᵢ₋₁)
    under the corpus's add-one-smoothed bigram model
    (operators/text.py:bigram_surprisal) — catches scrambled text whose
    unigrams look fine but whose transitions don't. Bigrams are zipped
    array slices (no window shuffle); the per-bigram log-probability is
    1e-9 fixed-point quantized so doc sums stay integer-exact."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        bigram_surprisal,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return bigram_surprisal(load_table(spark, sf_dir, "documents"))




@register(
    "kneser_ney_surprisal_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(toks[1:len(toks)-1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM t WHERE len(toks) >= 2
    ), bgc AS (
      SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx,
             count(*) AS n1f
      FROM bgc GROUP BY 1
    ), cont AS (
      SELECT w2, count(*) AS n1b FROM bgc GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bgc
    ), scored AS (
      SELECT b.doc_id,
             CAST(round(ln(
               (CAST(c.c_bg AS DOUBLE) - 0.75) / CAST(x.c_ctx AS DOUBLE)
               + 0.75 * CAST(x.n1f AS DOUBLE) / CAST(x.c_ctx AS DOUBLE)
                 * (CAST(p.n1b AS DOUBLE) / tot.n_types)
             ) * 1e9) AS BIGINT) AS logp_q
      FROM bg b
      JOIN bgc c USING (w1, w2)
      JOIN ctx x USING (w1)
      JOIN cont p USING (w2)
      CROSS JOIN tot
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(-CAST(sum(logp_q) AS DOUBLE) / 1e9 / count(*), 6)
             AS kn_surprisal_nats
    FROM scored GROUP BY doc_id
    """,
)
def q_kneser_ney_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram cross-entropy per document
    (operators/text.py:kneser_ney_surprisal) — the production n-gram
    smoothing: absolute discount D=0.75 plus a continuation-probability
    back-off that ranks words by distinct-context diversity, so
    boilerplate-heavy docs (high raw bigram counts, low context
    diversity) separate from fluent text. Four key-local aggregates on
    the exploded bigram relation; c(w₁·) and N₁₊(w₁·) share one pass;
    1e-9 fixed-point per-bigram quantization keeps doc sums
    integer-exact."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        kneser_ney_surprisal,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return kneser_ney_surprisal(load_table(spark, sf_dir, "documents"))




@register("bpe_token_counts_docs", oracle=_bpe_counts_oracle(8))
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply-side BPE token budgeting: per-doc token counts under the
    trained 8-merge vocab — encoding is explode(words) ⋈ broadcast
    (trained per-word segmentation), never per-row re-segmentation;
    the trained state is shared with `bpe_merges_docs` (one training
    run per process)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        bpe_token_counts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    _, vocab = _bpe_state(sf_dir)
    return bpe_token_counts(
        load_table(spark, sf_dir, "documents"), n_merges=8, vocab=vocab
    )




@register(
    "curation_pipeline_docs",
    oracle=rf"""
    WITH p0 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.0.'
                    || CAST(doc_id % 200 AS VARCHAR) || '.'
                    || CAST(doc_id % 250 AS VARCHAR)
                    || ' card 4111222233334444'
             ELSE text END AS text
      FROM documents
    ), p1 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN
               '<html><head><script type="text/javascript">var x=1;</script>'
               || '</head><body><h1>Title ' || CAST(doc_id AS VARCHAR)
               || '</h1><!-- nav chrome --><p class="lead">' || text
               || ' &amp; more &lt;3</p></body></html>'
             ELSE text END AS text
      FROM p0
    ), strip0 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(text,
               '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g') AS t
      FROM p1
    ), stripped AS (
      SELECT doc_id,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(t, '<[^>]+>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
               '\s+', ' ', 'g')) AS text
      FROM strip0
    ), redacted AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '<IP>', 'g'),
               '\b\d{{13,19}}\b', '<NUMBER>', 'g') AS text
      FROM stripped
    ), s AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM redacted
    ), scored AS (
      SELECT doc_id, text, len(toks) AS n_tokens,
             round(least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.4
                   + round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                           / greatest(length(text), 1), 6) * 0.4
                   + CASE WHEN round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                                 / greatest(len(toks), 1), 6)
                               BETWEEN 3.0 AND 10.0
                          THEN 0.2 ELSE 0.0 END, 6) AS quality_score
      FROM s
    ), kept AS (
      SELECT doc_id, n_tokens, quality_score,
             md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      FROM scored WHERE quality_score >= 0.65
    ), winners AS (
      SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp
    ), surv AS (
      SELECT k.* FROM kept k JOIN winners w
      ON k.fp = w.fp AND k.doc_id = w.doc_id
    )
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT
                     % 100 AS BIGINT) < 98 THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT
                     % 100 AS BIGINT) < 99 THEN 'valid'
                ELSE 'test' END AS split,
           n_tokens, quality_score
    FROM surv
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation flow as ONE Catalyst plan — HTML strip → PII
    redaction → quality gate (≥ 0.6) → exact dedup (min-id per
    fingerprint) → deterministic split assignment — proving the
    operators compose: one corpus scan feeds the chain of projections,
    the only shuffle is the dedup fingerprint groupBy, and the whole
    thing is hash-matched end-to-end against the equivalent DuckDB CTE
    chain. HTML and PII are planted as in the individual queries
    (every 10th / 20th doc)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        assign_splits,
        with_html_stripped,
        with_pii_redaction,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        content_fingerprint,
        with_text_stats,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    p0 = docs.select(
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
    p1 = p0.select(
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
    stripped = with_html_stripped(p1).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    redacted = with_pii_redaction(stripped).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    scored = with_text_stats(redacted).select(
        "doc_id", "text", "n_tokens", "quality_score"
    )
    kept = scored.filter(F.col("quality_score") >= 0.65).withColumn(
        "fp", content_fingerprint("text")
    )
    # min-id-per-fingerprint via ONE ranking window, not groupBy+self-
    # join: the join form recomputes the whole regex chain twice (the
    # two exchanges key on different columns, so Catalyst cannot reuse
    # the subplan — measured 89.4 s at the x100 tier, ~2x the chain's
    # one-pass cost) and shuffles the rows twice. Same output: winner
    # = lowest doc_id per fp either way.
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    surv = (
        kept.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    return assign_splits(surv).select(
        "doc_id", "split", "n_tokens", "quality_score"
    )




@register("bm25_topk_docs", oracle=_bm25_oracle(_BM25_TERMS, k=25))
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k keyword retrieval (constant query, no inverted
    index: per-row codegen term frequencies + one broadcast stats row +
    TakeOrderedAndProject)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import bm25_topk
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=25)




@register(
    "text_stats_unpivoted",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len({_DUCK_TOKS}) AS DOUBLE) AS n_tokens,
             CAST(length(text) AS DOUBLE) AS n_chars
      FROM documents
    )
    SELECT doc_id, metric, value FROM (
      SELECT doc_id, 'n_tokens' AS metric, n_tokens AS value FROM s
      UNION ALL
      SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM s
    )
    """,
)
def q_text_stats_unpivoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format metric reshape via ``unpivot`` (melt) — the inverse
    of the pivot already covered by ``sales_pivot_status``; one
    map-side generate, no shuffle."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import token_count
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    wide = docs.select(
        "doc_id",
        token_count("text").cast("double").alias("n_tokens"),
        F.length("text").cast("double").alias("n_chars"),
    )
    return wide.unpivot(
        ids=["doc_id"],
        values=["n_tokens", "n_chars"],
        variableColumnName="metric",
        valueColumnName="value",
    )




@register(
    "cms_overestimate_violations",
    bench=False,
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS tok,
           CAST(NULL AS BIGINT) AS est_count,
           CAST(NULL AS BIGINT) AS exact_count
    WHERE 1 = 0
    """,
)
def q_cms_overestimate_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min contract, asserted inside the engine: estimates
    NEVER undercount (est >= exact for every token), hence heavy
    hitters have no false negatives. Oracle expects zero rows."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        cms_estimates,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    est = cms_estimates(docs, width=16, depth=3)
    exact = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return est.join(exact, "tok").filter(F.col("est_count") < F.col("exact_count"))




@register(
    "salient_terms_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), ranked AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC
             ) AS rk
      FROM tf JOIN df USING (tok)
      WHERE df.df < (SELECT count(*) FROM documents)
    )
    SELECT doc_id,
           string_agg(tok, ',' ORDER BY rk) AS salient_terms
    FROM ranked WHERE rk <= 3
    GROUP BY 1
    """,
)
def q_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document salient terms — the TF-IDF keyword-extraction idea
    with an INTEGER-EXACT ranking (term frequency desc, document
    frequency asc, token tiebreak) instead of a float idf product, so
    the ranking is engine-exact with no log() in sight; corpus-
    universal terms (df = N) carry no signal and are excluded. Plan:
    (doc, token) counts + a token-keyed document-frequency aggregate,
    one ranking window per doc, top-3 reassembled as an ordered
    comma-joined string (driver-hashable scalar). Shuffles carry
    tokens and counts, never document bodies."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row scalar INSIDE the plan — a
    # driver-side count() here would run a job at DataFrame build,
    # breaking the registry's lazy-build invariant (test_plans.py)
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("__n")))
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    ranked = (
        tf.join(df_, "tok")
        .crossJoin(n_docs)
        .filter(F.col("df") < F.col("__n"))
        .drop("__n")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("tf"), F.asc("df"), F.asc("tok")
                )
            ),
        )
        .filter(F.col("rk") <= 3)
    )
    return ranked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rk", "tok"))
                ),
                lambda s: s["tok"],
            ),
            ",",
        ).alias("salient_terms")
    )




@register(
    "duplicate_spans_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), wins AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 1)),
                                   i -> array_to_string(t[i:i+3], ' ')))
               AS span
      FROM toks
    )
    SELECT span, count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences
    FROM wins GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_duplicate_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span mining (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): every 4-token window that
    recurs across ≥2 documents, with document and occurrence counts —
    the memorization audit that motivates span-level (not doc-level)
    dedup. Differs from `dedup_chunks_docs` (which dedups fixed chunks)
    by sliding the window every token, and from `contamination_docs` by
    reporting the corpus-internal duplicate mass rather than overlap
    with a benchmark. Spans explode map-side and reduce on the span
    key with map-side partial aggregation; no doc bodies shuffle — only
    the 4-token spans themselves, which ARE the result grain. The
    reference's pipeline has no span-level audit; semantics follow the
    published suffix-array formulation restricted to fixed k=4."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("t"))
        .filter(F.size("t") >= 4)
    )
    spans = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 3),
                lambda i: F.array_join(F.slice("t", i, 4), " "),
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )




@register(
    "quality_quantile_norm_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, text, {_DUCK_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, source,
             len(toks) AS n_tokens,
             round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1), 6) AS alpha_ratio,
             round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / greatest(len(toks), 1), 6) AS mean_token_len
      FROM t
    ), q AS (
      SELECT doc_id, source,
             round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                   + alpha_ratio * 0.4
                   + CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0
                          THEN 0.2 ELSE 0.0 END, 6) AS quality_score
      FROM s
    )
    SELECT doc_id, source, quality_score,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY quality_score, doc_id), 6)
             AS q_norm_r6
    FROM q
    """,
)
def q_quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of the quality score — the
    curation step that makes quality thresholds comparable ACROSS
    heterogeneous sources (a raw 0.6 from a clean source and from a
    noisy crawl mean different things; their within-source percentile
    ranks don't). percent_rank is pure rational arithmetic over the
    (rounded score, doc_id) total order, so membership and values are
    engine-exact; the window partitions by source — fully parallel, no
    global sort."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        with_text_stats,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    scored = with_text_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "quality_score"
    )
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    return scored.withColumn(
        "q_norm_r6", F.round(F.percent_rank().over(w), 6)
    )




@register(
    "vocab_coverage_docs",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_DUCK_TOKS}) AS token FROM documents
    ), cnt AS (
      SELECT token, count(*) AS n FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt
    ), top AS (
      SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT 1000
    ), run AS (
      SELECT token, n,
             CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
               AS rank,
             CAST(SUM(n) OVER (ORDER BY n DESC, token
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum
      FROM top
    )
    SELECT token, n, rank,
           round(CAST(cum AS DOUBLE) / total, 6) AS cum_share_r6
    FROM run, tot
    WHERE 10 * (cum - n) < 8 * total
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage of the corpus vocabulary: the smallest
    frequency-ranked prefix of the (top-1000) vocabulary covering 80%
    of total token mass — the analysis that sizes tokenizer vocabularies
    and spots boilerplate-dominated corpora (a tiny prefix covering
    most mass = heavy repetition). The cutoff membership test is exact
    integer arithmetic (10·prev_cum < 8·total); shares round at 6. Plan:
    token counts reduce map-side, the candidate set is a bounded
    TakeOrdered top-1000 (the cumulative window runs over ≤1000 rows),
    and the grand total arrives as a broadcast scalar."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cnt = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.agg(F.sum("n").cast("long").alias("total"))
    top = cnt.orderBy(F.desc("n"), "token").limit(1000)
    w = Window.orderBy(F.desc("n"), "token")
    run = top.select(
        "token",
        "n",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    return (
        run.join(F.broadcast(tot))
        .filter(10 * (F.col("cum") - F.col("n")) < 8 * F.col("total"))
        .select(
            "token",
            "n",
            "rank",
            F.round(F.col("cum").cast("double") / F.col("total"), 6).alias(
                "cum_share_r6"
            ),
        )
    )




@register(
    "doc_span_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), wins AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 1)),
                                   i -> array_to_string(t[i:i+3], ' ')))
               AS span
      FROM toks
    ), dup AS (
      SELECT span FROM wins GROUP BY span
      HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT w.doc_id,
           count(*) AS n_spans,
           CAST(SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_spans,
           round(1.0 - CAST(SUM(CASE WHEN d.span IS NOT NULL
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*), 6) AS novelty_r6
    FROM wins w LEFT JOIN dup d ON d.span = w.span
    GROUP BY 1
    """,
)
def q_doc_span_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's 4-token
    sliding spans NOT duplicated elsewhere in the corpus — the
    doc-level duplicate-mass score (CCNet-style) that turns
    `duplicate_spans_docs`' corpus audit into a per-row curation
    signal (filter or down-weight low-novelty docs before training).
    Plan: spans explode once, reduce to the duplicated-span set
    (map-side partial agg on the span key), then a second pass joins
    membership back and re-aggregates per doc — spans shuffle twice,
    bodies never; one exact division per doc rounds at 6."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("t"))
        .filter(F.size("t") >= 4)
    )
    wins = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 3),
                lambda i: F.array_join(F.slice("t", i, 4), " "),
            )
        ).alias("span"),
    )
    dup = (
        wins.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span", F.lit(1).alias("is_dup"))
    )
    joined = wins.join(dup, "span", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias(
            "n_dup_spans"
        ),
        F.round(
            1.0
            - F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("novelty_r6"),
    )




@register(
    "zipf_slope_vocab",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_DUCK_TOKS}) AS token FROM documents
    ), cnt AS (
      SELECT token, count(*) AS n FROM tok GROUP BY 1
    ), top AS (
      SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT 1000
    ), xy AS (
      SELECT CAST(floor(ln(CAST(row_number() OVER (ORDER BY n DESC, token)
                               AS DOUBLE)) * 1000) AS BIGINT) AS x,
             CAST(floor(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS y
      FROM top
    ), s AS (
      SELECT count(*) AS k,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM xy
    )
    SELECT k AS n_points,
           CAST(k * sxy - sx * sy AS BIGINT) AS num_milli2,
           CAST(k * sxx - sx * sx AS BIGINT) AS den_milli2,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / (k * sxx - sx * sx), 6) AS slope_r6
    FROM s
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law slope of the vocabulary: the least-squares slope of
    ln(frequency) on ln(rank) over the top-1000 tokens (natural
    corpora sit near −1; boilerplate-heavy ones flatten). The
    regression moments use milli-scaled FLOORED fixed-point logs, so
    every sum is an exact int64 at any partial-aggregation schedule
    (bounded: k·Σxy ≤ ~5e13) — the same fixed-point discipline as
    PageRank — and the single closing division rounds at 6. The rank
    window runs over the bounded TakeOrdered top-1000."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cnt = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = cnt.orderBy(F.desc("n"), "token").limit(1000)
    w = Window.orderBy(F.desc("n"), "token")
    xy = top.select(
        F.floor(F.log(F.row_number().over(w).cast("double")) * 1000)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("n").cast("double")) * 1000).cast("long").alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("k").alias("n_points"),
        num.cast("long").alias("num_milli2"),
        den.cast("long").alias("den_milli2"),
        F.round(num.cast("double") / den, 6).alias("slope_r6"),
    )




@register(
    "perplexity_buckets_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), flags AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ppl-v1'), 1, 8))
               ::BIGINT % 100 < 50 AS in_train
      FROM documents
    ), tcounts AS (
      SELECT t.tok, count(*) AS cnt
      FROM toks t JOIN flags f USING (doc_id)
      WHERE f.in_train GROUP BY 1
    ), stats AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_train,
             CAST(COUNT(*) AS BIGINT) AS v_train
      FROM tcounts
    ), scored AS (
      SELECT t.doc_id,
             CAST(round(ln(
               CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE)
               / CAST(s.n_train + s.v_train + 1 AS DOUBLE)) * 1e9) AS BIGINT)
               AS logp_q
      FROM toks t LEFT JOIN tcounts c ON t.tok = c.tok CROSS JOIN stats s
    ), perdoc AS (
      SELECT doc_id, count(*) AS n_tokens,
             round(-CAST(sum(logp_q) AS DOUBLE) / 1e9 / count(*), 6)
               AS surprisal_nats
      FROM scored GROUP BY doc_id
    ), nt AS (
      SELECT p.*, f.in_train,
             ntile(3) OVER (ORDER BY surprisal_nats, doc_id) AS ppl_bucket
      FROM perdoc p JOIN flags f USING (doc_id)
    )
    SELECT doc_id, n_tokens, in_train, surprisal_nats, ppl_bucket,
           (['head', 'middle', 'tail'])[ppl_bucket] AS ppl_label
    FROM nt
    """,
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing: every doc scored by
    an add-one-smoothed unigram LM trained on the md5-half of the
    corpus (train/apply separation — unseen tokens get the UNK mass),
    then exact equal-frequency terciles over the (surprisal, doc_id)
    total order. Bucket assignment uses the range-shuffle global
    numbering, never a single-reducer ntile window; the oracle's
    ntile(3) is provably the same cut (operators/text.py:
    perplexity_filter)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        perplexity_filter,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return perplexity_filter(load_table(spark, sf_dir, "documents"))




@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(trim(lower(
             regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_distinct,
           round(1.0 - CAST(count(DISTINCT md5(trim(lower(
                   regexp_replace(text, '\\s+', ' ', 'g'))))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_rate
    FROM documents GROUP BY 1
    """,
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate-rate scorecard over the SAME normalized
    fingerprint as `dedup_exact_docs` (single shared definition,
    operators/text.py:content_fingerprint) — the corpus-provenance
    health metric a curation pipeline tracks per crawl source."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        content_fingerprint,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    fp = content_fingerprint("text")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_distinct"),
        F.round(
            1.0
            - F.countDistinct(fp).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


_WINNOW_FPS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), hs AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 2), i -> struct_pack(
               p := i,
               h := ('0x' || substr(md5(array_to_string(t[i:i+3], ' ')), 1, 15))::BIGINT))
               AS ph
      FROM toks WHERE len(t) >= 8
    ), sel AS (
      SELECT doc_id,
             list_transform(range(1, len(ph) - 3),
               s -> list_reduce(ph[s:s+4],
                                (acc, x) -> CASE WHEN x.h <= acc.h
                                            THEN x ELSE acc END)) AS fps
      FROM hs
    )
    SELECT DISTINCT doc_id, u.fp.p AS pos, u.fp.h AS fp_hash
    FROM sel, unnest(sel.fps) AS u(fp)
"""


@register("winnow_fingerprints_docs", oracle=_WINNOW_FPS_ORACLE)
def q_winnow_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm) at k=4 grams / w=5 windows: the rightmost
    minimal gram hash of every window, giving position-robust local
    fingerprints with the guarantee that any shared ≥8-token run
    between documents yields a shared fingerprint. Entirely map-side
    array math — the operator shuffles nothing (dedup of adjacent
    windows' repeated picks is array_distinct BEFORE the explode); the
    DuckDB oracle replays the identical fold with list_reduce over the
    same md5-prefix 60-bit gram hashes."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        winnow_fingerprints,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "winnow_shared_pairs",
    oracle=f"""
    WITH fps_all AS ({_WINNOW_FPS_ORACLE}),
    fps AS (SELECT DISTINCT doc_id, fp_hash FROM fps_all),
    keep AS (
      SELECT fp_hash FROM fps GROUP BY 1 HAVING count(*) BETWEEN 2 AND 50
    ),
    e AS (
      SELECT doc_id, fp_hash FROM fps
      WHERE fp_hash IN (SELECT fp_hash FROM keep)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM e a JOIN e b USING (fp_hash)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def q_winnow_shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS candidate pairs: documents sharing ≥2 winnowed fingerprints,
    with ubiquitous fingerprints (document frequency > 50) suppressed
    before pairing — both the algorithm's no-signal rule and the scale
    safety valve (per-hash pair fanout is bounded by max_df², so no
    boilerplate hash can go quadratic). Complements the set-similarity
    dedup family: MinHash/Jaccard measure whole-document overlap;
    winnowing pairs fire on LOCALIZED shared runs (quotation,
    plagiarism, shared boilerplate blocks) that set similarity
    dilutes away."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        winnow_shared_pairs,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return winnow_shared_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "boilerplate_span_ratio_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), d AS (
      SELECT doc_id, t FROM toks WHERE len(t) >= 4
    ), spans AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 2),
                                   i -> array_to_string(t[i:i+3], ' ')))
               AS span
      FROM d
    ), n AS (
      SELECT count(*) AS n_corpus FROM d
    ), boiler AS (
      SELECT span FROM spans, n
      GROUP BY span, n.n_corpus
      HAVING count(DISTINCT doc_id)
             >= greatest(3, CAST(ceil(0.005 * n.n_corpus) AS BIGINT))
    )
    SELECT s.doc_id,
           count(*) AS n_spans,
           count(b.span) AS n_boiler_spans,
           round(CAST(count(b.span) AS DOUBLE) / count(*), 6) AS boiler_ratio
    FROM spans s LEFT JOIN boiler b USING (span)
    GROUP BY s.doc_id
    """,
)
def q_boilerplate_span_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate exposure (the CCNet/C4 curation signal):
    fraction of a document's 4-token spans that are corpus-common
    (appearing in ≥ max(3, 0.5% of documents) distinct docs — a
    RELATIVE threshold, so "common" keeps meaning common at 100 TB).
    Turns `duplicate_spans_docs`' corpus-level audit into a per-row
    curation feature for drop-or-trim rules. Spans explode map-side,
    df reduces once on the span key, and only the (tiny, relative-
    threshold-bounded) boilerplate span set is broadcast back."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        boilerplate_span_ratio,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return boilerplate_span_ratio(load_table(spark, sf_dir, "documents"))


_SPAN_L = 8

# Positional L-token window hashes — the DuckDB replay of
# operators/text.py:_window_hash_positions (md5-prefix 60-bit ints,
# 1-based first-token position; docs shorter than L produce no rows).
_DUCK_WINS = f"""
    toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), wins AS (
      SELECT doc_id, w.pos AS pos, w.h AS h FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {_SPAN_L - 2}),
                 i -> struct_pack(
                   pos := i,
                   h := ('0x' || substr(md5(array_to_string(
                          t[i:i+{_SPAN_L - 1}], ' ')), 1, 15))::BIGINT)))
                 AS w
        FROM toks WHERE len(t) >= {_SPAN_L}
      )
    )
"""

_DUCK_ISLANDS = f"""
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {_SPAN_L} THEN 0 ELSE 1 END AS brk
      FROM hits
    ), isl2 AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    ), spans AS (
      SELECT doc_id, min(pos) AS span_start,
             max(pos) + {_SPAN_L - 1} AS span_end
      FROM isl2 GROUP BY doc_id, island
    )
"""


@register(
    "maximal_dup_spans_docs",
    oracle=f"""
    WITH {_DUCK_WINS},
    dup AS (
      SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
    ), hits AS (
      SELECT doc_id, pos FROM wins WHERE h IN (SELECT h FROM dup)
    ), {_DUCK_ISLANDS},
    per_doc AS (
      SELECT doc_id, count(*) AS n_spans,
             sum(span_end - span_start + 1) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.t) AS n_tokens,
           COALESCE(p.n_spans, 0) AS n_spans,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
                 / greatest(len(t.t), 1), 6) AS dup_frac
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
)
def q_maximal_dup_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MAXIMAL duplicated substring spans (Lee et al., ACL
    2022, fixed-L windowed formulation, L=8): duplicated 8-token window
    positions merged into maximal spans (gap-and-island per document),
    rolled up to the per-doc duplicated-token fraction — the
    memorization-risk feature span-level curation rules filter on.
    Every document appears, including zero-span and shorter-than-L
    rows. One hash-keyed shuffle for occurrence counts, one doc-keyed
    window for the merge; shuffles carry (id, pos, hash) longs, never
    text (operators/text.py:maximal_dup_spans)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        maximal_dup_spans,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return maximal_dup_spans(
        load_table(spark, sf_dir, "documents"), span_len=_SPAN_L
    )


@register(
    "exact_substring_dedup_docs",
    oracle=f"""
    WITH {_DUCK_WINS},
    rk AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
      FROM wins
    ), hits AS (
      SELECT doc_id, pos FROM rk WHERE rk >= 2
    ), {_DUCK_ISLANDS},
    tokidx AS (
      SELECT doc_id, unnest(t) AS tok,
             unnest(range(1, len(t) + 1)) AS i
      FROM toks
    ), kept AS (
      SELECT ti.doc_id, ti.i, ti.tok
      FROM tokidx ti LEFT JOIN spans s
        ON s.doc_id = ti.doc_id
       AND ti.i BETWEEN s.span_start AND s.span_end
      WHERE s.doc_id IS NULL
    ), agg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY i) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.t) AS n_tokens,
           len(t.t) - COALESCE(a.n_kept, 0) AS n_removed,
           COALESCE(a.clean_text, '') AS clean_text
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_exact_substring_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring corpus REWRITE (Lee et al. 2022's dedup step,
    L=8): for each duplicated 8-token window, the globally-first
    occurrence (by (doc_id, pos)) survives; later occurrences merge
    into maximal spans and their tokens are cut, the document text
    reconstructed from the kept tokens. Rank ≥ 2 within the hash
    partition IS the duplicate test, so the plan is one hash-keyed
    ranking shuffle + one doc-keyed island merge + a map-side
    higher-order filter over the token arrays
    (operators/text.py:dedup_spans_rewrite)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        dedup_spans_rewrite,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return dedup_spans_rewrite(
        load_table(spark, sf_dir, "documents"), span_len=_SPAN_L
    )


@register(
    "distinct_ngram_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_DUCK_TOKS} AS t FROM documents
    ), grams AS (
      SELECT lang, 1 AS n, unnest(t) AS gram FROM toks WHERE len(t) >= 1
      UNION ALL
      SELECT lang, 2 AS n,
             unnest(list_transform(range(1, len(t)),
                                   i -> array_to_string(t[i:i+1], ' ')))
      FROM toks WHERE len(t) >= 2
      UNION ALL
      SELECT lang, 3 AS n,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' ')))
      FROM toks WHERE len(t) >= 3
    )
    SELECT n, lang,
           count(*) AS total_ngrams,
           count(DISTINCT gram) AS distinct_ngrams,
           round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
             AS distinct_ratio
    FROM grams GROUP BY 1, 2
    """,
)
def q_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity scorecard: distinct-n ratio (unique n-grams /
    total n-grams, n in 1/2/3) per language — the standard text-
    generation diversity metric (distinct-1/2/3) applied corpus-wide,
    and the early-warning signal for template/boilerplate floods that
    per-document dedup misses. ONE scan: the three gram grains explode
    from the same bound token array (each n guarded map-side — a
    shorter-than-n doc contributes nothing at that grain), then a
    single (n, lang)-keyed aggregate with map-side partials."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("lang", tokens("text").alias("t"))
    def _gram_arr(n: int):
        # single-arg lambda only: a second lambda parameter (even a
        # defaulted one) switches PySpark's transform to the
        # (element, index) form and the index silently shadows it
        return F.when(
            F.size("t") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (n - 1)),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.array_join(F.slice("t", i, n), " ").alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))

    per_n = [_gram_arr(n) for n in (1, 2, 3)]
    grams = d.select(
        "lang", F.explode(F.flatten(F.array(*per_n))).alias("g")
    ).select("lang", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    return grams.groupBy("n", "lang").agg(
        F.count(F.lit(1)).alias("total_ngrams"),
        F.countDistinct("gram").alias("distinct_ngrams"),
        F.round(
            F.countDistinct("gram").cast("double") / F.count(F.lit(1)), 6
        ).alias("distinct_ratio"),
    )

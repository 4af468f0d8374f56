"""Corpus-curation operators for LLM training-data pipelines.

The complement to :mod:`operators.text` (per-doc descriptive stats) and
:mod:`operators.dedup` (duplicate removal): the *selection* half of a
data pipeline — rule-based quality filtering (the public Gopher /
RefinedWeb heuristics), repetition detection, benchmark-contamination
screening, deterministic sampling, and PII redaction.

Design rules carried over from the rest of the engine:

- Per-document metrics are computed as per-row Column expressions —
  documents are independent, so the natural 100 TB plan is an
  embarrassingly-parallel projection with ZERO shuffle, not an
  explode→groupBy→join-back round trip keyed by doc_id. (Higher-order
  array functions are interpreted, not codegen; for corpora with very
  long documents the same per-row independence means an Arrow-batched
  ``mapInPandas`` counter is a drop-in replacement — the plan shape
  doesn't change.)
- Cross-document operators (contamination, vocabulary) shuffle on
  64-bit shingle/token hashes or the tokens themselves, never document
  bodies.
- Everything is deterministic and mirrored by a DuckDB oracle in
  ``queries.py`` — including the sampling operators, which hash md5
  prefixes instead of calling ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
    _QUALITY_STOPWORDS,
    token_count,
    tokens,
)

# ---------------------------------------------------------------------------
# Rule-based quality filtering (Gopher-style heuristics)
# ---------------------------------------------------------------------------


def with_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_distinct_stopwords: int = 2,
) -> DataFrame:
    """Attach the classic rule-based quality gate for web-scale corpora
    (the published Gopher heuristics — word-count bounds, mean word
    length band, symbol-to-word ratio, alphabetic-word fraction,
    distinct-stopword floor) as metric columns, one int flag per rule,
    and a combined ``passes_quality``.

    One projection, no shuffle: every metric is arithmetic over the
    row's own token array. Flags are int (0/1), not boolean, so
    cross-engine canonicalizations can't disagree on truth rendering.
    """
    c = F.col(text_col)
    words = F.regexp_extract_all(c, F.lit(r"\S+"), 0)  # whitespace words
    toks = tokens(c)  # lowercased alphanumeric tokens
    n_words = F.size(words)
    n_tok = F.size(toks)
    mean_word_len = F.round(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / F.greatest(n_tok, F.lit(1)),
        6,
    )
    # symbols-per-word: '#' occurrences + ellipsis runs (the Gopher pair)
    n_symbols = (
        F.length(c) - F.length(F.regexp_replace(c, F.lit("#"), F.lit("")))
    ) + F.size(F.regexp_extract_all(c, F.lit(r"\.{3}|…"), 0))
    symbol_word_ratio = F.round(
        n_symbols.cast("double") / F.greatest(n_words, F.lit(1)), 6
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_word_ratio = F.round(
        alpha_words.cast("double") / F.greatest(n_words, F.lit(1)), 6
    )
    stop_arr = F.array(*[F.lit(s) for s in _QUALITY_STOPWORDS])
    distinct_stopwords = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))

    r_words = ((n_words >= min_words) & (n_words <= max_words)).cast("int")
    r_mean = (
        (mean_word_len >= min_mean_word_len) & (mean_word_len <= max_mean_word_len)
    ).cast("int")
    r_symbol = (symbol_word_ratio <= max_symbol_word_ratio).cast("int")
    r_alpha = (alpha_word_ratio >= min_alpha_word_ratio).cast("int")
    r_stop = (distinct_stopwords >= min_distinct_stopwords).cast("int")
    return df.select(
        "*",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        alpha_word_ratio.alias("alpha_word_ratio"),
        distinct_stopwords.alias("distinct_stopwords"),
        r_words.alias("rule_word_count"),
        r_mean.alias("rule_mean_word_len"),
        r_symbol.alias("rule_symbol_ratio"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_words * r_mean * r_symbol * r_alpha * r_stop).alias("passes_quality"),
    )


# ---------------------------------------------------------------------------
# Repetition detection
# ---------------------------------------------------------------------------


def _raw_shingles(toks: Column, k: int) -> Column:
    """Word k-grams WITHOUT dedup (repetition needs multiplicity);
    same windowing convention as :func:`operators.text.word_shingles`."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )


def with_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    ngram_sizes: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Repetition metrics per document (the Gopher repetition family):
    ``top_token_ratio`` (share of the most frequent token) and
    ``dup_{n}gram_ratio`` (1 − distinct/total word n-grams) for each
    requested n. High values flag boilerplate / degenerate text.

    Shuffle-free: per-row array arithmetic. ``top_token_ratio`` is the
    one O(u·n) expression (count each distinct token against the token
    array); documents are bounded here, and for very long documents the
    per-row independence makes an Arrow ``mapInPandas`` Counter the
    drop-in alternative — never an explode→groupBy→join-back, which
    would shuffle every token of the corpus on doc_id.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    cols = [
        F.size(toks).alias("n_tokens"),
        F.round(
            F.coalesce(top_cnt, F.lit(0)).cast("double") / n_tok, 6
        ).alias("top_token_ratio"),
    ]
    for k in ngram_sizes:
        sh = _raw_shingles(toks, k)
        cols.append(
            F.round(
                1.0
                - F.size(F.array_distinct(sh)).cast("double")
                / F.greatest(F.size(sh), F.lit(1)),
                6,
            ).alias(f"dup_{k}gram_ratio")
        )
    return df.select("*", *cols)


# ---------------------------------------------------------------------------
# Benchmark contamination screening
# ---------------------------------------------------------------------------


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool | None = None,
) -> DataFrame:
    """Per-document overlap with a benchmark/eval set: the fraction of
    the document's distinct word n-grams that appear anywhere in the
    benchmark's text (the standard train-set decontamination check,
    published as 13-gram screening for GPT-3 / Gopher evals; ``n`` is a
    dial because test corpora here are short).

    Plan: explode the document's distinct n-grams, equi-join against
    the benchmark's global distinct n-gram set, count hits per doc,
    left-join the (tiny) hit counts back onto the per-doc totals.
    Shuffle carries n-gram strings, never document bodies. The
    benchmark side is deduplicated before the join; ``broadcast_benchmark``
    is a tri-state: ``True`` forces a broadcast, ``False`` forbids it
    (a MERGE hint pins the join to sort-merge — the guard for a
    misconfigured "benchmark" that is actually huge), ``None`` (default)
    leaves the strategy to AQE.
    """
    d = df.select(
        F.col(id_col),
        F.array_distinct(_raw_shingles(tokens(F.col(text_col)), n)).alias("sh"),
    )
    exploded = d.select(id_col, F.size("sh").alias("n_ngrams"), F.explode("sh").alias("s"))
    bench = (
        benchmark.select(
            F.explode(
                F.array_distinct(_raw_shingles(tokens(F.col(text_col)), n))
            ).alias("s")
        ).distinct()
    )
    if broadcast_benchmark is True:
        bench = F.broadcast(bench)
    elif broadcast_benchmark is False:
        bench = bench.hint("merge")  # forbid broadcast: force sort-merge
    hits = exploded.join(bench, "s").groupBy(id_col).agg(
        F.count("*").alias("contaminated_ngrams")
    )
    return (
        d.select(id_col, F.size("sh").alias("total_ngrams"))
        .join(hits, id_col, "left")
        .select(
            id_col,
            "total_ngrams",
            F.coalesce("contaminated_ngrams", F.lit(0)).alias("contaminated_ngrams"),
            F.round(
                F.coalesce("contaminated_ngrams", F.lit(0)).cast("double")
                / F.greatest("total_ngrams", F.lit(1)),
                6,
            ).alias("contamination_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


def _sample_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0,100) from an md5 prefix — deterministic and
    engine-portable (DuckDB: ``CAST('0x' || substr(md5(..),1,8) AS BIGINT) % 100``),
    unlike ``rand()`` or engine-specific hashes. 32 hex-prefix bits are
    plenty of entropy for percentage bucketing."""
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % 100).alias("sample_bucket")


def hash_sample(
    df: DataFrame,
    key_col: str,
    pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ~pct% sample: rows whose md5-derived bucket
    of ``key_col`` falls below ``pct``. Re-runnable (same rows every
    time), side-file-free, and a pure filter — at 100 TB it pushes into
    the scan stage and costs one hash per row, no shuffle. ``salt``
    yields independent resamples."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be in [0,100]: {pct}")
    return df.filter(_sample_bucket(F.col(key_col), salt) < pct)


def assign_splits(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/valid/test assignment — the split step of a
    training pipeline as a PURE PROJECTION: each row's md5 bucket of
    ``key_col`` lands in a cumulative percentage band, so assignment is
    reproducible run-to-run, stable under repartitioning, needs no
    side file, and costs one hash per row with no shuffle at any
    scale. ``splits`` maps label → percentage (must sum to 100);
    default 98/1/1. ``salt`` re-deals the split without touching data.
    """
    splits = splits or {"train": 98, "valid": 1, "test": 1}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = _sample_bucket(F.col(key_col), salt)
    expr: Column | None = None
    hi = 0
    *head, (last_label, _) = splits.items()
    for label, pct in head:
        hi += pct
        cond = bucket < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    split_col = (
        expr.otherwise(last_label) if expr is not None else F.lit(last_label)
    )
    return df.withColumn("split", split_col)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_pct: int = 0,
) -> DataFrame:
    """Per-source sampling rates — the data-MIXING step of a training
    pipeline (upsample curated sources, downsample raw crawl, drop the
    rest). ``rates`` maps a source value to its keep-percentage; rows
    from unlisted sources keep ``default_pct`` (default: dropped).

    Same md5-bucket determinism as :func:`hash_sample` — one CASE over
    the per-row bucket, a pure filter that pushes toward the scan; no
    rand(), no shuffle, reproducible across runs and engines. (True
    >100% upsampling — duplication — is a separate explode step; rates
    here are keep-probabilities.)"""
    for s, p in rates.items():
        if not 0 <= p <= 100:
            raise ValueError(f"rate for {s!r} must be in [0,100]: {p}")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct must be in [0,100]: {default_pct}")
    thr: Column = F.lit(default_pct)
    for s, p in rates.items():
        thr = F.when(F.col(source_col) == s, F.lit(p)).otherwise(thr)
    return df.filter(_sample_bucket(F.col(key_col), salt) < thr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int = 100,
    salt: str = "",
) -> DataFrame:
    """Deterministic fixed-size sample per stratum: rank rows inside
    each stratum by (md5 bucket-hash, key) and keep the first
    ``n_per_stratum``. The hash makes the pick pseudo-random but
    reproducible; the key tie-break makes it total. One shuffle on the
    strata column; skewed strata are bounded by the rank cutoff (the
    window never materializes more than the partition, and AQE handles
    stragglers)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns deliberately alternation-light and lookaround-free so Java
# regex (Spark) and RE2 (DuckDB) agree on every match.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("long_digits", r"\b\d{13,19}\b", "<NUMBER>"),
)


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub the standard structured-PII shapes (emails, IPv4
    addresses, 13-19-digit account-number runs) from ``text_col`` into
    typed placeholder tokens, and attach per-kind match counts. Pure
    regexp projection — zero shuffle; patterns are applied in
    declaration order so counts are computed on the original text."""
    c = F.col(text_col)
    out_cols = []
    red = c
    for name, pat, token in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, token)
    return df.select("*", *out_cols, red.alias("text_redacted"))


# HTML markup extraction — the first stage of every web-scrape corpus
# (WET/warc-derived text cleanup). Patterns are alternation-light and
# ASCII so Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
_HTML_SCRIPT = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_HTML_COMMENT = r"(?s)<!--.*?-->"
_HTML_TAG = r"<[^>]+>"
_HTML_ENTITIES = (  # decoded in declaration order, &amp; deliberately last
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def with_html_stripped(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Markup removal for web-scraped documents: drop <script>/<style>
    blocks WITH their payload (code is not prose), drop comments, strip
    the remaining tags, decode the common entities, collapse
    whitespace. Attaches ``n_tags`` (tags stripped, counted after the
    block/comment removal so script internals don't inflate it) and
    ``text_clean``. Pure regexp projection — zero shuffle, no UDF."""
    c = F.col(text_col)
    no_blocks = F.regexp_replace(
        F.regexp_replace(c, _HTML_SCRIPT, " "), _HTML_COMMENT, " "
    )
    n_tags = F.regexp_count(no_blocks, F.lit(_HTML_TAG))
    clean = F.regexp_replace(no_blocks, _HTML_TAG, " ")
    for ent, repl in _HTML_ENTITIES:
        clean = F.replace(clean, F.lit(ent), F.lit(repl))
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    return df.select(
        "*", n_tags.alias("n_tags"), clean.alias("text_clean")
    )


def dictionary_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 256,
    oov_id: int = 0,
) -> DataFrame:
    """Tokenize → numericalize: the input-pipeline step that turns a
    text corpus into integer id sequences for training. The dictionary
    is the ``vocab_size`` most frequent tokens under the TOTAL order
    (count desc, token asc) — deterministic across runs and engines —
    with ids 1..vocab_size; everything else maps to ``oov_id``.

    Scale shape: the vocab ranking window runs over the AGGREGATED
    token table (≤ |vocab| rows after the top-k cut, never the corpus),
    the trained dictionary broadcasts into the encode join, and each
    document's id sequence reassembles from (position, id) pairs in one
    grouped ``array_sort`` — two shuffles total (token count, doc
    regroup), no per-row Python. Documents with no tokens keep an
    empty sequence. Returns (id, ids array<int>, n_tokens, n_oov)."""
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(vocab_size)
    # ranking window over ≤ vocab_size rows (post-top-k), not the corpus
    vocab = top.withColumn(
        "tid",
        F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("tok").asc())),
    ).select("tok", "tid")
    enc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .withColumn("tid", F.coalesce(F.col("tid"), F.lit(oov_id)))
    )
    agg = enc.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s["tid"],
        ).alias("ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tid") == oov_id, 1).otherwise(0)).alias("n_oov"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("ids"), F.array().cast("array<int>")).alias("ids"),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0).cast("long")).alias("n_oov"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent tokens with
    counts and document frequency, ordered (count desc, token asc) so
    ties are total. explode→partial-agg→top-k: the shuffle carries
    (token, partial count/df) pairs — map-side combine collapses each
    partition to its distinct tokens first, and the final top-k is a
    TakeOrdered, not a global sort."""
    toks = (
        df.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
    )
    term = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("term_freq"))
    )
    return (
        term.join(toks, "tok")
        .orderBy(F.col("term_freq").desc(), F.col("tok").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split every document into overlapping token windows — the
    pre-training/RAG preprocessing step that turns a document corpus
    into a training-example corpus. Chunk *i* covers whitespace tokens
    ``[i·step, i·step + chunk_tokens)`` with ``step = chunk_tokens −
    overlap``; the final chunk may be short, and every document yields
    at least one chunk.

    Pure codegen column work: split → per-row ``sequence``/``slice``
    expansion → one explode. No shuffle, no UDF — chunking 100 TB is a
    map-only pass whose output row count is bounded by
    ``n_tokens/step`` per doc. Whitespace tokenization (case/punctuation
    preserved inside tokens) because chunks must carry the ORIGINAL
    text; count tokens for budgeting with operators/text.py estimators
    instead.

    Returns (id, chunk_id, n_chunks, chunk_text, n_chunk_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens: overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(step)).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(F.slice("__toks", i * step + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_tokens), F.col("__n") - i * step)
            .cast("int")
            .alias("n_chunk_tokens"),
        ),
    )
    return (
        base.select(F.col(id_col), n_chunks.alias("n_chunks"), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            "n_chunks",
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        )
    )


def dedup_chunks(
    df: DataFrame,
    chunk_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document chunk-level dedup (the CCNet paragraph-dedup move
    at token-window granularity — these corpora have no paragraph
    breaks): split every document into NON-overlapping
    ``chunk_tokens``-token windows, fingerprint each window, keep the
    globally-first occurrence of every fingerprint (ordered by
    (doc_id, chunk_id)), and reassemble each document from its
    surviving chunks. Boilerplate shared across documents (headers,
    navigation, license blocks) disappears from every copy but the
    first, while unique prose survives untouched.

    Scale shape: chunking is the map-only ``chunk_documents`` pass;
    winner selection is ONE window over the chunk fingerprint (the
    chunk text must cross a shuffle anyway for reassembly, so a
    row_number window on the digest is strictly better than an
    agg+rejoin which would shuffle it twice); reassembly is one
    groupBy(doc) with an ``array_sort`` over collected (chunk_id,
    text) structs — deterministic under any arrival order. Two
    shuffles total, both keyed on 16-byte digests / doc ids.

    Returns (doc_id, total_chunks, kept_chunks, kept_tokens,
    dedup_text); documents whose every chunk was seen earlier come
    back with kept_chunks = 0 and an empty dedup_text — downstream
    filters drop or keep them by policy.
    """
    chunks = chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=0,
        text_col=text_col, id_col=id_col,
    ).withColumn("__fp", F.md5(F.col("chunk_text")))
    w = Window.partitionBy("__fp").orderBy(id_col, "chunk_id")
    ranked = chunks.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_chunks"),
            F.sum(F.when(F.col("__rk") == 1, 1).otherwise(0))
            .cast("int")
            .alias("kept_chunks"),
            F.sum(
                F.when(F.col("__rk") == 1, F.col("n_chunk_tokens")).otherwise(0)
            )
            .cast("int")
            .alias("kept_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rk") == 1,
                                F.struct("chunk_id", "chunk_text"),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


def pack_training_sequences(
    df: DataFrame,
    seq_len: int = 1024,
    *,
    partition_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing plan (GPT-style): lay the
    corpus out as one token stream per ``partition_col`` group, in
    deterministic ``order_col`` order, and compute each document's
    token span and the fixed-length training sequences it lands in.

    This is the PLAN for the packer — the (doc → token offsets → seq
    ids) map a downstream writer consumes to emit packed sequences.
    Pure integer window arithmetic (running token sum per group, DIV
    for bin ids), so it is engine-exact and embarrassingly parallel:
    each group packs independently (one shuffle on ``partition_col``
    + in-group ordered scan); no global token stream is materialized.
    Documents may span sequence boundaries by design (``n_seqs`` > 1),
    exactly like causal-LM pretraining packing.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n_tok = token_count(text_col)
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        df.select(order_col, partition_col, n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)  # empty docs add nothing to the stream
        .withColumn("token_end", F.sum("n_tokens").over(w))
        .withColumn("token_start", F.col("token_end") - F.col("n_tokens"))
    )
    return spans.select(
        order_col,
        partition_col,
        "n_tokens",
        "token_start",
        "token_end",
        F.expr(f"token_start DIV {seq_len}").alias("first_seq"),
        F.expr(f"(token_end - 1) DIV {seq_len}").alias("last_seq"),
        (
            F.expr(f"(token_end - 1) DIV {seq_len}")
            - F.expr(f"token_start DIV {seq_len}")
            + 1
        ).alias("n_seqs"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns — the
    privacy gate a dataset passes before release: every combination of
    quasi-identifiers (an *equivalence class*) must cover at least
    ``k`` individuals, or those rows are re-identifiable by linking.
    Returns one row per equivalence class with its size and an
    ``at_risk`` flag; a release gate is ``at_risk`` count == 0, and
    the fix is generalizing (bucketing) the offending columns and
    re-auditing.

    One map-side-combinable aggregate at quasi-identifier grain — at
    100 TB the output is |distinct combinations|, and the audit
    composes with :func:`~.quality` gates like any other check."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < k)
    )


def systematic_pps_sample(
    df: DataFrame,
    weight_col: str,
    group_col: str,
    n_per_group: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic probability-proportional-to-size sampling,
    systematic form (Madow 1949): within each group, lay an evenly
    spaced grid of ``n_per_group`` tickets over the cumulative integer
    weight line and keep every row a grid point lands on — selection
    probability ∝ weight, zero randomness, reproducible at any
    parallelism (the classic survey-sampling design, here as the
    data-mixing sampler that favors long/heavy documents without a
    rand() seed).

    All arithmetic is exact BIGINT (cumulative weights × ticket
    counts), so the sample is bit-identical across engines and
    partitionings — the same determinism discipline as the md5 bucket
    samplers. Rows heavier than one grid step get ``n_tickets > 1``
    (certainty selections, the standard PPS outcome).

    Scale shape: one window partitioned BY GROUP (never global) for the
    prefix sum + one broadcastable per-group total — no single-partition
    exchange; the selection predicate is a pure projection.
    """
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1: {n_per_group}")
    from pyspark.sql import Window

    wq = F.greatest(F.col(weight_col).cast("long"), F.lit(1))
    wp = Window.partitionBy(group_col)
    cum = F.sum("__wq").over(
        wp.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    total = F.sum("__wq").over(wp)
    n = int(n_per_group)
    staged = df.select(F.col(id_col), F.col(group_col), wq.alias("__wq")).select(
        "*", cum.alias("__cum"), total.alias("__total")
    )
    # `div` (integer division) keeps the grid arithmetic exact at ANY
    # cumulative-weight magnitude — bigint `/` would detour through
    # double and lose floor-exactness past 2^53 (a real risk at 100 TB
    # corpus weights), and for positive ints floor(a/b) == a div b
    tickets = F.expr(
        f"(__cum * {n}) div __total - ((__cum - __wq) * {n}) div __total"
    )
    return (
        staged.withColumn("n_tickets", tickets.cast("long"))
        .filter(F.col("n_tickets") >= 1)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("__wq").alias("weight"),
            "n_tickets",
        )
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit — the refinement of :func:`k_anonymity_report`
    for the homogeneity attack: a class can hold ≥ k individuals yet
    leak the sensitive attribute outright when they all share one
    value (Machanavajjhala et al., ICDE 2006). Reports, per
    quasi-identifier class, the class size, the count of DISTINCT
    sensitive values (distinct l-diversity; ``at_risk`` when < l), and
    the sensitive-value entropy (entropy l-diversity's gate quantity).

    Entropy stays hash-deterministic via the repo's fixed-point rule:
    ``H = ln N − (Σ cᵢ·ln cᵢ)/N`` with each ``ln cᵢ`` rounded to
    integer micro-units BEFORE the sum, so the only floats are one
    ``ln`` and one division per class — never a float accumulation.

    Two stacked map-side-combinable aggregates: (class × sensitive)
    grain, then class grain — output is |classes| rows at any scale.
    """
    per = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_micro = F.round(
        F.lit(1_000_000.0) * F.log(F.col("c").cast("double")), 0
    ).cast("long")
    cls = per.groupBy(*quasi_cols).agg(
        F.sum("c").alias("class_size"),
        F.count(F.lit(1)).alias("distinct_sensitive"),
        F.sum(F.col("c") * w_micro).alias("s_micro"),
    )
    entropy = F.round(
        F.log(F.col("class_size").cast("double"))
        - F.col("s_micro") / (F.lit(1_000_000.0) * F.col("class_size")),
        6,
    )
    return cls.select(
        *quasi_cols,
        "class_size",
        "distinct_sensitive",
        entropy.alias("entropy_r6"),
        (F.col("distinct_sensitive") < l).alias("at_risk"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp-v1",
) -> DataFrame:
    """ε-differentially-private noisy counts: per-group count plus
    Laplace(1/ε) noise via the inverse CDF,
    ``-(1/ε)·sign(u−½)·ln(1−2|u−½|)``.

    ``u`` is NOT a random draw — it derives from md5(seed|group key),
    uniform on (0,1) and fixed per (seed, key). That is a deliberate
    engineering trade, not a shortcut: re-releasing the same query must
    NOT spend fresh privacy budget or let averaging wash the noise out,
    so production DP systems memoize noise per (release, key) exactly
    like this — here the memo IS the hash function, which also makes
    the release bit-reproducible across engines and reruns. Rotating
    ``seed`` is what spends budget (ε per distinct seed, by
    composition). True counts are never emitted.

    One aggregate; the noise is a handful of scalar expressions on the
    |groups|-row result. Callers release counts only for PUBLICLY
    enumerable group keys — emitting a row per *observed* secret key
    would itself leak membership (the known DP-over-GROUP-BY caveat).
    """
    cnt = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    key = F.concat_ws(
        "|", F.lit(seed), *[F.col(c).cast("string") for c in group_cols]
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("double")
        / F.lit(float(1 << 48))
    )
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return cnt.select(
        *group_cols,
        F.round(F.col("n") + noise, 4).alias("noisy_count_r4"),
    )


def aes_weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "aes-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    A-ES keys (IPL 2006): each row draws ``u`` uniform on (0,1) and the
    sample is the top-``n`` by ``u^(1/w)`` — ranked here by the
    monotone-equivalent ``ln(u)/w`` (better conditioned near 1; same
    order). P(row in sample) is exactly the weighted
    without-replacement process, which systematic PPS
    (:func:`systematic_pps_sample`) only approximates per-stratum.

    ``u`` derives from md5(salt|id) — the repo's reproducible-sampling
    rule: the "random" order is a pure projection, identical at any
    parallelism, re-dealable by salt. Top-n is TakeOrdered (partial
    per-partition top-k, no global sort); rows with non-positive
    weights are excluded (A-ES requires w > 0).

    Returns the sampled rows' ``(id, weight, aes_key_r9)`` ordered by
    key descending — deterministic total order with the id tiebreak.
    """
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 48))
    )
    return (
        df.filter(w > 0)
        .select(
            F.col(id_col),
            w.alias("weight"),
            F.round(F.log(u) / w, 9).alias("aes_key_r9"),
        )
        .orderBy(F.desc("aes_key_r9"), F.col(id_col))
        .limit(n)
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    epochs: int = 2,
    salt: str = "",
) -> DataFrame:
    """Deterministic multi-epoch training order: every epoch is an
    independent pseudo-random permutation of the corpus, keyed by
    ``md5(key:salt:epoch)`` — the global-shuffle step a training-data
    pipeline runs before sharding examples to data loaders. Hash-keyed
    instead of ``rand()`` so the order is reproducible run-to-run,
    stable under any partitioning, and resumable mid-epoch (position k
    is a pure function of the key, not of execution history).

    Positions are GLOBAL per epoch without a single-partition window:
    epochs explode map-side (each row becomes ``epochs`` rows — the
    only fan-out), :func:`~..plans.analytics.global_row_number` stamps
    a total order over (epoch, hash) with a range shuffle, and a tiny
    per-epoch min-offset aggregate (≤ epochs rows, broadcast back)
    rebases each epoch to 1..N. At 100 TB the natural form is one
    range-sorted write per epoch; this is the same plan.

    Output: (epoch, key, shuffle_pos) — shuffle_pos in [1, N] within
    each epoch.
    """
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        global_row_number,
    )

    if epochs < 1:
        raise ValueError(f"epochs must be >= 1: {epochs}")
    exploded = df.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch"),
    ).select(
        "epoch",
        F.col(key_col),
        F.md5(
            F.concat_ws(
                ":",
                F.col(key_col).cast("string"),
                F.lit(salt),
                F.col("epoch").cast("string"),
            )
        ).alias("__h"),
    )
    numbered = global_row_number(
        exploded, ["epoch", "__h", key_col], out_col="__rn"
    )
    base = numbered.groupBy("epoch").agg(F.min("__rn").alias("__base"))
    return (
        numbered.join(F.broadcast(base), "epoch")
        .select(
            "epoch",
            F.col(key_col),
            (F.col("__rn") - F.col("__base") + 1).alias("shuffle_pos"),
        )
    )


def dsir_importance(
    df: DataFrame,
    target_filter: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023, arXiv:2302.03169) scoring: estimate hashed-unigram bag-of-
    words models for a TARGET domain (the rows matching
    ``target_filter``) and for the RAW corpus, then score every
    document by its log importance weight
    ``Σ_tokens ln p_target(bucket)/p_raw(bucket)`` — documents that
    look like the target domain score high and get up-sampled into the
    training mixture (pair with ``pps_sample``/``quality_weighted_
    sample`` for the resampling step).

    Hashing trick exactly as in the paper: unigrams → ``n_buckets``
    via an md5-prefix bucket (portable across engines, unlike
    ``xxhash``); both models are Laplace-smoothed ``(cnt+1)/(tot+B)``
    so unseen buckets stay finite. Plan shape for 100 TB: ONE explode
    over tokens feeds (a) two vocabulary-bucket-grain conditional-sum
    aggregates (map-side combinable, ≤ B rows — the trained state is
    bounded exactly like the BPE vocab and k-means centroids), and
    (b) a doc-keyed exact aggregate after a broadcast join of the
    B-row model table. Token log-ratios are quantized to 1e-6
    fixed-point BIGINTs before the per-doc sum — order-insensitive
    under any partial-agg schedule, mirrored bit-for-bit by the
    DuckDB oracle (1e-6, not finer: the grid must dominate the
    ulp disagreement between JVM and libm logarithms — see the
    inline comment).

    Output: (id, n_tokens, dsir_logweight) — higher = more
    target-like.
    """
    toks = df.select(
        F.col(id_col),
        target_filter.cast("int").alias("__tgt"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select(
        id_col,
        "__tgt",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )
    model = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum("__tgt").alias("n_tgt"),
    )
    totals = model.agg(
        F.sum("n_raw").alias("tot_raw"), F.sum("n_tgt").alias("tot_tgt")
    )
    b = float(n_buckets)
    p_tgt = (F.col("n_tgt") + 1).cast("double") / (F.col("tot_tgt") + b)
    p_raw = (F.col("n_raw") + 1).cast("double") / (F.col("tot_raw") + b)
    # token log-ratios quantize at 1e-6, not 1e-9: JVM StrictMath.log
    # and DuckDB's libm ln disagree in the last ulp for a handful of
    # the 1024 bucket ratios, and at the 1e-9 grid that ulp flips the
    # quantized value — 8 of 500k docs hash-mismatched at the x100
    # tier. At 1e-6 the grid sits ~4 orders of magnitude above ulp
    # noise (flip window ~1e-10 of a cell), and the per-doc sum stays
    # integer-exact / order-insensitive as before.
    scored = (
        toks.join(model.crossJoin(F.broadcast(totals)), "bucket")
        .select(
            F.col(id_col),
            F.round(F.log(p_tgt / p_raw) * F.lit(1e6)).cast("long").alias("lr_q"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("lr_q").cast("double") / F.lit(1e6), 6).alias(
            "dsir_logweight"
        ),
    )


def temperature_mixture_rates(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled mixture rates — the multilingual/multi-source
    sampling formula (mT5/XLM-R style): sample source s with
    probability ``q_s ∝ p_s^alpha``, flattening the head and boosting
    the tail so low-resource sources aren't drowned (alpha=1 keeps the
    natural mix, alpha→0 approaches uniform). This derives the PER-
    SOURCE RATES that :func:`mixture_sample` then applies.

    One source-grain count aggregate (map-side combinable, |sources|
    rows) and a broadcast total — nothing else touches the corpus.
    Float discipline: ``p_s^alpha`` is quantized to a 1e-9 fixed-point
    BIGINT before the normalization sum, so the denominator is
    integer-exact and order-insensitive — the same quantize-then-sum
    rule as every other trained statistic here.

    Output per source: ``n_docs``, ``p_raw`` (natural share, 9 dp),
    ``q_temp`` (temperature share, 9 dp), ``boost`` = q/p (6 dp — >1
    means up-sampled), ``expected_docs`` (q·N rounded to nearest).
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("tot"))
    with_p = counts.crossJoin(F.broadcast(total)).select(
        source_col,
        "n_docs",
        "tot",
        F.round(
            F.pow(F.col("n_docs").cast("double") / F.col("tot"), F.lit(alpha))
            * F.lit(1e9)
        )
        .cast("long")
        .alias("pq_q"),
    )
    denom = with_p.agg(F.sum("pq_q").alias("den"))
    return (
        with_p.crossJoin(F.broadcast(denom))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("tot"), 9).alias(
                "p_raw"
            ),
            F.round(
                F.col("pq_q").cast("double") / F.col("den").cast("double"), 9
            ).alias("q_temp"),
            F.round(
                (F.col("pq_q").cast("double") / F.col("den").cast("double"))
                / (F.col("n_docs").cast("double") / F.col("tot")),
                6,
            ).alias("boost"),
            F.round(
                F.col("pq_q").cast("double")
                / F.col("den").cast("double")
                * F.col("tot")
            )
            .cast("long")
            .alias("expected_docs"),
        )
    )


def content_defined_chunks(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    divisor: int = 8,
) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync idea on a token
    stream): a chunk boundary falls after token ``i`` whenever the md5
    bucket of the trailing ``window``-gram hits ``0 mod divisor`` —
    boundaries are decided by CONTENT, not position, so inserting or
    deleting a token early in a document only perturbs the chunks
    around the edit; every later chunk re-synchronizes and still
    matches its twin in a near-duplicate. Fixed-size chunking
    (``chunk_documents``/``dedup_chunks``) misaligns everything after
    the edit — this operator is the robust sibling, feeding the same
    chunk-level dedup/audit machinery. Expected chunk length =
    ``divisor`` tokens.

    Scale shape: the boundary-flag array is ONE ``transform`` over the
    token array (per-row projection, zero shuffle); chunk membership is
    a prefix count of flags via a PER-DOCUMENT window (partitioned by
    id — bounded by document length, never global); chunk reassembly
    is one (id, chunk_id) aggregate. Document bodies shuffle once, at
    the reassembly — the same single-reassembly-shuffle budget as
    ``chunk_documents``.

    Output: (id, chunk_id, first_pos, n_tokens, chunk_text).
    """

    def gram_bucket(i: Column) -> Column:
        """md5 bucket of the window-gram ending at 1-based position i."""
        gram = F.array_join(F.slice(F.col("t"), i - (window - 1), window), " ")
        return (
            F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long") % divisor
        )

    flagged = df.select(F.col(id_col), tokens(text_col).alias("t")).withColumn(
        "flags",
        F.transform(
            F.sequence(F.lit(1), F.size("t")),
            lambda i: F.when(
                (i >= F.lit(window)) & (gram_bucket(i) == 0), 1
            ).otherwise(0),
        ),
    )
    pairs = flagged.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip("t", "flags")).alias("pos0", "z"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.col("z.t").alias("tok"),
        F.col("z.flags").alias("b"),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = pairs.select(
        id_col,
        "pos",
        "tok",
        F.coalesce(F.sum("b").over(win), F.lit(0)).alias("chunk_id"),
    )
    return chunked.groupBy(id_col, "chunk_id").agg(
        F.min("pos").alias("first_pos"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk_text"),
    )

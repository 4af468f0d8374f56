"""Text-analysis operators for training-data pipelines.

North-star scope (BASELINE.json): language ID, quality scoring, token
counting, document fingerprinting over the ``documents`` table. All of it
is pure JVM-side Column expressions (split / higher-order array functions
/ regexp arithmetic) — no Python in the executor path, so these run at
full whole-stage-codegen speed over 100 TB of text.

Tokenization convention used across every operator (and mirrored in the
DuckDB oracles): lowercase, split on non-alphanumeric runs, drop empty
tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword-hit heuristic.
# Deliberately small: the heuristic is a cheap first-pass router, not a
# classifier; at scale a model-based scorer slots in behind the same API.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "des"),
}

_QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens.

    ``regexp_extract_all`` rather than split-then-filter: it yields no
    empty tokens by construction, and it's a native Catalyst expression
    (codegen) where the higher-order ``filter`` lambda is interpreted —
    measured ~5× faster on the documents corpus.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array<string> — the unit of
    n-gram Jaccard similarity and MinHash signatures.

    Formulated as a ``zip_with`` concat fold over shifted slices — the
    string twin of :func:`shingle_hashes_from`, and for the same
    optimizer reason: the old ``transform(sequence(...), i ->
    array_join(slice(toks, i+1, k)))`` form references the OUTER token
    array inside the lambda, and Catalyst neither CSEs through
    higher-order lambdas nor stops optimizer rules inlining the whole
    ``tokens()`` regexp into the lambda body — re-tokenizing the
    document once per shingle POSITION (measured ~3× on the sf0.1 kmv
    shingle explode). The fold's lambdas touch only their element
    arguments; ``concat_ws`` skips the NULLs that pad slices past the
    array end, reproducing the one-partial-shingle behavior for
    documents shorter than k tokens, and the degenerate branch keeps
    the empty/NULL-text outputs bit-identical to the old form
    (empty → [""], NULL → [NULL])."""
    toks = tokens(col)
    h = toks
    for j in range(2, k + 1):
        tail = F.slice(
            toks, j, F.greatest(F.size(toks) - (j - 1), F.lit(1))
        )
        h = F.zip_with(h, tail, lambda x, y: F.concat_ws(" ", x, y))
    out = F.slice(h, 1, F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    # empty token array → [""], NULL tokens → [NULL] — exactly what the
    # sequence/array_join form produced for those inputs
    degenerate = F.array(F.array_join(F.slice(toks, 1, k), " "))
    arr = F.when(
        F.coalesce(F.size(toks), F.lit(0)) == 0, degenerate
    ).otherwise(out)
    return F.array_distinct(arr)


def token_hashes(col: Column | str) -> Column:
    """Per-token 64-bit hashes (``array<long>``) — the bound input for
    :func:`shingle_hashes_from`. ALWAYS alias this in its own select
    before consuming it there: the two-projection split is load-bearing
    (see shingle_hashes_from)."""
    return F.transform(tokens(col), lambda t: F.xxhash64(t))


def shingle_hashes_from(
    th: Column | str, k: int = 3, *, distinct: bool = True
) -> Column:
    """Distinct word k-gram shingles as an array<long> of 64-bit hashes,
    composed from a BOUND token-hash array column (:func:`token_hashes`
    aliased in a prior select) — the scale-path twin of
    :func:`word_shingles` for pipelines that only ever CONSUME hashed
    shingles (MinHash signatures, inverted indexes, Jaccard
    verification over hashed sets).

    Each shingle hash is ``xxhash64(h_i, …, h_{i+k-1})`` over the k
    token hashes instead of hashing the joined shingle STRING: the
    slice + array_join allocation was ~90% of the MinHash signature
    stage's CPU at the x100 tier (measured 394s of 435s executor-CPU —
    string building, not hashing or aggregation). Distinct shingles map
    to distinct hash tuples, so set cardinalities/intersections match
    the string form modulo 64-bit collisions (~n²/2⁶⁴ per pair — the
    same accepted risk as hashing the strings).

    Formulated as a ``zip_with`` chain over shifted slices — NEVER as a
    lambda that indexes into the outer array. The indexing form
    (``transform(sequence(...), i -> xxhash64(get(th, i), ...))``)
    re-evaluates every inlined copy of ``th`` PER ELEMENT because
    Catalyst does not common-subexpression-eliminate through
    higher-order lambdas, and optimizer rules DO inline this expression
    wholesale (InferFiltersFromGenerate's ``size(sh) > 0`` pushes below
    the _spread exchange with the full expression substituted in —
    measured 153 s vs 16 s at x100 for the inverted-index explode,
    O(len²) per document). The zip_with lambdas touch only their
    element arguments, so ANY number of inlined copies stays O(k·len).
    The shingle hash is the left fold ``xxhash64(…xxhash64(h_i,
    h_{i+1})…, h_{i+k-1})``; slices past the array end contribute
    nulls, which xxhash64 skips deterministically — that also yields
    word_shingles' one-partial-shingle behavior for documents shorter
    than k tokens, and token-less documents produce the constant
    empty-shingle hash (mirroring the string form's single ""
    shingle), so shingle-equality relations between documents match
    the string form exactly. NULL text is treated as token-less (the
    constant empty-shingle hash) rather than the string form's single
    NULL shingle — a NULL shingle can never equi-join anyway, and the
    doc must still produce its one exploded row or it vanishes from
    every n_sh/minhash/containment computation downstream (pinned by
    tests/test_extensions.py::test_shingle_hashes_edge_cases)."""
    c = F.col(th) if isinstance(th, str) else th
    h = c
    for j in range(2, k + 1):
        tail = F.slice(c, j, F.greatest(F.size(c) - (j - 1), F.lit(1)))
        h = F.zip_with(h, tail, lambda x, y: F.xxhash64(x, y))
    out = F.slice(h, 1, F.greatest(F.size(c) - (k - 1), F.lit(1)))
    empty = F.array(F.xxhash64(F.lit(None).cast("long")))
    # size(NULL) is NULL, not 0: a NULL token-hash array (NULL text)
    # must take the constant empty-shingle branch like the string form
    # does, or NULL-text docs silently produce ZERO exploded shingle
    # rows and vanish from every minhash/jaccard/containment pipeline.
    arr = F.when(F.coalesce(F.size(c), F.lit(0)) == 0, empty).otherwise(out)
    # distinct=False keeps the positional MULTISET (one hash per window
    # position) for frequency-weighted consumers (tf-idf shingle
    # cosine); the default distinct SET is the Jaccard/MinHash unit.
    return F.array_distinct(arr) if distinct else arr


def _stopword_hits(toks: Column, stops: tuple[str, ...]) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, character count, alpha ratio, stopword ratio, and a
    composite quality score in [0,1]. One projection, no shuffle."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    n_char = F.length(c)
    alpha_ratio = F.round(
        F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double")
        / F.greatest(n_char, F.lit(1)),
        6,
    )
    stop_ratio = F.round(
        _stopword_hits(toks, _QUALITY_STOPWORDS).cast("double")
        / F.greatest(n_tok, F.lit(1)),
        6,
    )
    mean_tok_len = F.round(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / F.greatest(n_tok, F.lit(1)),
        6,
    )
    # heuristic quality: enough tokens, mostly alphabetic, sane word length
    score = F.round(
        F.least(n_tok.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + alpha_ratio * 0.4
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), 0.2).otherwise(0.0),
        6,
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_calc"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
        score.alias("quality_score"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language router over :data:`LANG_STOPWORDS`, with a
    CJK-character-ratio test for 'zh'. Deterministic tie-break: the
    fixed en > de > es > fr priority chain (>= comparisons)."""
    c = F.col(text_col)
    toks = tokens(c)
    scores = {lang: _stopword_hits(toks, sw) for lang, sw in LANG_STOPWORDS.items()}
    cjk_ratio = F.length(F.regexp_replace(c, "[\\x00-\\x7F]", "")).cast(
        "double"
    ) / F.greatest(F.length(c), F.lit(1))
    pred = (
        F.when(cjk_ratio > 0.3, "zh")
        .when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["fr"]),
            "en",
        )
        .when((scores["de"] >= scores["es"]) & (scores["de"] >= scores["fr"]), "de")
        .when(scores["es"] >= scores["fr"], "es")
        .otherwise("fr")
    )
    return df.select("*", pred.alias("lang_pred"))


# GPT-2-style pretokenizer shape: contractions, letter runs, digit runs,
# punctuation runs (each with optional leading space). A real BPE merges
# within these pretokens; counting them is the standard cheap estimator
# for LLM token budgeting. Whitespace between pretokens is simply not
# matched (extract_all skips gaps), so no whitespace alternative needed.
_BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def with_token_estimates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-count estimators for LLM data budgeting: whitespace tokens,
    BPE-style pretoken count (regex above), and the chars/4 heuristic —
    all native regexp expressions, no tokenizer library in the path."""
    c = F.col(text_col)
    ws = F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0))
    pretoks = F.size(F.regexp_extract_all(c, F.lit(_BPE_PRETOKEN_RE), 0))
    chars4 = F.ceil(F.length(c) / 4).cast("long")
    return df.select(
        "*",
        ws.alias("n_ws_tokens"),
        pretoks.alias("n_bpe_pretokens"),
        chars4.alias("n_tokens_chars4"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a constant query over the corpus —
    the scored keyword search a training-data pipeline uses for targeted
    subset mining (and the exact baseline for any ANN text retriever).

    Shape for 100 TB: because the query is a small CONSTANT term set,
    no inverted index is materialized — per-term term frequencies are
    per-row array expressions (codegen), corpus statistics (N, avgdl,
    per-term document frequencies) come from ONE tiny aggregate that is
    broadcast back, and the top-k is TakeOrderedAndProject. Two scans
    of the corpus total, zero wide shuffles; reuse the stats row across
    queries by caching it.

    Float discipline: idf/tf-norm chains are written with identical
    parenthesization in the DuckDB oracle (queries.py) and scores round
    to 6 decimals before ranking, so the top-k frontier is engine-stable;
    ties break on the document id.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = tokens(text_col)
    dl = F.size(toks)

    def tf(t: str) -> Column:
        # size-difference via array_remove: native codegen expression,
        # unlike a higher-order filter(lambda) which runs interpreted
        return F.size(toks) - F.size(F.array_remove(toks, t))

    base = df.select(
        F.col(id_col),
        dl.alias("dl"),
        *[tf(t).alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    score: Column | None = None
    for i in range(len(query_terms)):
        tf_d = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs").cast("double") - F.col(f"df_{i}").cast("double") + 0.5)
            / (F.col(f"df_{i}").cast("double") + 0.5)
            + 1.0
        )
        term = idf * (tf_d * F.lit(k1 + 1.0)) / (tf_d + norm)
        score = term if score is None else score + term
    return (
        scored.select(
            F.col(id_col), F.round(score, 6).alias("bm25_score")
        )
        .filter(F.col("bm25_score") > 0.0)
        .orderBy(F.desc("bm25_score"), F.col(id_col))
        .limit(k)
    )


def unigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram cross-entropy (mean −ln p(token), nats) under
    the corpus's own unigram model — the self-contained stand-in for the
    KenLM-style perplexity filter every LLM data pipeline runs: documents
    whose tokens are systematically improbable (boilerplate, encoding
    garbage, wrong-language residue) score high and get culled.

    Shape for 100 TB: one token-keyed count aggregate (map-side partial,
    vocabulary-sized result), one stats row broadcast for the corpus
    total, one join of the exploded tokens against the vocabulary
    (AQE broadcasts it while it fits; it shuffle-joins on the 64-bit-ish
    token key beyond that), then a doc-keyed exact aggregate. Nothing
    touches document bodies after the explode.

    Float discipline: per-token −ln p is quantized to a 1e-9 fixed-point
    BIGINT before the per-doc sum, so the sum is integer-exact and
    ORDER-INSENSITIVE — safe under any partial-aggregation schedule and
    reproducible against the DuckDB oracle, which mirrors the same
    quantize-then-sum (ln over identical doubles, one final division).
    Docs with zero alphanumeric tokens drop out (no model support).
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("tot"))
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("tot")) * F.lit(1e9)
            )
            .cast("long")
            .alias("logp_q"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            -F.sum("logp_q").cast("double") / F.lit(1e9) / F.count(F.lit(1)), 6
        ).alias("surprisal_nats"),
    )


def content_fingerprint(col: Column | str) -> Column:
    """Whitespace/case-normalized md5 content fingerprint — THE shared
    exact-dedup key. Single definition on purpose: ``dedup_exact``,
    ``dedup_stream`` and ``with_fingerprint`` all compare by this
    expression, and their cross-operator keep-set equivalence holds only
    while the normalization stays byte-identical."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.lower(F.regexp_replace(c, "\\s+", " "))))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized md5 content fingerprint — the exact-dedup
    key and the cheap doc identity for lineage."""
    return df.select("*", content_fingerprint(text_col).alias("fingerprint"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every k-token gram, slide a window
    of ``w`` consecutive gram hashes, and select the RIGHTMOST minimal
    hash of each window. The selection guarantees that any shared run
    of at least ``w + k - 1`` tokens between two documents yields at
    least one shared fingerprint, while keeping the per-document
    fingerprint density at ~2/(w+1) — the local, position-robust
    alternative to :func:`content_fingerprint`'s whole-document key and
    to MinHash's set-level signature (winnowing preserves WHERE the
    match is, which is what plagiarism/provenance audits need).

    Returns ``(id_col, pos, fp_hash)`` — one row per selected
    fingerprint, ``pos`` the 1-based gram position. Documents shorter
    than ``k + w - 1`` tokens (no full window) produce no rows, the
    same boundary convention as the reference's span audits.

    Scale shape: the whole computation is PER-DOCUMENT array math in
    one projection — gram hashing, window folds, and the dedup of
    adjacent windows' repeated picks (``array_distinct`` BEFORE the
    explode, duplicates only ever occur within a document) are all
    map-side; the operator shuffles NOTHING. Gram hashes are md5-prefix
    60-bit ints rather than xxhash64 so DuckDB oracles can reproduce
    them (the fingerprint IS the output here, unlike the internal-only
    shingle hashes of :func:`shingle_hashes_from`). The token array is
    bound in its own projection before the window lambdas consume it —
    the same CSE-through-lambda discipline as shingle_hashes_from;
    per-window work touches only the bound ``ph`` column, so the fold
    is O(n·w) per document regardless of optimizer inlining."""
    toks = tokens(text_col)
    d = df.select(F.col(id_col), toks.alias("t")).filter(
        F.size("t") >= k + w - 1
    )
    # (pos, hash) structs per gram, bound before the window lambdas.
    ph = d.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (k - 1)),
            lambda i: F.struct(
                i.cast("long").alias("p"),
                F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice("t", i, k), " ")), 1, 15
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("h"),
            ),
        ).alias("ph"),
    )
    # Rightmost minimum of each w-window: left fold keeping the later
    # element on ties (<=), init = sentinel above any 60-bit hash.
    init = F.struct(
        F.lit(-1).cast("long").alias("p"),
        F.lit(1 << 62).cast("long").alias("h"),
    )
    sel = ph.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("ph") - (w - 1)),
                    lambda s: F.aggregate(
                        F.slice("ph", s, w),
                        init,
                        lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(
                            acc
                        ),
                    ),
                )
            )
        ).alias("fp"),
    )
    return sel.select(
        id_col, F.col("fp.p").alias("pos"), F.col("fp.h").alias("fp_hash")
    )


def winnow_shared_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowed fingerprints —
    MOSS's candidate-pair report. Fingerprints occurring in more than
    ``max_df`` documents are dropped BEFORE pairing (MOSS's ubiquitous-
    hash suppression: boilerplate fingerprints carry no authorship
    signal), which is also the scale safety valve — per-hash pair
    fanout is bounded by max_df², so no heavy-hitter hash can produce
    a quadratic join blowup. Returns ``(doc_a, doc_b, n_shared)``.

    Scale shape: fingerprinting is map-side (:func:`winnow_fingerprints`
    shuffles nothing); the doc-level distinct and df-filter shuffle only
    (id, hash) pairs; the pair join shuffles on fp_hash with bounded
    postings. The min_shared HAVING runs map-side-partial on the
    (doc_a, doc_b) grain."""
    fps = (
        winnow_fingerprints(df, text_col, id_col, k=k, w=w)
        .select(id_col, "fp_hash")
        .distinct()
    )
    keep = (
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("fp_hash")
    )
    e = fps.join(keep, "fp_hash")
    a = e.select(F.col("fp_hash"), F.col(id_col).alias("doc_a"))
    b = e.select(F.col("fp_hash"), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def boilerplate_span_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    min_docs: int = 3,
    df_frac: float = 0.005,
) -> DataFrame:
    """Per-document boilerplate exposure (the CCNet/C4 curation signal):
    a k-token span is BOILERPLATE when it appears in at least
    ``max(min_docs, ceil(df_frac · |corpus|))`` distinct documents —
    a relative threshold, so "common" keeps meaning common as the
    corpus grows. Returns per document the total span count, the count
    of span occurrences that are boilerplate, and their ratio — the
    input to a drop-or-trim curation rule (differs from
    ``duplicate_spans_docs``, the corpus-level audit, by turning the
    same span grain into a per-row curation feature; and from
    ``contamination_docs`` by measuring corpus-INTERNAL commonality,
    not benchmark overlap).

    Scale shape: spans explode map-side and reduce once on the span key
    (df computation — map-side partial agg); the boilerplate span set
    is the ONLY broadcast-joined side (bounded: spans above a relative
    df threshold are at most |corpus|·spans_per_doc/df_min keys, and
    empirically tiny); the per-doc re-aggregation reduces on doc_id.
    The corpus size is a scalar agg, broadcast as a literal via
    crossJoin of a 1-row frame — no collect of data rows."""
    toks = tokens(text_col)
    d = df.select(F.col(id_col), toks.alias("t")).filter(F.size("t") >= k)
    spans = d.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (k - 1)),
                lambda i: F.array_join(F.slice("t", i, k), " "),
            )
        ).alias("span"),
    )
    n_corpus = d.agg(F.count(F.lit(1)).alias("n_corpus"))
    span_df = spans.groupBy("span").agg(
        F.countDistinct(id_col).alias("span_docs")
    )
    boiler = (
        span_df.crossJoin(F.broadcast(n_corpus))
        .filter(
            F.col("span_docs")
            >= F.greatest(
                F.lit(min_docs), F.ceil(F.lit(df_frac) * F.col("n_corpus"))
            )
        )
        .select("span")
    )
    flagged = spans.join(
        F.broadcast(boiler.withColumn("is_boiler", F.lit(1))), "span", "left"
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler_spans"),
        F.round(
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("boiler_ratio"),
    )


def _window_hash_positions(
    df: DataFrame, text_col: str, id_col: str, span_len: int
) -> DataFrame:
    """One row per L-token window position: ``(id, pos, h)`` with ``pos``
    the 1-based first-token index and ``h`` the md5-prefix 60-bit hash
    of the space-joined window — the replayable positional twin of
    :func:`shingle_hashes_from` (which is distinct-set, xxhash64, and
    deliberately NOT SQL-reproducible). Documents shorter than
    ``span_len`` tokens produce no rows. Entirely map-side; the token
    array is bound in its own projection before the hashing lambda
    consumes it (the CSE-through-lambda discipline of
    shingle_hashes_from)."""
    d = df.select(
        F.col(id_col), tokens(text_col).alias("t")
    ).filter(F.size("t") >= span_len)
    return d.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (span_len - 1)),
                lambda i: F.struct(
                    i.cast("long").alias("pos"),
                    F.conv(
                        F.substring(
                            F.md5(F.array_join(F.slice("t", i, span_len), " ")),
                            1,
                            15,
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("h"),
                ),
            )
        ).alias("w"),
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))


def _merge_position_islands(
    hits: DataFrame, id_col: str, span_len: int
) -> DataFrame:
    """Gap-and-island merge of duplicated window positions into maximal
    spans: window at ``pos`` covers tokens ``[pos, pos+L-1]``; two hit
    windows belong to the same span iff the later start is ≤ the
    earlier start + L (overlap or touch). Returns one row per maximal
    span ``(id, span_start, span_end, span_tokens)``. The window spec
    is partitioned by document — bounded per-key state, never a global
    single-reducer sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) <= span_len, F.lit(0)
    ).otherwise(F.lit(1))
    isl = (
        hits.withColumn("brk", brk)
        .withColumn(
            "island",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return isl.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (span_len - 1)).alias("span_end"),
        (F.max("pos") + (span_len - 1) - F.min("pos") + 1).alias(
            "span_tokens"
        ),
    )


def maximal_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document MAXIMAL duplicated substring spans (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL
    2022 — the fixed-L windowed formulation of their suffix-array
    duplicate detector): every L-token window whose hash recurs
    ``min_count``+ times corpus-wide marks its positions duplicated;
    overlapping/touching duplicated positions merge into maximal spans.
    Returns one row per document: ``(id, n_tokens, n_spans,
    dup_tokens, dup_frac)`` — including zero-span and shorter-than-L
    documents (the audit must cover the whole corpus, not just the
    guilty rows). Differs from `duplicate_spans_docs` (the span-grain
    frequency mine) by merging to maximal spans and charging them back
    to documents — the per-doc memorization-risk feature a curation
    rule filters on.

    Scale shape: window hashing is map-side array math; ONE shuffle on
    the window hash for the occurrence count (map-side partial agg),
    one hash-keyed join back (AQE may broadcast the duplicated-hash
    side when small), one doc-keyed window for the island merge.
    Shuffles carry (id, pos, h) longs — never text. Window occurrence
    counting is count(*) over positions (intra-document repeats count,
    matching the published semantics where any second occurrence of a
    substring is a duplicate)."""
    d = df.select(
        F.col(id_col),
        F.coalesce(tokens(text_col), F.array().cast("array<string>")).alias(
            "t"
        ),
    )
    wins = _window_hash_positions(df, text_col, id_col, span_len)
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    hits = wins.join(dup, "h").select(id_col, "pos")
    spans = _merge_position_islands(hits, id_col, span_len)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    base = d.select(id_col, F.size("t").alias("n_tokens"))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


def dedup_spans_rewrite(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 8,
) -> DataFrame:
    """Exact-substring corpus REWRITE (Lee et al. 2022's actual dedup
    step, not just the audit): for every duplicated L-token window,
    the single globally-first occurrence — ordered by ``(id, pos)`` —
    is kept; every later occurrence marks its positions removable;
    removable positions merge into maximal spans (same island rule as
    :func:`maximal_dup_spans`) and the covered tokens are CUT from the
    document. Returns ``(id, n_tokens, n_removed, clean_text)`` for
    every input document, ``clean_text`` the kept tokens space-joined
    (token-normalized output — the published granularity for this
    corpus; byte-faithful splicing would key spans by char offsets,
    same plan shape).

    Rank ≥ 2 within a hash partition IS the duplicated test (a hash
    with one occurrence never ranks 2), so the plan needs no separate
    occurrence-count pass: one shuffle on the window hash for the
    global first-occurrence ranking, one doc-keyed island merge, one
    doc-keyed join of the collected span list (disjoint and few per
    doc) back onto the token arrays, then a map-side higher-order
    filter drops covered token indexes. Documents shorter than L or
    containing only first occurrences pass through byte-identical in
    token space."""
    from pyspark.sql import Window

    d = df.select(
        F.col(id_col),
        F.coalesce(tokens(text_col), F.array().cast("array<string>")).alias(
            "t"
        ),
    )
    wins = _window_hash_positions(df, text_col, id_col, span_len)
    rk = F.row_number().over(
        Window.partitionBy("h").orderBy(F.col(id_col), F.col("pos"))
    )
    removable = (
        wins.withColumn("rk", rk).filter(F.col("rk") >= 2).select(id_col, "pos")
    )
    spans = _merge_position_islands(removable, id_col, span_len)
    span_lists = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    joined = d.join(span_lists, id_col, "left").select(
        id_col,
        "t",
        F.coalesce(
            "spans",
            F.array().cast("array<struct<span_start:long,span_end:long>>"),
        ).alias("spans"),
    )
    # sequence(1, 0) DESCENDS — an empty token array must short-circuit
    # to an empty kept list, never reach the sequence expression.
    kept = F.when(
        F.size("t") == 0,
        F.array().cast("array<struct<i:long,tok:string>>"),
    ).otherwise(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("t")),
                lambda i: F.struct(
                    i.cast("long").alias("i"),
                    F.element_at("t", i).alias("tok"),
                ),
            ),
            lambda s: ~F.exists(
                "spans",
                lambda sp: (s["i"] >= sp["span_start"])
                & (s["i"] <= sp["span_end"]),
            ),
        )
    )
    return joined.select(
        id_col,
        F.size("t").alias("n_tokens"),
        kept.alias("_kept"),
    ).select(
        id_col,
        "n_tokens",
        (F.col("n_tokens") - F.size("_kept")).alias("n_removed"),
        F.array_join(F.transform("_kept", lambda s: s["tok"]), " ").alias(
            "clean_text"
        ),
    )


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_postings: int = 32,
) -> DataFrame:
    """Search-index materialization: token → (document frequency, total
    term frequency, sorted sample postings list) — the build step behind
    keyword retrieval and the stats feeder for :func:`bm25_topk`.

    Scale shape: the explode is immediately re-reduced at (token, doc)
    grain — the per-token row count is bounded by |docs| BEFORE the
    token-level shuffle, so a stop-token's postings arrive as one row
    per containing document, never one per occurrence. The final
    per-token aggregate carries counts plus a SLICED sample of the
    sorted postings (``sample_postings`` cap): full postings lists for
    web-scale stop tokens would concentrate gigabytes into single rows
    — consumers needing complete lists keep the (token, doc) grain
    table instead (it IS the index, partitionable by token prefix).
    """
    toks = tokens(F.col(text_col))
    td = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return td.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
        F.slice(
            F.array_sort(F.collect_list("doc_id")), 1, sample_postings
        ).alias("postings_sample"),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Byte-pair-encoding vocabulary training (Sennrich et al. 2016) —
    the learned merge table ``(merge_rank, left, right, merged,
    pair_count)`` for the first ``n_merges`` merges, trained on the
    corpus's word-frequency table.

    Scale shape — the classic BPE economics, distributed:

    - ONE full-data pass reduces the corpus to ``(word, count)``; at
      100 TB that vocabulary is still only millions of rows, and every
      training round runs against IT, never the corpus again.
    - Each round is one weighted pair-count aggregate over the vocab
      (posexplode of adjacent symbol pairs × word count) + a 1-row
      driver fetch of the argmax (deterministic tie-break: count desc,
      then pair lexicographic) — the inherently sequential part of BPE
      is the n_merges-long chain itself, not the data volume.
    - The merge applies as a literal string replace over the
      space-joined symbol string ``" h e l l o "``: bounded-width rows,
      no per-symbol UDF, and left-to-right non-overlapping replace-all
      IS the greedy BPE merge fold (both engines share these replace
      semantics, which is what makes the oracle exact).

    The merge table is what a tokenizer ships; apply-side encoding
    (:func:`bpe_token_counts`) replays against the trained state via
    :func:`bpe_train_state`, which returns the final per-word
    segmentation alongside the merges.
    """
    merges_df, _ = bpe_train_state(df, n_merges=n_merges, text_col=text_col)
    return merges_df


def bpe_train_state(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """:func:`bpe_train` returning ``(merge_table, vocab_state)`` —
    ``vocab_state`` is ``(word, n, s)`` with ``s`` the word's final
    space-joined symbol segmentation after all merges: the apply-side
    lookup table (broadcastable: |vocab| ≪ |corpus|)."""
    toks = tokens(F.col(text_col))
    vocab = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "s",
            F.concat(
                F.lit(" "),
                F.array_join(F.split(F.col("word"), "(?!^)"), " "),
                F.lit(" "),
            ),
        )
        .localCheckpoint(eager=True)  # rounds iterate on this frame
    )
    merges = []
    for rank in range(1, n_merges + 1):
        arr = F.split(F.trim(F.col("s")), " ")
        pairs = (
            vocab.select(
                "n",
                F.posexplode(F.slice(arr, 1, F.size(arr) - 1)).alias("i", "l"),
                arr.alias("_a"),
            )
            .withColumn("r", F.col("_a")[F.col("i") + 1])
            .groupBy("l", "r")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "l", "r").first()
        if top is None:
            break
        merges.append((rank, top.l, top.r, top.l + top.r, int(top.cnt)))
        vocab = vocab.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f" {top.l} {top.r} "),
                F.lit(f" {top.l}{top.r} "),
            ),
        ).localCheckpoint(eager=True)
    merges_df = df.sparkSession.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, pair_count bigint",
    )
    return merges_df, vocab


def bpe_token_counts(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Apply-side BPE: per-document token counts under the trained
    merge table — the token-budget accounting a training pipeline runs
    after choosing a vocabulary (how many sequence slots does each
    document cost?).

    Scale shape: encoding never re-segments text row by row — each
    word's final segmentation already exists in the trained vocab
    state, so encoding is explode(words) ⋈ broadcast(vocab) → sum of
    per-word symbol counts. Returns (doc_id, n_words, n_bpe_tokens,
    n_chars) with chars counted over the tokenized words (alphanumeric
    only, matching the training normalization). Pass a pre-trained
    ``vocab`` (from :func:`bpe_train_state`) to skip re-training."""
    if vocab is None:
        _, vocab = bpe_train_state(df, n_merges=n_merges, text_col=text_col)
    seg = vocab.select(
        "word",
        F.size(F.split(F.trim(F.col("s")), " ")).alias("_word_toks"),
        F.length("word").alias("_word_chars"),
    )
    words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_word_toks").alias("n_bpe_tokens"),
            F.sum("_word_chars").alias("n_chars"),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BIGRAM cross-entropy (mean −ln p(wᵢ|wᵢ₋₁), nats)
    under the corpus's own add-one-smoothed bigram model — the
    context-aware upgrade of :func:`unigram_surprisal`: scrambled text
    with plausible unigrams but implausible transitions scores high.

        p(w₂|w₁) = (c(w₁,w₂) + 1) / (c(w₁·) + V)

    Bigrams come from zipping two shifted SLICES of the token array —
    a pure per-row expression, no window shuffle; the model is one
    bigram-keyed count aggregate + a context-marginal aggregate + the
    1-row vocabulary size, joined back onto the exploded bigrams.
    Same fixed-point discipline as the unigram operator: per-bigram
    −ln p quantizes to 1e-9 BIGINT before the integer-exact per-doc
    sum. Docs with fewer than two tokens drop out (no bigram)."""
    toks_arr = tokens(F.col(text_col))
    n = F.size(toks_arr)
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= 2,
                F.arrays_zip(
                    F.slice(toks_arr, 1, n - 1).alias("w1"),
                    F.slice(toks_arr, 2, n - 1).alias("w2"),
                ),
            ).otherwise(F.array()),
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bg_counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx_counts = bg_counts.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).agg(
        F.countDistinct("tok").cast("double").alias("v")
    )
    scored = (
        pairs.join(bg_counts, ["w1", "w2"])
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    (F.col("c_bg") + 1).cast("double")
                    / (F.col("c_ctx").cast("double") + F.col("v"))
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("logp_q"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            -F.sum("logp_q").cast("double") / F.lit(1e9) / F.count(F.lit(1)), 6
        ).alias("surprisal_nats"),
    )


def kneser_ney_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document bigram cross-entropy under an interpolated
    Kneser-Ney model (Kneser & Ney 1995; Chen & Goodman 1999) trained
    on the corpus itself — the standard n-gram smoothing that add-one
    (:func:`bigram_surprisal`) is the strawman for:

        p(w₂|w₁) = max(c(w₁,w₂) − D, 0)/c(w₁·)
                   + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)

    The continuation distribution N₁₊(·w₂)/N₁₊(··) ranks words by how
    many DISTINCT contexts they follow, not raw frequency — the classic
    "San Francisco" effect: "francisco" is frequent but follows only
    one context, so its continuation mass is tiny. KN therefore
    separates formulaic/boilerplate-heavy documents (high raw bigram
    counts, low context diversity) from genuinely fluent text in a way
    add-one smoothing can't.

    Everything is count aggregates over the exploded bigram relation —
    four shuffles, all on bigram/word keys, each with map-side partial
    aggregation: c(w₁,w₂); c(w₁·) and N₁₊(w₁·) in ONE pass over the
    bigram-type relation (they share the w₁ key); N₁₊(·w₂) on the w₂
    key; N₁₊(··) as a 1-row broadcast. Since the model scores its own
    training corpus, every scored bigram has c ≥ 1 > D, so the
    discounted term is strictly positive and log never sees 0. The
    per-bigram −ln p quantizes to 1e-9 fixed point before the
    integer-exact per-doc sum (same discipline as the other surprisal
    operators). Docs with < 2 tokens drop out.
    """
    toks_arr = tokens(F.col(text_col))
    n = F.size(toks_arr)
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= 2,
                F.arrays_zip(
                    F.slice(toks_arr, 1, n - 1).alias("w1"),
                    F.slice(toks_arr, 2, n - 1).alias("w2"),
                ),
            ).otherwise(F.array()),
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bg_counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    # c(w1·) and N1+(w1·) in one aggregate over the bigram-type relation.
    ctx = bg_counts.groupBy("w1").agg(
        F.sum("c_bg").alias("c_ctx"),
        F.count(F.lit(1)).alias("n1f"),
    )
    # N1+(·w2): distinct predecessors of w2 = rows of the type relation.
    cont = bg_counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    total_types = bg_counts.agg(
        F.count(F.lit(1)).cast("double").alias("n_types")
    )
    d = F.lit(float(discount))
    scored = (
        pairs.join(bg_counts, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(total_types))
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    (F.col("c_bg").cast("double") - d)
                    / F.col("c_ctx").cast("double")
                    + d
                    * F.col("n1f").cast("double")
                    / F.col("c_ctx").cast("double")
                    * (F.col("n1b").cast("double") / F.col("n_types"))
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("logp_q"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            -F.sum("logp_q").cast("double") / F.lit(1e9) / F.count(F.lit(1)), 6
        ).alias("kn_surprisal_nats"),
    )


def perplexity_filter(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 50,
    salt: str = "ppl-v1",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under a language model trained on a HELD-OUT slice
    of the corpus, then cut the corpus into equal-frequency quality
    buckets (CCNet's head/middle/tail) by that score.

    What :func:`unigram_surprisal` (train = score = whole corpus)
    cannot give you: a train/apply separation — the model here is an
    add-one-smoothed unigram LM over the deterministic md5 ``train_pct``%
    doc split, so scoring is well-defined for tokens the model never
    saw (the +1/UNK mass), exactly like scoring fresh crawl data with
    a frozen KenLM. Smoothed probability: ``p(tok) = (cnt+1)/(N+V+1)``
    with N = train token count, V = train vocabulary size.

    Determinism: the md5 split is the repo's standard sample bucket;
    per-token −ln p is quantized to 1e-9 fixed-point before the doc
    sum (order-insensitive); bucket = exact equal-frequency ntile over
    the (surprisal, id) total order, computed WITHOUT a single-reducer
    sort via :func:`~..plans.analytics.global_row_number` + the
    ``1+(rn−1)·k/total`` identity (matches SQL ``ntile`` exactly).

    Scale: one vocab aggregate over the train slice, one join of
    exploded tokens to the vocab (AQE broadcasts while it fits), one
    doc aggregate, one range shuffle for numbering. Nothing touches
    document bodies after the explode.
    """
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
        _sample_bucket,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        global_row_number,
    )

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    flags = df.select(
        F.col(id_col),
        (_sample_bucket(F.col(id_col), salt) < train_pct).alias("in_train"),
    )
    tcounts = (
        toks.join(flags.filter("in_train").select(id_col), id_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = tcounts.agg(
        F.sum("cnt").alias("n_train"), F.count(F.lit(1)).alias("v_train")
    )
    scored = (
        toks.join(tcounts, "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                    / (F.col("n_train") + F.col("v_train") + 1).cast("double")
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("logp_q"),
        )
    )
    perdoc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            -F.sum("logp_q").cast("double") / F.lit(1e9) / F.count(F.lit(1)), 6
        ).alias("surprisal_nats"),
    )
    numbered = global_row_number(
        perdoc, ["surprisal_nats", id_col], out_col="__rn"
    )
    total = perdoc.agg(F.count(F.lit(1)).alias("__total"))
    labels = F.array(*[F.lit(s) for s in ("head", "middle", "tail")])
    bucket = (
        F.lit(1)
        + F.floor(
            (F.col("__rn") - 1) * n_buckets / F.col("__total")
        ).cast("int")
    )
    out = (
        numbered.crossJoin(F.broadcast(total))
        .join(flags, id_col)
        .withColumn("ppl_bucket", bucket)
    )
    label = (
        F.element_at(labels, F.col("ppl_bucket"))
        if n_buckets == 3
        else F.concat(F.lit("b"), F.col("ppl_bucket").cast("string"))
    )
    return out.select(
        id_col,
        "n_tokens",
        "in_train",
        "surprisal_nats",
        "ppl_bucket",
        label.alias("ppl_label"),
    )

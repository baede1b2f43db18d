"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All pure JVM expressions (codegen'd, no Python). Each operator has a
DuckDB-expressible twin in ``driver_queries`` so the driver's
correctness gate covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column, word_ngrams_column

# marker-lexicon language ID: tiny per-language lexicons, fully
# SQL-expressible (kept as the lightweight/oracle-friendly variant; the
# REAL trainable classifier is the char-n-gram Naive Bayes in
# operators/langid.py — gate `lang_id_nb`)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "las", "es", "y", "un", "una"],
    "zh": ["de", "shi", "le", "bu", "zai", "you", "wo", "ta"],
}

STOPWORDS = LANG_MARKERS["en"]


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pred_lang): argmax over marker-lexicon hit counts; ties
    break alphabetically (deterministic). Docs with zero hits → 'und'."""
    toks = df.select(F.col(id_col), tokenize_column(text_col).alias("t"))
    scores = toks.select(
        id_col,
        *[
            F.size(F.filter(F.col("t"), lambda x: x.isin(LANG_MARKERS[lang]))).alias(
                f"n_{lang}"
            )
            for lang in sorted(LANG_MARKERS)
        ],
    )
    # argmax via greatest + chained when (alphabetical tie-break)
    best = F.greatest(*[F.col(f"n_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((best > 0) & (F.col(f"n_{lang}") == best), F.lit(lang)).otherwise(pred)
    return scores.select(id_col, pred.alias("pred_lang"))


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", round_to: int = 4
) -> DataFrame:
    """Heuristic quality features per doc:

    * n_chars, n_tokens, mean token length
    * alpha_ratio  — fraction of alphanumeric chars
    * punct_ratio  — fraction of delimiter-class punctuation
    * stopword_ratio — fraction of tokens in the stopword lexicon
    * quality — composite in [0, 1] (length-saturating × alpha × non-junk)
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize_column(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)) / n_tokens,
    ).otherwise(F.lit(0.0))
    length_sat = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    quality = length_sat * alpha_ratio * (F.lit(1.0) - punct_ratio)
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_len, round_to).alias("mean_token_len"),
        F.round(alpha_ratio, round_to).alias("alpha_ratio"),
        F.round(punct_ratio, round_to).alias("punct_ratio"),
        F.round(stop_ratio, round_to).alias("stopword_ratio"),
        F.round(quality, round_to).alias("quality"),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document into consecutive
    token windows of ≤ ``max_tokens`` → (doc_id, chunk_idx, n_tokens,
    chunk_text). The pretraining preprocessing step between cleaning
    and packing; row-local (tokenize + slice expressions, zero shuffle,
    chunk_idx deterministic), so it fuses into the scan at any scale.
    Empty/whitespace-only/NULL docs yield one empty chunk (chunk count
    = ceil(len/N) with a floor of 1 — no document silently
    disappears)."""
    toks = tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
    n_chunks = F.greatest(
        F.lit(1), F.ceil(F.size(toks) / F.lit(max_tokens)).cast("int")
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("_n"),
        toks.alias("_t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        id_col,
        "chunk_idx",
        F.least(
            F.lit(max_tokens), F.col("_n") - F.col("chunk_idx") * F.lit(max_tokens)
        ).cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_t"), F.col("chunk_idx") * F.lit(max_tokens) + 1, max_tokens),
            " ",
        ).alias("chunk_text"),
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 2048,
    buckets: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget packing: assemble chunks into training
    sequences of total n_tokens ≤ ``budget``.

    Packing is inherently sequential, so determinism at cluster scale
    comes from structure, not luck: chunks are hash-bucketed by doc id
    (uniform, content-stable), and within a bucket packed greedily in
    (doc_id, chunk_idx) order inside ONE applyInPandas task. Result is
    a pure function of the data — independent of partitioning, core
    count, and resume. Sequence ids are (bucket, seq_idx); an oversize
    chunk (> budget) gets its own sequence rather than being dropped.

    Cost shape: one shuffle on the bucket key; bucket count is the
    parallelism dial (each task holds one bucket's chunk metadata —
    tokens counts, not text, if the caller projects columns first)."""
    import pandas as pd

    out_schema = (
        f"bucket int, seq_idx long, {id_col} long, chunk_idx int, n_tokens long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, "chunk_idx"], kind="stable")
        seq_ids, acc, seq = [], 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and acc + n > budget:
                seq += 1
                acc = 0
            seq_ids.append(seq)
            acc += n
            first = False
        pdf = pdf.copy()
        pdf["seq_idx"] = pd.Series(seq_ids, index=pdf.index, dtype="int64")
        return pdf[["bucket", "seq_idx", id_col, "chunk_idx", "n_tokens"]]

    # engine-portable bucket hash (md5 of the key, same recipe as the
    # sampling family) so the DuckDB oracle reproduces the exact
    # bucket → sequence assignment; content-stable and uniform like the
    # xxhash64 it replaces
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|pack"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    bucketed = chunks.withColumn(
        "bucket", F.pmod(h32, F.lit(buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandas(pack, out_schema)


def packed_sequences(
    df: DataFrame,
    max_tokens: int = 64,
    budget: int = 2048,
    buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The terminal materialization of the preprocessing pipeline:
    ``(bucket, seq_idx, n_tokens, text)`` — cleaned documents chunked
    into ≤ ``max_tokens`` windows, greedily packed into ≤ ``budget``
    training sequences, and the sequence TEXT assembled (chunks joined
    in the pack's deterministic (doc_id, chunk_idx) order).

    Pure composition: :func:`chunk_documents` (scan-fused) →
    :func:`pack_chunks` over the token-count METADATA only (the text
    never rides through the packing shuffle) → one metadata join back
    to the chunk text → in-row ``sort_array`` assembly (no sort
    exchange — the ``linededup`` reassembly shape).  Deterministic at
    any parallelism because every constituent is."""
    chunks = chunk_documents(df, max_tokens, text_col, id_col)
    asg = pack_chunks(
        chunks.select(id_col, "chunk_idx", "n_tokens"),
        budget=budget, buckets=buckets, id_col=id_col,
    )
    joined = asg.join(
        chunks.select(id_col, "chunk_idx", "chunk_text"),
        [id_col, "chunk_idx"],
    )
    return joined.groupBy("bucket", "seq_idx").agg(
        F.sum("n_tokens").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(id_col, "chunk_idx", "chunk_text")
                    )
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("text"),
    )


def _run_length_stats(sorted_arr):
    """Run-length scan over a SORTED array — one ``aggregate`` pass,
    O(L) per row, pure codegen. Returns a struct column with:

    * ``dup_items`` — total elements belonging to runs of length > 1
    * ``dup_chars`` — total characters of those elements
    * ``max_run``   — length of the longest run
    * ``best``      — the element of the longest run (first = smallest
      in sort order on ties — deterministic)

    This is how per-doc duplicate-line/top-n-gram fractions stay inside
    the scan projection instead of exploding every line/gram into a
    per-doc shuffle: sort_array + one fold replaces unnest + groupBy.
    """
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("dup_items"),
        zero.alias("dup_chars"),
        zero.alias("max_run"),
        F.lit(None).cast("string").alias("best"),
    )

    def flush(acc):
        grew = acc["run"] > acc["max_run"]
        return (
            acc["dup_items"]
            + F.when(acc["run"] > 1, acc["run"]).otherwise(zero),
            acc["dup_chars"]
            + F.when(acc["run"] > 1, acc["run"] * F.length(acc["prev"]))
            .otherwise(zero),
            F.greatest(acc["max_run"], acc["run"]),
            F.when(grew, acc["prev"]).otherwise(acc["best"]),
        )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        di, dc, mr, best = flush(acc)
        return F.when(
            same,
            F.struct(
                x.alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["dup_items"].alias("dup_items"),
                acc["dup_chars"].alias("dup_chars"),
                acc["max_run"].alias("max_run"),
                acc["best"].alias("best"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                di.alias("dup_items"),
                dc.alias("dup_chars"),
                mr.alias("max_run"),
                best.alias("best"),
            )
        )

    def finish(acc):
        di, dc, mr, best = flush(acc)
        return F.struct(
            di.alias("dup_items"),
            dc.alias("dup_chars"),
            mr.alias("max_run"),
            best.alias("best"),
        )

    return F.aggregate(sorted_arr, init, merge, finish)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", round_to: int = 4
) -> DataFrame:
    """Gopher/C4-style repetition signals per doc:

    * ``n_lines``            — non-empty (post-trim) line count
    * ``dup_line_frac``      — fraction of lines that belong to a
      duplicated line (Gopher's duplicate-line filter input)
    * ``dup_line_char_frac`` — fraction of line characters inside
      duplicated lines
    * ``top_2gram``          — most frequent word 2-gram (smallest on
      ties; NULL if the doc has < 2 tokens)
    * ``top_2gram_frac``     — its share of all 2-gram occurrences
      (Gopher's top-n-gram filter input)

    Entirely row-local: lines/grams never leave the row — ``sort_array``
    + one ``aggregate`` fold per metric (O(L log L) in the row, zero
    shuffle), so the operator fuses into the corpus scan at any scale.
    Boilerplate-heavy docs (navigation bars, templated spam) light up
    both fractions; the thresholds live in
    :func:`filter_by_repetition`.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    lstats = _run_length_stats(F.sort_array(lines))
    grams = word_ngrams_column(t, 2)
    n_grams = F.size(grams)
    gstats = _run_length_stats(F.sort_array(grams))
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        F.round(
            F.when(n_lines > 0, lstats["dup_items"] / n_lines).otherwise(F.lit(0.0)),
            round_to,
        ).alias("dup_line_frac"),
        F.round(
            F.when(line_chars > 0, lstats["dup_chars"] / line_chars)
            .otherwise(F.lit(0.0)),
            round_to,
        ).alias("dup_line_char_frac"),
        gstats["best"].alias("top_2gram"),
        F.round(
            F.when(n_grams > 0, gstats["max_run"] / n_grams).otherwise(F.lit(0.0)),
            round_to,
        ).alias("top_2gram_frac"),
    )


def filter_by_repetition(
    df: DataFrame,
    max_dup_line_frac: float = 0.3,
    max_top_2gram_frac: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """Cleaned-corpus materialization by repetition: drop docs whose
    duplicate-line or top-2-gram fraction exceeds the (Gopher-flavored)
    thresholds. Same zero-shuffle shape as :func:`filter_by_quality` —
    the stats are row-local expressions, so the filter fuses into the
    scan (no join, no shuffle)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    n_lines = F.size(lines)
    lstats = _run_length_stats(F.sort_array(lines))
    dup_line_frac = F.when(
        n_lines > 0, lstats["dup_items"] / n_lines
    ).otherwise(F.lit(0.0))
    grams = word_ngrams_column(t, 2)
    n_grams = F.size(grams)
    gstats = _run_length_stats(F.sort_array(grams))
    top_2gram_frac = F.when(
        n_grams > 0, gstats["max_run"] / n_grams
    ).otherwise(F.lit(0.0))
    return df.filter(
        (dup_line_frac <= max_dup_line_frac)
        & (top_2gram_frac <= max_top_2gram_frac)
    )


def quality_expr(text_col: str = "text", round_to: int = 4):
    """The composite quality score as a row-local Column (shared by
    ``quality_scores`` and ``filter_by_quality``)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize_column(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    n_tokens = F.size(toks)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    length_sat = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    return F.round(length_sat * alpha_ratio * (F.lit(1.0) - punct_ratio), round_to)


def filter_by_quality(
    df: DataFrame,
    min_quality: float = 0.4,
    text_col: str = "text",
) -> DataFrame:
    """Cleaned-corpus materialization by quality: keep rows whose
    composite ``quality`` clears the threshold — the filtering step a
    training pipeline runs after scoring (mirrors
    ``cluster.materialize_deduped`` for the dedup family). One pass,
    ZERO shuffle: the score is a row-local expression, so the filter
    fuses into the scan (whole-stage codegen, plan-asserted)."""
    return df.filter(quality_expr(text_col) >= min_quality)


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Three token-count views per doc:

    * ws_tokens  — whitespace-split count
    * word_tokens — delimiter-class tokenizer count (the index tokenizer)
    * bpe_ish_pieces — BPE-flavored upper bound: alnum runs split every 4
      chars + each punctuation char its own piece (a deterministic,
      vocabulary-free stand-in for a real BPE; counts, not pieces)
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.size(F.filter(F.split(t, "\\s+"), lambda x: F.length(x) > 0))
    words = F.size(tokenize_column(text_col))
    alnum_chars = F.length(F.regexp_replace(t, "[^a-zA-Z0-9]", ""))
    punct_chars = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", ""))
    # ceil(run/4) summed over runs ≈ ceil(alnum/4) + nruns correction;
    # keep the simple, exactly-specified form: ceil(alnum/4) + punct
    bpe_ish = (F.ceil(alnum_chars / F.lit(4.0)) + punct_chars).cast("long")
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        words.cast("long").alias("word_tokens"),
        bpe_ish.alias("bpe_ish_pieces"),
    )


def fingerprints(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fingerprint): min-shingle fingerprint — the minimum md5
    over token n-gram shingles (winnowing with window = whole doc).
    Identical-fingerprint docs share at least one n-gram run; exact dups
    always collide. Engine-portable (md5)."""
    toks = df.select(F.col(id_col), tokenize_column(text_col).alias("t"))
    sh = toks.select(
        id_col,
        F.when(
            F.size("t") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i + 1, n))),
            ),
        )
        .otherwise(F.array(F.md5(F.concat_ws(" ", F.col("t")))))
        .alias("hashes"),
    )
    return sh.select(id_col, F.array_min("hashes").alias("fingerprint"))


def tfidf_topm(
    postings: DataFrame,
    m: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Sparse tf·idf document vectors, truncated to each doc's ``m``
    strongest terms → (doc_id, term, tfidf, rank).

    The featurization step training pipelines put between a corpus and
    a classical model (quality classifiers, nearest-neighbor pre-filters,
    weak labelers). Inputs are the postings relation itself — df and N
    derive from it, so the vectors are consistent with the index by
    construction.

    Scale shape: df is one vocabulary-sized aggregation (broadcast back
    onto the postings scan), N is a single-row aggregate, and the top-m
    cut is a ``row_number`` window partitioned BY doc_id — the window
    shuffle keys on doc_id, the same co-location the doc-range shard
    layout already provides, so over a persisted index this executes
    shuffle-free per shard. Ties break (tfidf desc, term asc):
    deterministic at any parallelism.
    """
    dfreq = postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs_df = postings.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs_df))
        .withColumn("tfidf", F.round(F.col("tf").cast("double") * idf, round_to))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= m)
        .select("doc_id", "term", "tfidf", "rank")
    )


def vocabulary_ids(
    corpus: DataFrame,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Frequency-ranked token vocabulary: ``(term, token_id, count)``
    with dense 0-based ids assigned by (count desc, term asc) — the
    deterministic id assignment every tokenizer artifact needs (two
    builds of the same corpus must agree id-for-id at any parallelism).

    The rank is a single global window over the VOCABULARY relation
    (|distinct terms| rows — millions at web scale, not corpus-sized),
    the one place a global order is inherent to the artifact; the
    corpus-sized token stream only feeds the count aggregation
    (map-side combined)."""
    counts = (
        corpus.select(
            F.explode(
                tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("count"), F.asc("term"))
    return counts.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long")
    ).select("term", "token_id", "count")


def encode_docs(
    corpus: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document to its token-id sequence:
    ``(doc_id, n_tokens, ids)`` with ``ids`` in original token order
    (OOV tokens — absent from ``vocab`` — are DROPPED, the standard
    min-count behavior; pair with ``vocabulary_ids(min_count=1)`` for
    lossless self-encoding).  One shuffle of the token stream (the
    regroup by doc); the vocabulary joins broadcast when it fits and
    falls back to a shuffle join beyond ``autoBroadcastJoinThreshold``.
    Order is restored in-row (``sort_array`` over (pos, id) structs) —
    no sort exchange."""
    toks = corpus.select(
        F.col(id_col),
        F.posexplode(
            tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "term"),
    )
    return (
        toks.join(vocab.select("term", "token_id"), "term")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "token_id"))),
                lambda s: s["token_id"],
            ).alias("ids"),
        )
    )

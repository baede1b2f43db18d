"""URL/domain and blocked-word filtering — the C4 blocklist stage
(Raffel et al. 2020 filter pages from blocked domains and pages
containing "bad words"; CCNet and every production crawl pipeline run
the same two cuts).

No reference analogue (the reference indexes whatever it is pointed
at).  Three operators, all shuffle-light:

* :func:`extract_urls` — ``(id, url, domain)`` per URL mention:
  ``regexp_extract_all`` pulls ``http(s)://…`` spans, trailing
  sentence punctuation is stripped, and the host comes from Spark's
  own ``parse_url(…, 'HOST')`` lowercased — all JVM expressions.
* :func:`filter_blocked_domains` — drop every document that mentions a
  blocked domain, INCLUDING subdomains.  The naive subdomain test is
  ``domain ENDSWITH '.' + blocked`` against the blocklist — an
  inequality join that Spark can only run as a BroadcastNestedLoopJoin
  (per-row × per-blocklist-entry scan — a scale killer).  Instead each
  document domain expands to its SUFFIX CHAIN (``a.b.co`` →
  ``a.b.co``, ``b.co``, ``co`` — ≤ label-count rows, label count is
  tiny and bounded) and the blocklist joins by EQUALITY on the suffix:
  a broadcast hash semi-join, plan-asserted, same shape at any
  blocklist size (AQE shuffles it if the blocklist outgrows
  broadcast).
* :func:`filter_blocked_words` — drop documents whose token set
  intersects a word blocklist.  For list sizes like C4's (~400 words)
  the test is a codegen ``arrays_overlap`` against a literal array —
  zero joins, fused into the scan; above ``max_literal_words`` it
  falls back to a token-grain broadcast semi-join (same answer, same
  cap discipline as the decontam tiers).

Document grain is decided by ANY match (one blocked URL or word kills
the doc — the C4 rule).  All operators are deterministic at any
parallelism; nothing here shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column

#: URL span matcher; trailing ``.,;:!?)'"]`` are sentence punctuation,
#: not URL, and are stripped after the match.
_URL_RE = r"https?://[^\s<>\"']+"
_TRAIL_RE = r"[.,;:!?)'\"\]]+$"

#: Blocked-word lists at or under this size inline as a literal array
#: (codegen ``arrays_overlap``); larger lists go through a broadcast
#: semi-join at token grain.
DEFAULT_MAX_LITERAL_WORDS = 2_000


def _urls(col: Column) -> Column:
    return F.transform(
        F.regexp_extract_all(col, F.lit(_URL_RE), 0),
        lambda u: F.regexp_replace(u, _TRAIL_RE, ""),
    )


def extract_urls(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per URL mention: ``(id, url, domain)``; ``domain`` is
    the lowercased host (NULL when the span fails to parse as a URL).
    Pure JVM expressions, no shuffle."""
    return (
        corpus.select(
            id_col,
            F.explode(
                _urls(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("url"),
        )
        .withColumn("domain", F.lower(F.parse_url(F.col("url"), F.lit("HOST"))))
    )


def _suffix_chain(domain: Column) -> Column:
    """``a.b.co`` → ``[a.b.co, b.co, co]`` — every registrable suffix,
    so subdomain blocking becomes an equi-join."""
    labels = F.split(domain, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )


def blocked_doc_ids(
    corpus: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id)`` of documents mentioning a blocked domain or any of its
    subdomains.  ``blocklist``'s first column holds the domains
    (lowercased or not).  Suffix-chain equi-join — never a nested
    loop."""
    # not broadcast-forced: a domain blocklist is usually tiny (the
    # optimizer broadcasts it from its stats) but is caller-provided and
    # unbounded — a forced hint would pin an OOM at scale (the --max-ppl
    # ADVICE precedent); oversized lists degrade to a shuffled semi-join
    bl = blocklist.select(
        F.lower(F.col(blocklist.columns[0])).alias("_blocked")
    ).distinct()
    suffixes = (
        extract_urls(corpus, id_col, text_col)
        .filter(F.col("domain").isNotNull())
        .select(
            id_col, F.explode(_suffix_chain(F.col("domain"))).alias("_blocked")
        )
    )
    return suffixes.join(bl, "_blocked", "left_semi").select(id_col).distinct()


def filter_blocked_domains(
    corpus: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus every document that mentions a blocked domain
    (subdomains included) — the C4 domain cut."""
    bad = blocked_doc_ids(corpus, blocklist, id_col, text_col)
    return corpus.join(bad, id_col, "left_anti")


def filter_blocked_words(
    corpus: DataFrame,
    words: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_literal_words: int = DEFAULT_MAX_LITERAL_WORDS,
) -> DataFrame:
    """The corpus minus every document whose TOKEN set (the engine's
    tokenizer — so matching is whole-word, lowercased) intersects
    ``words`` — the C4 bad-words cut.  Small lists inline as a literal
    ``arrays_overlap`` (codegen, zero joins, scan-fused); large lists
    fall back to a token-grain broadcast semi-join → id anti-join with
    identical semantics (the decontam-tier cap discipline)."""
    vocab = sorted({w.lower() for w in words if w})
    if not vocab:
        raise ValueError("words must contain at least one non-empty word")
    toks = tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
    if len(vocab) <= max_literal_words:
        hit = F.arrays_overlap(
            toks, F.array(*[F.lit(w) for w in vocab])
        )
        return corpus.filter(~hit)
    spark = corpus.sparkSession
    wl = F.broadcast(
        spark.createDataFrame([(w,) for w in vocab], "_tok string")
    )
    bad = (
        corpus.select(id_col, F.explode(toks).alias("_tok"))
        .join(wl, "_tok", "left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(bad, id_col, "left_anti")

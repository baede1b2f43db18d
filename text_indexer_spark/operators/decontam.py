"""Benchmark decontamination — drop training documents that overlap an
evaluation set.

The standard LLM-pipeline hygiene step (GPT-3 appendix C / PaLM style):
a training doc is *contaminated* if it shares any contiguous word
n-gram (n≈8-13 for prose; configurable) with any document of the
benchmark/eval set. No reference analogue — the reference indexes a
static corpus (`DocumentsIndexer.kt`) — but this is a first-class
operator of any 100 TB training-data pipeline built on this engine.

Scale shape (the part that matters at 100 TB):

* The eval set is SMALL (benchmarks are thousands of docs, not
  billions). Its distinct n-gram set is built once and **broadcast** —
  the corpus side never shuffles its grams anywhere.
* Corpus grams are produced inside the scan projection
  (`word_ngrams_column` — pure codegen, L−n+1 grams per doc, no
  Python) and hit the broadcast hash table map-side. The only shuffle
  in `contamination_hits` is the final per-doc count aggregation, whose
  input is already reduced to the (rare) hit rows.
* `decontaminate` keeps the corpus scan intact and removes flagged
  docs with a left-anti join against the (tiny) contaminated-id set —
  also broadcast, so the cleaned corpus is a single pass over the data.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import word_ngrams_column


def eval_ngrams(
    evalset: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the evaluation set: ``(gram)``.

    Small by construction (|eval docs| × avg_len); intended to be
    broadcast by the callers below.
    """
    return (
        evalset.select(
            F.explode(word_ngrams_column(F.coalesce(F.col(text_col), F.lit("")), n))
            .alias("gram")
        )
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_grams: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per contaminated doc: ``(doc_id, n_hits)`` where ``n_hits`` is
    the number of DISTINCT eval n-grams the doc contains. Docs with no
    overlap are absent (the common case — keep the output sparse)."""
    grams = corpus.select(
        F.col(id_col),
        F.explode(word_ngrams_column(F.coalesce(F.col(text_col), F.lit("")), n))
        .alias("gram"),
    ).dropDuplicates([id_col, "gram"])
    hits = grams.join(F.broadcast(eval_grams), "gram")
    return hits.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_hits")
    )


def decontaminate(
    corpus: DataFrame,
    eval_grams: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The cleaned corpus: every row of ``corpus`` whose text shares no
    word n-gram with the eval set. Two corpus scans (flag, then filter)
    but ZERO corpus shuffles: the contaminated-id set is tiny and rides
    along as a broadcast anti-join, so the cleaned output streams
    straight from the second scan."""
    bad = contamination_hits(corpus, eval_grams, n, id_col, text_col).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


# --------------------------------------------------------------- bloom tier
#
# ``decontaminate`` broadcasts the EXACT eval-gram set.  That is the
# right plan while the set fits comfortably in executor memory, but a
# 100k-doc eval suite is ~10^7 distinct 8-grams ≈ several GB of strings
# — an uncomfortable broadcast at 1000 executors.  The classic fix is a
# Bloom filter: at ``bits_per_key=16`` the same set is a few dozen MB of
# packed longs with ~0.05 % false positives, and membership is pure
# bit arithmetic inside whole-stage codegen (`xxhash64` + `getbit` —
# no Python, no join).  Because a Bloom filter has NO false negatives,
# filtering the corpus down to bloom-positive docs and then running the
# exact verification join over that sliver yields output IDENTICAL to
# the exact operator — the same candidates-then-verify shape as the
# trigram grep tier, applied to decontamination.

_BLOOM_SALT = "bloom-h2"
_MASK31 = (1 << 31) - 1  # keep h1 + i*h2 far from 64-bit overflow (ANSI mode)


def _bloom_positions(gram: Column, k: int, m_bits: int) -> Column:
    """``gram -> array<long>`` of its ``k`` bit positions in ``[0, m)``
    via double hashing (Kirsch-Mitzenmacher: p_i = h1 + i*h2 mod m) —
    two xxhash64 evaluations per gram regardless of ``k``."""
    h1 = F.xxhash64(gram).bitwiseAND(F.lit(_MASK31))
    h2 = (
        F.xxhash64(gram, F.lit(_BLOOM_SALT))
        .bitwiseAND(F.lit(_MASK31))
        .bitwiseOR(F.lit(1))  # odd -> probes stay distinct mod 2^j
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits).cast("long")),
    )


def bloom_build(
    eval_grams: DataFrame,
    bits_per_key: int = 16,
    k: int = 7,
    gram_col: str = "gram",
) -> dict:
    """Build the packed Bloom bitset for the eval-gram set,
    DISTRIBUTED: each gram explodes to its ``k`` (word, bit) pairs and a
    two-phase ``bit_or`` aggregation packs them; the driver collects
    only ``m/64`` longs (the filter itself), never the grams.

    Returns ``{"words": list[int], "m_bits": int, "k": int}``.
    """
    n = eval_grams.count()
    m_words = max(1, math.ceil(max(n, 1) * bits_per_key / 64))
    m_bits = m_words * 64
    packed = (
        eval_grams.select(
            F.explode(
                _bloom_positions(F.col(gram_col), k, m_bits)
            ).alias("p")
        )
        .select(
            F.shiftright("p", 6).cast("int").alias("w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pmod(p, 64) as int))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("v"))
        .collect()
    )
    words = [0] * m_words
    for r in packed:
        words[r["w"]] = r["v"]
    return {"words": words, "m_bits": m_bits, "k": k}


def bloom_contains(bloom: dict, gram: Column) -> Column:
    """Codegen membership probe: all ``k`` bits set in the packed words
    (the words array rides in the plan as one literal)."""
    words = F.lit(bloom["words"])
    return F.forall(
        _bloom_positions(gram, bloom["k"], bloom["m_bits"]),
        lambda p: F.getbit(
            F.element_at(words, F.shiftright(p, 6).cast("int") + 1),
            F.pmod(p, F.lit(64).cast("long")),
        )
        == 1,
    )


def bloom_candidates(
    corpus: DataFrame,
    bloom: dict,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Corpus rows that MIGHT be contaminated: at least one of the doc's
    word n-grams bloom-hits.  One codegen scan, zero joins, zero
    shuffles; guaranteed a superset of the truly contaminated docs."""
    grams = word_ngrams_column(F.coalesce(F.col(text_col), F.lit("")), n)
    return corpus.filter(F.exists(grams, lambda g: bloom_contains(bloom, g)))


def decontaminate_bloom(
    corpus: DataFrame,
    eval_grams: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits_per_key: int = 16,
    k: int = 7,
) -> DataFrame:
    """``decontaminate`` with a Bloom prefilter: output-identical (no
    false negatives), but the exact gram join only ever sees
    bloom-positive docs, and the broadcast shrinks from the gram
    STRINGS to ``m/64`` packed longs.  The exact set is still joined —
    against the candidate sliver — to burn off false positives."""
    bloom = bloom_build(eval_grams, bits_per_key=bits_per_key, k=k)
    cand = bloom_candidates(corpus, bloom, n=n, text_col=text_col)
    bad = contamination_hits(cand, eval_grams, n, id_col, text_col).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


# ------------------------------------------------------------ auto routing
#
# The two tiers are output-identical, but picking the wrong one at scale
# hurts in opposite directions: the exact tier broadcasts the raw gram
# strings (GBs for a 100k-doc eval suite — executor OOM territory),
# while the bloom tier pays a filter-build pass that is pure overhead
# when the gram set would have broadcast comfortably anyway.  One entry
# point owns that decision so a caller (and the CLI) cannot hold the
# wrong tier at the wrong scale.

#: Above this many distinct eval grams the raw-string broadcast stops
#: being comfortable (~2M grams × ~50 B of string + hash-map overhead
#: ≈ several hundred MB per executor) and the packed-long Bloom
#: prefilter becomes the right plan.
DEFAULT_BROADCAST_GRAM_CAP = 2_000_000


def choose_tier(
    eval_grams: DataFrame,
    max_broadcast_grams: int = DEFAULT_BROADCAST_GRAM_CAP,
) -> str:
    """``"exact"`` while the distinct eval-gram set is comfortably
    broadcastable, else ``"bloom"``.  The probe costs one
    distinct-aggregation pass over the EVAL SUITE (``eval_ngrams``
    ends in ``distinct()``, and Spark cannot push a limit through an
    Aggregate — the ``limit`` here bounds only the rows surfaced to
    the count, not the aggregation).  That is acceptable by
    construction: the eval suite is orders of magnitude smaller than
    the corpus whose join plan the answer decides, and whichever tier
    is chosen re-aggregates the same gram set anyway (the exact tier
    broadcasts it, the bloom tier folds it into the filter), so the
    probe duplicates a small pass rather than adding a new one."""
    probe = eval_grams.limit(max_broadcast_grams + 1).count()
    return "exact" if probe <= max_broadcast_grams else "bloom"


def decontaminate_auto(
    corpus: DataFrame,
    eval_grams: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    tier: str = "auto",
    max_broadcast_grams: int = DEFAULT_BROADCAST_GRAM_CAP,
) -> DataFrame:
    """The cleaned corpus via whichever tier fits the eval-gram scale.

    ``tier="auto"`` (the default) measures the gram set once and routes:
    exact broadcast join below ``max_broadcast_grams`` distinct grams,
    Bloom-prefiltered above it.  ``"exact"``/``"bloom"`` force a tier
    (tests, benchmarks).  Output is identical on every path — the bloom
    tier has no false negatives and burns false positives with the same
    exact join."""
    if tier == "auto":
        tier = choose_tier(eval_grams, max_broadcast_grams)
    if tier == "exact":
        return decontaminate(corpus, eval_grams, n, id_col, text_col)
    if tier == "bloom":
        return decontaminate_bloom(
            corpus, eval_grams, n=n, id_col=id_col, text_col=text_col
        )
    raise ValueError(f"tier must be auto/exact/bloom, got {tier!r}")

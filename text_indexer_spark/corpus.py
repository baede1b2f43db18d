"""Deterministic corpus synthesis.

Two generators, both seed-fixed (seed=42), no external data:

* ``golden_corpus`` — the reference test fixtures re-expressed as corpus
  rows (reference ``library/src/test/resources/texts/`` +
  ``TestData.kt:7-26``): a Fight Club excerpt (conjunctive query target,
  ``DocumentsIndexerTest.kt:52-60``), two negative-match docs, the
  ``"Be curious, not judgemental"`` sentinel and its ``Walt Whitman``
  modification (``DocumentsIndexerTest.kt:258-293``), and a code sample
  verifying ``_``/digits are not delimiters (``DocumentTokenizer.kt:21``).
* ``synthetic_corpus`` — a Zipfian-vocabulary corpus generated INSIDE
  Spark (range → expressions; nothing is collected or parallelized from
  the driver) so it scales to any row count. Zipf guarantees stop-word
  like hot terms for skew tests, per the north rule.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

FIGHT_CLUB = (
    '"This isn\'t really death," Tyler says. "We\'ll be legend. We won\'t grow old."\n'
    "I am not me any longer. Tyler and me, we keep moving. You met me at a very "
    "strange time in my life. Where I come from people fight to feel something real."
)
HAPPINESS = (
    "Happiness is not a destination but a practice. A practical guide begins with "
    "accepting struggle and choosing what pain is worth enduring for you."
)
MON_MOTHMA = (
    "Mon Mothma led the Rebel Alliance with quiet resolve. Many Bothans listened "
    "when the senator from Chandrila spoke of hope against the Empire."
)
BE_CURIOUS = "Be curious, not judgemental"
WALT = "Be curious, not judgemental\nWalt Whitman"
CODE_SAMPLE = (
    "fun main_loop(count_2: Int): Int {\n"
    "    val snake_case_name = count_2 + 41\n"
    "    return snake_case_name\n"
    "}"
)

GOLDEN_DOCS = [
    # (repo, path, lang, content)
    ("texts", "fight-club.txt", "text", FIGHT_CLUB),
    ("texts", "mark-manson/a-practical-guide-to-happiness.txt", "text", HAPPINESS),
    ("texts", "star-wars-mon-mothma.txt", "text", MON_MOTHMA),
    ("texts", "temp_file.txt", "text", BE_CURIOUS),
    ("src", "main/Example.kt", "kotlin", CODE_SAMPLE),
]


def _commit_of(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()[:40]


def golden_corpus(spark: SparkSession, snapshot: int = 1) -> DataFrame:
    """The 5-doc golden corpus; ``snapshot=2`` swaps the sentinel for its
    modified version (new commit, new content — re-index trigger),
    ``snapshot=3`` deletes it (reference sync tests,
    ``DocumentsIndexerTest.kt:153-293``)."""
    rows = []
    for repo, path, lang, content in GOLDEN_DOCS:
        if path == "temp_file.txt":
            if snapshot == 2:
                content = WALT
            elif snapshot >= 3:
                continue
        rows.append((repo, path, _commit_of(content), lang, content))
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


# 64-word vocabulary; rank-r word drawn with probability ∝ 1/(r+1)
# (Zipf) so low ranks behave like stop words (hot terms → skew path).
VOCAB = [
    "the", "a", "to", "of", "and", "in", "for", "is",
    "data", "index", "query", "term", "token", "shard", "merge", "scan",
    "join", "sort", "hash", "block", "list", "score", "rank", "batch",
    "spark", "table", "column", "row", "file", "path", "commit", "repo",
    "fast", "slow", "big", "small", "hot", "cold", "new", "old",
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "parse", "build", "read", "write", "sync", "fetch", "store", "cache",
    "node", "edge", "graph", "tree", "heap", "stack", "queue", "ring",
]


def synthetic_corpus(
    spark: SparkSession,
    n_docs: int,
    avg_tokens: int = 120,
    n_repos: int = 50,
    seed: int = SEED,
) -> DataFrame:
    """Generate ``n_docs`` corpus rows fully inside Spark.

    Per doc: token count varies deterministically in
    [avg_tokens/2, 3*avg_tokens/2); token at position j is
    VOCAB[zipf_pick(xxhash64(seed, doc, j))]. No driver-side data, so
    this scales to bench sizes (and, on a real cluster, to arbitrary
    sizes) with perfect determinism regardless of parallelism.
    """
    v = len(VOCAB)
    # cumulative Zipf weights as a SQL array literal (driver-side tiny)
    weights = [1.0 / (r + 1) for r in range(v)]
    total = sum(weights)
    cum = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    cum_expr = F.array(*[F.lit(c) for c in cum])
    vocab_expr = F.array(*[F.lit(w) for w in VOCAB])

    base = spark.range(n_docs).withColumnRenamed("id", "i")
    ntok = (
        F.lit(avg_tokens // 2)
        + F.pmod(F.xxhash64(F.lit(seed), F.col("i"), F.lit("len")), F.lit(avg_tokens))
    ).cast("int")
    docs = base.withColumn("ntok", ntok)
    # positions → hash → uniform (0,1) → inverse-CDF pick from cum weights
    u = (
        F.pmod(F.xxhash64(F.lit(seed), F.col("i"), F.col("pos")), F.lit(1_000_000))
        / F.lit(1_000_000.0)
    )
    toks = (
        docs.select("i", "ntok", F.explode(F.sequence(F.lit(0), F.col("ntok") - 1)).alias("pos"))
        .withColumn("u", u)
        .withColumn(
            "tok",
            F.element_at(
                vocab_expr,
                F.coalesce(
                    F.array_position(
                        F.transform(cum_expr, lambda c: F.col("u") <= c), F.lit(True)
                    ),
                    F.lit(v),
                ).cast("int"),
            ),
        )
    )
    # sort_array over (pos, tok) structs → deterministic token order
    # regardless of partitioning (collect_list alone is order-unstable).
    content = toks.groupBy("i").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("pos"), F.col("tok")))),
                lambda s: s["tok"],
            ),
        ).alias("content")
    )
    return content.select(
        F.concat(F.lit("org/repo-"), F.pmod(F.col("i"), F.lit(n_repos)).cast("string")).alias(
            "repo"
        ),
        F.concat(F.lit("src/f_"), F.col("i").cast("string"), F.lit(".txt")).alias("path"),
        F.substring(F.sha2(F.concat(F.lit(seed), F.col("content")), 256), 1, 40).alias(
            "commit"
        ),
        F.lit("text").alias("lang"),
        F.col("content"),
    )

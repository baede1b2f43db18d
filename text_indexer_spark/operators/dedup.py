"""Deduplication operators for large-scale training-data pipelines.

Five families, all pure DataFrame programs (JVM expressions only — no
Python in any hot path; md5/xxhash64 are Spark built-ins):

* ``exact_dedup`` — hash-groupBy on content digest. One shuffle on the
  digest; at 10^12 rows this is the cheapest possible dedup and the
  digest shuffle key is uniform by construction (no skew).
* ``minhash_signatures`` + ``lsh_candidate_pairs`` — shingle → minhash →
  band → bucket-join. Banding turns the quadratic pair problem into a
  per-bucket join; bucket sizes are bounded because a bucket is a
  (band_idx, band_hash) collision group. Hash = md5 (deterministic,
  engine-portable — the DuckDB oracle computes the identical
  signatures).
* ``simhash_signatures`` — per-token md5-derived ±1 bit votes weighted
  by tf; near-dups have small Hamming distance. ``simhash_near_pairs``
  finds all pairs within Hamming ≤ d via (d+1)-band pigeonhole
  bucketing: recall 1.0, equi-join only, never a cartesian.
* pair → CLUSTER closure and cleaned-corpus materialization live in
  ``cluster.py`` (connected components over any pair source).
* ``ngram_jaccard_pairs`` — exact token-n-gram Jaccard via shingle
  self-join; the LSH path above is the scale version of this exact one.
  A shingle shared by m docs emits m² pair rows, so the hot-shingle cap
  defaults ON (``DEFAULT_MAX_SHINGLE_DF``; ``hot_shingles`` audits what
  it drops).
* embedding near-dup lives in ``similarity.py`` (cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, canonical_id, group_size): one row per doc that belongs
    to a duplicate group (group_size ≥ 2); canonical = min doc_id."""
    h = df.select(F.col(id_col), F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("h"))
    w = Window.partitionBy("h")
    return (
        h.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count("*").over(w).cast("long"))
        .filter(F.col("group_size") >= 2)
        .select(id_col, "canonical_id", "group_size")
    )


def token_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct token n-gram shingles per doc → (doc_id, shingle)."""
    toks = df.select(F.col(id_col), tokenize_column(text_col).alias("t"))
    sh = toks.select(
        id_col,
        F.explode(
            F.when(
                F.size("t") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", F.col("t")))),
        ).alias("shingle"),
    )
    return sh.distinct()


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig_0..sig_{H-1}): sig_i = min over shingles of
    md5(i || '|' || shingle). md5 keeps the signature engine-portable
    (the DuckDB oracle reproduces it bit-for-bit); a production index
    would use xxhash64 for speed."""
    sh = token_shingles(df, n, text_col, id_col)
    hashed = sh.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"sig_{i}") for i in range(num_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket → (doc_a, doc_b) pairs,
    doc_a < doc_b, distinct. The self-join is per (band_idx, band_hash)
    bucket — tiny groups, no quadratic global blow-up."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat(*parts)).alias("band_hash"))
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


DEFAULT_MAX_SHINGLE_DF = 1000


def hot_shingles(
    df: DataFrame,
    n: int = 3,
    max_shingle_df: int = DEFAULT_MAX_SHINGLE_DF,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(shingle, df) for every shingle the cap would drop — the
    observability side of the cap: a pipeline should log/metric this
    count next to the pair output so dropped mass is never silent."""
    sh = token_shingles(df, n, text_col, id_col)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("df"))
        .filter(F.col("df") > max_shingle_df)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    round_to: int = 4,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold → (doc_a, doc_b, jaccard).

    Scale note: a shingle shared by m docs contributes m·(m-1)/2 pair
    rows — one stop-word trigram shared by 10^6 docs would emit 10^12
    rows. ``max_shingle_df`` therefore defaults ON (ubiquitous shingles
    carry no near-dup signal; Jaccard is then computed over the capped
    shingle universe on BOTH the intersection and the sizes, so the
    metric stays internally consistent). Use ``hot_shingles`` to
    log/audit what the cap dropped. Pass ``max_shingle_df=None`` only
    for oracle-grade exact Jaccard on bounded corpora; the LSH path is
    the real 100 TB answer, this is its exact oracle."""
    sh = token_shingles(df, n, text_col, id_col)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                round_to,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def simhash_signatures(
    df: DataFrame,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simhash): bit j votes +tf if md5(j || '|' || token) has a
    first hex digit ≥ '8', else −tf; sign of the sum sets the bit.

    md5-derived bits keep it engine-portable (DuckDB oracle); bits=16/32
    keeps the per-token hash count bounded. Near-dup = small Hamming
    distance (``hamming`` helper below)."""
    toks = df.select(F.col(id_col), F.explode(tokenize_column(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    votes = tf.select(
        id_col,
        *[
            (
                F.when(
                    F.substring(F.md5(F.concat(F.lit(f"{j}|"), F.col("term"))), 1, 1)
                    >= F.lit("8"),
                    F.col("tf"),
                ).otherwise(-F.col("tf"))
            ).alias(f"v{j}")
            for j in range(bits)
        ],
    )
    sums = votes.groupBy(id_col).agg(*[F.sum(f"v{j}").alias(f"s{j}") for j in range(bits)])
    sig = sums.select(
        id_col,
        sum(
            (F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)))
            for j in range(bits)
        ).cast("long").alias("simhash"),
    )
    return sig


def hamming(a, b):
    """Hamming distance between two integer simhash columns."""
    return F.bit_count(a.bitwiseXOR(b))


def _band_split(bit_col, bits: int, n_bands: int):
    """Split an integer bit signature into ``n_bands`` contiguous bands
    (widths as even as possible) → array<struct<band_idx, band_val>>.

    Pigeonhole guarantee: two signatures with Hamming distance ≤ d agree
    EXACTLY on at least one of d+1 bands, so an equi-join on
    (band_idx, band_val) has recall 1.0 for Hamming ≤ n_bands − 1."""
    widths = [bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    bands, off = [], 0
    for i, w in enumerate(widths):
        val = F.shiftrightunsigned(bit_col, off).bitwiseAND(F.lit((1 << w) - 1))
        bands.append(
            F.struct(F.lit(i).alias("band_idx"), val.cast("long").alias("band_val"))
        )
        off += w
    return F.array(*bands)


def simhash_near_pairs(
    signatures: DataFrame,
    max_hamming: int = 2,
    bits: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b, hamming) with Hamming ≤ d.

    Scale shape: (d+1)-band pigeonhole bucketing — the signature is split
    into d+1 bands; any pair within Hamming ≤ d matches exactly on some
    band, so an EQUI-join on (band_idx, band_val) finds every such pair
    (recall 1.0), and the full Hamming check inside the bucket discards
    false candidates. No cartesian/broadcast-nested-loop join anywhere
    (plan-asserted in tests); the shuffle key is the band value, whose
    bucket sizes are bounded by how many docs actually share d+1-th of a
    signature — the quantity the operator is estimating in the first
    place. Cost: (d+1)× row duplication + one equi-join, vs N²/2 for the
    naive pair scan."""
    n_bands = max_hamming + 1
    banded = signatures.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(_band_split(F.col("simhash"), bits, n_bands)).alias("b"),
    ).select(id_col, "simhash", "b.band_idx", "b.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hd", hamming(F.col("a.simhash"), F.col("b.simhash")))
        .filter(F.col("hd") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("hd").cast("int").alias("hamming"),
        )
        .distinct()
    )

"""Driver-contract queries, part 2: dedup, similarity search, text
analysis, multimodal plumbing — plus the compressed-index WAND path
cross-checked against the same SQL oracle as the uncompressed scorer.

Every Spark query here is a thin call into the operator modules; every
oracle reproduces the operator's math in DuckDB exactly (same md5-based
hashes, same rounding, same tie-breaks).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark.operators import (
    cluster,
    dedup,
    multimodal,
    sampling,
    similarity,
    textstats,
)
from text_indexer_spark.sources.tables import load_table
from text_indexer_spark.unicode_fixture import with_fixture_sql as _ufix
from text_indexer_spark.tokenizer import duckdb_tokens_sql

MINHASHES = 8
BANDS = 4
SHINGLE_N = 3
SIMHASH_BITS = 16
JACCARD_T = 0.5
# testdata embeddings max pairwise cosine ≈ 0.51 — 0.4 keeps the gated
# near-dup query non-vacuous (≈60 pairs at sf0.01; nearest value is
# >1e-4 from the boundary, safe under round-4 comparison)
COSINE_T = 0.4
ROUND = 4

_WAND_INDEX_CACHE: dict[str, str] = {}
_POS_INDEX_CACHE: dict[str, str] = {}
_OPT_INDEX_CACHE: dict[str, str] = {}

#: regex with a required literal ≥3 chars ("quer") — exercises the
#: trigram-pruned grep path (the full-scan GREP_REGEX "s[a-z]+m" has no
#: usable literal and would silently fall back)
TRIGRAM_REGEX = "quer[a-z]+"


# ---------------------------------------------------------------- SQL bits
def _tokens_sql() -> str:
    return f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"


def _shingles_sql(n: int = SHINGLE_N) -> str:
    t = _tokens_sql()
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n} + 2), "
        f"i -> array_to_string(list_slice({t}, i, i + {n} - 1), ' ')) "
        f"ELSE [array_to_string({t}, ' ')] END"
    )


def _shingle_cte() -> str:
    return (
        f"sh AS (SELECT DISTINCT doc_id, shingle FROM "
        f"(SELECT doc_id, unnest({_shingles_sql()}) AS shingle FROM documents))"
    )


# ---------------------------------------------------------------- dedup
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents ∪ planted duplicates (every 25th doc
    re-appears under doc_id+1,000,000): the testdata has only NEAR dups,
    so without planting, this gate would pass vacuously on 0 rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.pmod(F.col("doc_id"), F.lit(25)) == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    )
    return dedup.exact_dedup(docs.unionByName(planted))


def sql_dedup_exact() -> str:
    return """
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
),
h AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM u),
g AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS canonical_id,
             count(*) OVER (PARTITION BY h) AS group_size FROM h)
SELECT doc_id, canonical_id, group_size::BIGINT AS group_size
FROM g WHERE group_size >= 2
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, num_hashes=MINHASHES, n=SHINGLE_N)


def sql_dedup_minhash() -> str:
    mins = ", ".join(
        f"min(md5('{i}|' || shingle)) AS sig_{i}" for i in range(MINHASHES)
    )
    return f"WITH {_shingle_cte()} SELECT doc_id, {mins} FROM sh GROUP BY doc_id"


def q_dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, num_hashes=MINHASHES, n=SHINGLE_N)
    return dedup.lsh_candidate_pairs(sigs, num_hashes=MINHASHES, bands=BANDS)


def sql_dedup_lsh_pairs() -> str:
    rpb = MINHASHES // BANDS
    mins = ", ".join(f"min(md5('{i}|' || shingle)) AS sig_{i}" for i in range(MINHASHES))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5({' || '.join(f'sig_{b * rpb + r}' for r in range(rpb))}) AS band_hash FROM sigs"
        for b in range(BANDS)
    )
    return f"""
WITH {_shingle_cte()},
sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""


JACCARD_CAP = dedup.DEFAULT_MAX_SHINGLE_DF


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, n=SHINGLE_N, threshold=JACCARD_T, max_shingle_df=JACCARD_CAP
    )


def sql_dedup_jaccard() -> str:
    # the hot-shingle cap is part of the operator's semantics, so the
    # oracle applies the identical cap before sizes AND intersections
    return f"""
WITH {_shingle_cte()},
shf AS (
  SELECT * FROM sh WHERE shingle NOT IN (
    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {JACCARD_CAP})
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(i / (sa.sz + sb.sz - i), {ROUND}) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / (sa.sz + sb.sz - i), {ROUND}) >= {JACCARD_T}
"""


HOT_SHINGLE_GATE_CAP = 3  # sf0.01: 615 shingles above it — non-vacuous


def q_hot_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cap-audit helper: (shingle, df) for every shingle a df cap
    would drop — what a pipeline logs next to capped Jaccard output so
    dropped mass is never silent."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.hot_shingles(docs, n=SHINGLE_N, max_shingle_df=HOT_SHINGLE_GATE_CAP)


def sql_hot_shingles() -> str:
    return f"""
WITH {_shingle_cte()}
SELECT shingle, count(*)::BIGINT AS df FROM sh
GROUP BY shingle HAVING count(*) > {HOT_SHINGLE_GATE_CAP}
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_signatures(docs, bits=SIMHASH_BITS)


def sql_dedup_simhash(n_bits: int = SIMHASH_BITS) -> str:
    toks = duckdb_tokens_sql("text")
    bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN substr(md5('{j}|' || term), 1, 1) >= '8' "
        f"THEN tf ELSE -tf END) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t WHERE term <> '' GROUP BY 1, 2)
SELECT doc_id, ({bits})::BIGINT AS simhash FROM tf GROUP BY doc_id
"""


# 32-bit signatures for the PAIRS gate: 16 bits saturate on this corpus
# (504 exact-equal signature pairs at sf0.01); 32 bits keep the Hamming≤2
# pair set discriminative (991 pairs) so the banding join is exercised
# non-vacuously.
SIMHASH_PAIR_BITS = 32
SIMHASH_MAX_HAMMING = 2


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via (d+1)-band pigeonhole bucketing over 32-bit
    simhash signatures — the scale-safe equi-join path (no cartesian;
    plan-asserted in tests). Oracle = exact all-pairs Hamming in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.simhash_signatures(docs, bits=SIMHASH_PAIR_BITS)
    return dedup.simhash_near_pairs(
        sigs, max_hamming=SIMHASH_MAX_HAMMING, bits=SIMHASH_PAIR_BITS
    )


def sql_dedup_simhash_pairs() -> str:
    return f"""
WITH sigs AS ({sql_dedup_simhash(SIMHASH_PAIR_BITS)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------------------- registry
def q_registry_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end registry state machine (nested/independent provenance,
    operators/registry.py) over a deterministic event sequence on the
    documents table:

    1. every ``source`` added as a DIR source sweeping its docs with
       doc_id%5 != 0 (→ nested) into synthetic sub-paths;
    2. docs with doc_id%5 == 0 added as explicit FILE sources
       (→ independent);
    3. docs with doc_id%7 == 0 among the swept ones removed; the
       lang='en' ones "still exist on the source" → their source dirs
       demote to NotIndexed (IndexedFileManager.kt:36-58);
    4. source dir 'src1' removed outright (subtree drop).

    Output = final ANY listing (dir rows carry doc_id = -1: a NULL
    would be engine-ambiguous in the driver's value compare). The
    oracle is the closed form of the same rules."""
    from text_indexer_spark.operators import registry as R

    docs = load_table(spark, sf_dir, "documents").select(
        F.lit("corpus").alias("repo"),
        F.concat(
            F.col("source"), F.lit("/sub"), F.pmod(F.col("doc_id"), F.lit(3)),
            F.lit("/doc_"), F.col("doc_id"), F.lit(".txt"),
        ).alias("path"),
        "doc_id", "source", "lang",
    )
    dirs = docs.select("repo", F.col("source").alias("path")).distinct()
    state = R.empty_state(spark)
    state = R.add_dir_source(
        state, dirs, docs.filter(F.pmod("doc_id", F.lit(5)) != 0).select("repo", "path", "doc_id")
    )
    state = R.add_file_sources(
        state, docs.filter(F.pmod("doc_id", F.lit(5)) == 0).select("repo", "path", "doc_id")
    )
    state = R.remove_items(
        state,
        files_to_remove=docs.filter(
            (F.pmod("doc_id", F.lit(7)) == 0) & (F.pmod("doc_id", F.lit(5)) != 0)
        ).select("repo", "path", (F.col("lang") == "en").alias("still_exists")),
    )
    state = R.remove_items(
        state,
        dirs_to_remove=spark.createDataFrame(
            [("corpus", "src1", False)], "repo string, path string, contains_any_file boolean"
        ),
    )
    return R.list_indexed(state).withColumn(
        "doc_id", F.coalesce(F.col("doc_id"), F.lit(-1)).cast("long")
    )


def sql_registry_listing() -> str:
    return """
WITH f AS (
  SELECT 'corpus' AS repo,
         source || '/sub' || (doc_id % 3) || '/doc_' || doc_id || '.txt' AS path,
         'file' AS kind, doc_id,
         (doc_id % 5 <> 0) AS is_nested, source, lang
  FROM documents
),
survivors AS (
  SELECT repo, path, kind, doc_id, is_nested FROM f
  WHERE source <> 'src1' AND NOT (doc_id % 7 = 0 AND doc_id % 5 <> 0)
),
demoted AS (
  SELECT DISTINCT source FROM f
  WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0 AND lang = 'en'
),
dirs AS (
  SELECT DISTINCT 'corpus' AS repo, source AS path, 'dir' AS kind,
         (-1)::BIGINT AS doc_id, FALSE AS is_nested
  FROM documents
  WHERE source <> 'src1' AND source NOT IN (SELECT source FROM demoted)
)
SELECT * FROM survivors UNION ALL SELECT * FROM dirs
"""


# ---------------------------------------------------------------- clustering
def _planted_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ planted exact duplicates (same planting rule as
    ``q_dedup_exact`` — every 25th doc re-appears under doc_id+1e6)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.pmod(F.col("doc_id"), F.lit(25)) == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    )
    return docs.unionByName(planted)


def _cluster_pair_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair graph the clustering gates run over: LSH candidate pairs
    on the real docs ∪ exact-dup pairs from the planted corpus — two
    independent pair sources whose transitive closure the cluster op
    must merge (a planted copy of doc X links X's LSH component to the
    planted id space)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = dedup.minhash_signatures(docs, num_hashes=MINHASHES, n=SHINGLE_N)
    lsh = dedup.lsh_candidate_pairs(sigs, num_hashes=MINHASHES, bands=BANDS)
    ex = (
        dedup.exact_dedup(_planted_union(spark, sf_dir))
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select(F.col("canonical_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return lsh.unionByName(ex)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the union pair graph → (doc_id,
    cluster_id). The step that turns pair REPORTS into an actionable
    dedup decision (reference drops dupes at scan time,
    FilesAndDirs.kt:12-16; min-id canonical generalizes its
    first-wins)."""
    return cluster.dedup_clusters(_cluster_pair_edges(spark, sf_dir))


def q_dedup_kept_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned corpus: planted-union corpus minus every clustered doc
    except its min-id canonical."""
    clusters = cluster.dedup_clusters(_cluster_pair_edges(spark, sf_dir))
    kept = cluster.materialize_deduped(_planted_union(spark, sf_dir), clusters)
    return kept.select(
        "doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("content_md5")
    )


def _cluster_edges_ctes() -> str:
    """Shared CTE chain: LSH pairs + planted exact pairs → symmetric
    edge list → recursive reachability → (doc_id, cluster_id)."""
    rpb = MINHASHES // BANDS
    mins = ", ".join(f"min(md5('{i}|' || shingle)) AS sig_{i}" for i in range(MINHASHES))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5({' || '.join(f'sig_{b * rpb + r}' for r in range(rpb))}) AS band_hash FROM sigs"
        for b in range(BANDS)
    )
    return f"""
{_shingle_cte()},
sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS ({band_rows}),
lsh AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
),
hx AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM u),
ex AS (
  SELECT min_id AS doc_a, doc_id AS doc_b FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS min_id,
           count(*) OVER (PARTITION BY h) AS c FROM hx
  ) WHERE c >= 2 AND doc_id <> min_id
),
e0 AS (SELECT doc_a, doc_b FROM lsh UNION SELECT doc_a, doc_b FROM ex),
edges AS (SELECT doc_a AS a, doc_b AS b FROM e0 UNION SELECT doc_b AS a, doc_a AS b FROM e0),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.b AS r FROM reach JOIN edges e ON e.a = reach.r
),
clusters AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
"""


def sql_dedup_clusters() -> str:
    return f"WITH RECURSIVE {_cluster_edges_ctes().strip()} SELECT doc_id, cluster_id FROM clusters"


def sql_dedup_kept_corpus() -> str:
    return f"""
WITH RECURSIVE {_cluster_edges_ctes().strip()}
SELECT u.doc_id, md5(coalesce(u.text, '')) AS content_md5
FROM u
WHERE u.doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
"""


# ---------------------------------------------------------------- similarity
def q_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_near_pairs(emb, threshold=COSINE_T)


def sql_neardup_cosine() -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), {ROUND}) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), {ROUND}) >= {COSINE_T}
"""


def q_neardup_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-pair join in its full-probe configuration
    (probe_hamming = n_planes → every pair compared through the band
    machinery) — must equal the exact O(N²) scan, so it shares its SQL
    oracle. Partial probes trade recall for cost (recall-tested in
    pytest)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    return similarity.cosine_near_pairs_lsh(
        emb, dim, threshold=COSINE_T, n_planes=8, probe_hamming=8
    )


def q_neardup_clusters_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over EMBEDDING near-pairs — the same
    clustering operator the text dedup family uses, composed with the
    cosine pair source (one clustering engine, any pair modality)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_near_pairs(emb, threshold=COSINE_T).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return cluster.dedup_clusters(pairs)


def sql_neardup_clusters_cosine() -> str:
    return f"""
WITH RECURSIVE
p AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), {ROUND}) >= {COSINE_T}
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.b AS r FROM reach JOIN edges e ON e.a = reach.r
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
"""


def q_semdedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/semdedup.py) at its SQL-able configuration:
    ONE cluster (pair search is exhaustive) + min-id keep — by
    construction identical to global embedding near-dup dedup, so the
    recursive-CTE oracle proves the assignment → within-cluster pair →
    transitive closure → keep → anti-join plumbing end to end (the
    paper's centroid_far keep rule and the cluster confinement are
    pytest-pinned in test_semdedup.py)."""
    from text_indexer_spark.operators import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    one = [[1.0] + [0.0] * (dim - 1)]
    return semdedup.semantic_dedup(
        emb, dim, threshold=COSINE_T, centroids=one, keep="min_id"
    ).select("vec_id", "label")


def sql_semdedup_kept() -> str:
    return f"""
WITH RECURSIVE
p AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), {ROUND}) >= {COSINE_T}
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.b AS r FROM reach JOIN edges e ON e.a = reach.r
),
comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.cosine_topk(emb, queries, k=10)


def q_ann_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN probing ALL inverted lists — exhaustive, so it must equal
    the brute-force scorer and shares its SQL oracle. Gates the coarse
    quantizer + probe + per-list scoring machinery end to end; partial
    probes trade recall for cost (recall-tested in pytest)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    dim = len(emb.select("embedding").first()["embedding"])
    return similarity.ivf_topk(
        emb, queries, dim=dim, k=10, n_centroids=4, n_probe=4
    )


def q_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k served from the INT8-quantized vector store:
    error-bounded admission (k-th lower bound + rounding margin) keeps
    a certified superset, exact rerank touches only the candidate
    sliver — output identical to brute force BY CONSTRUCTION, so the
    gate shares ``sql_ann_topk``'s oracle (``similarity.ann_int8_topk``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.ann_int8_topk(emb, queries, k=10)


_IVF8_INDEX_CACHE: dict[str, str] = {}


def q_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + SQ8 (quantized inverted lists): partition-pruned probe
    reads only the int8 columns, certified error-bound admission, exact
    rerank on the float column for the candidate sliver.  Full probe →
    both stages lossless → shares the brute-force oracle
    (``similarity.ivf_topk_indexed_int8``)."""
    from text_indexer_spark.operators.similarity import (
        ivf_ingest,
        ivf_topk_indexed_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    if sf_dir not in _IVF8_INDEX_CACHE:
        idx = tempfile.mkdtemp(prefix="driver_ivf8_idx_")
        ivf_ingest(emb, idx, dim, n_centroids=4, quantize=True)
        _IVF8_INDEX_CACHE[sf_dir] = idx
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk_indexed_int8(
        spark, _IVF8_INDEX_CACHE[sf_dir], queries, k=10, n_probe=4
    )


def sql_ann_topk() -> str:
    return f"""
SELECT q.vec_id AS query_id, e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), {ROUND}) AS cos
FROM embeddings e
JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q ON e.vec_id <> q.vec_id
QUALIFY row_number() OVER (
  PARTITION BY q.vec_id
  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), {ROUND}) DESC,
           e.vec_id ASC
) <= 10
"""


_IVF_INDEX_CACHE: dict[str, str] = {}


def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over the INGEST-TIME layout: corpus persisted partitioned by
    cid (ivf_ingest), query path reads only probed partitions
    (plan-asserted partition pruning in pytest). Full probe → must equal
    the brute-force scorer, so it shares its SQL oracle."""
    from text_indexer_spark.operators.similarity import ivf_ingest, ivf_topk_indexed

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    if sf_dir not in _IVF_INDEX_CACHE:
        idx = tempfile.mkdtemp(prefix="driver_ivf_idx_")
        ivf_ingest(emb, idx, dim, n_centroids=4)
        _IVF_INDEX_CACHE[sf_dir] = idx
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk_indexed(spark, _IVF_INDEX_CACHE[sf_dir], queries, k=10, n_probe=4)


_IVF_UPSERT_CACHE: dict[str, str] = {}


def q_ann_ivf_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serving through the MAINTAINED store (``vecstore.py``): the
    base ingest carries STALE embeddings for ids ≡2 (mod 4) and is
    missing ids ≡3 (mod 4); upsert v2 replaces the stale vectors and
    inserts the missing ones, upsert v3 deletes ids ≡6 (mod 7) — three
    committed versions, segment/tombstone resolution at read.  Full
    probe → the served result must equal brute force over the LOGICAL
    corpus (embeddings minus the deletes), which is what the oracle
    computes; stale rows surviving, replaced rows duplicated, or
    deleted rows resurrected all hash-mismatch."""
    from text_indexer_spark.operators.similarity import (
        ivf_ingest,
        ivf_topk_indexed,
    )
    from text_indexer_spark.operators.vecstore import ivf_upsert

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    if sf_dir not in _IVF_UPSERT_CACHE:
        idx = tempfile.mkdtemp(prefix="driver_ivf_upsert_idx_")
        base = emb.filter(F.col("vec_id") % 4 != 3).withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 4 == 2, F.reverse(F.col("embedding"))
            ).otherwise(F.col("embedding")),
        )
        ivf_ingest(base, idx, dim, n_centroids=4)
        ivf_upsert(
            spark, idx, emb.filter(F.col("vec_id") % 4 >= 2)
        )
        ivf_upsert(
            spark, idx, None,
            emb.filter(F.col("vec_id") % 7 == 6).select("vec_id"),
        )
        _IVF_UPSERT_CACHE[sf_dir] = idx
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk_indexed(
        spark, _IVF_UPSERT_CACHE[sf_dir], queries, k=10, n_probe=4
    )


def sql_ann_upsert_topk() -> str:
    # brute force over the logical corpus the maintained store must
    # serve: every embedding except the deleted ids (≡6 mod 7)
    return f"""
SELECT q.vec_id AS query_id, e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), {ROUND}) AS cos
FROM (SELECT * FROM embeddings WHERE vec_id % 7 <> 6) e
JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q ON e.vec_id <> q.vec_id
QUALIFY row_number() OVER (
  PARTITION BY q.vec_id
  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), {ROUND}) DESC,
           e.vec_id ASC
) <= 10
"""


# ---------------------------------------------------------------- textstats
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text_indexer_spark.unicode_fixture import docs_with_fixture

    return textstats.lang_id(
        docs_with_fixture(load_table(spark, sf_dir, "documents"))
    )


def sql_lang_id() -> str:
    t = _tokens_sql()
    langs = sorted(textstats.LANG_MARKERS)
    counts = ", ".join(
        "len(list_filter({t}, x -> x IN ({m}))) AS n_{lang}".format(
            t=t,
            m=", ".join(f"'{w}'" for w in textstats.LANG_MARKERS[lang]),
            lang=lang,
        )
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"n_{lang}" for lang in langs) + ")"
    case = " ".join(
        f"WHEN best > 0 AND n_{lang} = best THEN '{lang}'" for lang in langs
    )
    return f"""
WITH c AS (SELECT doc_id, {counts} FROM documents),
b AS (SELECT *, {best} AS best FROM c)
SELECT doc_id, CASE {case} ELSE 'und' END AS pred_lang FROM b
"""


LANGID_N = 3
LANGID_TOP_V = 2000


def q_lang_id_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-3-gram Naive Bayes lang-ID, trained distributively on the
    corpus's own labels and replayed step-for-step by the SQL oracle
    (vocab cut, Laplace smoothing, OOV floors, rounded argmax)."""
    from text_indexer_spark.operators.langid import langid_self_predict

    return langid_self_predict(
        load_table(spark, sf_dir, "documents"),
        n=LANGID_N,
        top_v=LANGID_TOP_V,
    )


def sql_lang_id_nb() -> str:
    n, top_v = LANGID_N, LANGID_TOP_V
    grams = (
        f"CASE WHEN length(t) >= {n} THEN "
        f"list_transform(range(1, length(t) - {n - 2}), i -> substr(t, i, {n})) "
        "WHEN length(t) > 0 THEN [t] ELSE [] END"
    )
    return f"""
WITH lt AS (SELECT doc_id, lang, lower(coalesce(text, '')) AS t FROM documents),
g AS (SELECT doc_id, lang, unnest({grams}) AS gram FROM lt),
counts AS (SELECT lang, gram, count(*) AS c FROM g GROUP BY lang, gram),
vocab AS (SELECT gram FROM (SELECT gram, sum(c) AS tot FROM counts
          GROUP BY gram ORDER BY tot DESC, gram ASC LIMIT {top_v})),
vsize AS (SELECT count(*)::DOUBLE AS v FROM vocab),
iv AS (SELECT lang, gram, c FROM counts JOIN vocab USING (gram)),
totals AS (SELECT lang, sum(c)::DOUBLE AS n_l FROM iv GROUP BY lang),
priors AS (SELECT lang, count(*)::DOUBLE AS n_docs FROM documents GROUP BY lang),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
langs AS (SELECT p.lang,
                 round(ln(p.n_docs / (SELECT n FROM nn)), 7) AS logprior,
                 round(ln(1.0 / (coalesce(tt.n_l, 0) + (SELECT v FROM vsize))), 7) AS oov
          FROM priors p LEFT JOIN totals tt USING (lang)),
model AS (SELECT iv.lang, iv.gram,
                 round(ln((iv.c + 1.0) / (tt.n_l + (SELECT v FROM vsize))), 7)
               - round(ln(1.0 / (tt.n_l + (SELECT v FROM vsize))), 7) AS adj
          FROM iv JOIN totals tt USING (lang)),
dg AS (SELECT doc_id, gram, count(*)::DOUBLE AS n_g FROM g GROUP BY doc_id, gram),
tot AS (SELECT d.doc_id, coalesce(sum(dg.n_g), 0) AS n_tot
        FROM documents d LEFT JOIN dg ON d.doc_id = dg.doc_id GROUP BY d.doc_id),
adj AS (SELECT dg.doc_id, m.lang, sum(dg.n_g * m.adj) AS adj
        FROM dg JOIN model m USING (gram) GROUP BY dg.doc_id, m.lang),
scored AS (SELECT t.doc_id, l.lang,
                  round(l.logprior + t.n_tot * l.oov + coalesce(a.adj, 0), 5) AS score
           FROM tot t CROSS JOIN langs l
           LEFT JOIN adj a ON a.doc_id = t.doc_id AND a.lang = l.lang)
SELECT doc_id, lang AS pred_lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM scored) WHERE rn = 1
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text_indexer_spark.unicode_fixture import docs_with_fixture

    return textstats.quality_scores(
        docs_with_fixture(load_table(spark, sf_dir, "documents"))
    )


def sql_quality() -> str:
    t = _tokens_sql()
    stop = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)
    return f"""
WITH x AS (
  SELECT doc_id,
         coalesce(text, '') AS txt,
         {t} AS toks,
         length(coalesce(text, '')) AS n_chars,
         length(regexp_replace(coalesce(text, ''), '[^a-zA-Z0-9]', '', 'g')) AS n_alpha,
         length(regexp_replace(coalesce(text, ''), '[^.,;:!?]', '', 'g')) AS n_punct
  FROM documents
), y AS (
  SELECT doc_id, n_chars,
         len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, x -> length(x))) / len(toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END AS alpha_ratio,
         CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> x IN ({stop}))) / len(toks)
              ELSE 0.0 END AS stop_ratio
  FROM x
)
SELECT doc_id,
       n_chars::BIGINT AS n_chars,
       n_tokens::BIGINT AS n_tokens,
       round(mean_len, {ROUND}) AS mean_token_len,
       round(alpha_ratio, {ROUND}) AS alpha_ratio,
       round(punct_ratio, {ROUND}) AS punct_ratio,
       round(stop_ratio, {ROUND}) AS stopword_ratio,
       round(least(1.0, n_tokens / 100.0) * alpha_ratio * (1.0 - punct_ratio), {ROUND}) AS quality
FROM y
"""


QUALITY_KEEP_T = 0.4  # sf0.01: keeps 278/500 docs — non-vacuous both ways


def q_quality_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filtered corpus materialization: one shuffle-free pass
    (filter fused into the scan — plan-asserted in pytest)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = textstats.filter_by_quality(docs, min_quality=QUALITY_KEEP_T)
    return kept.select(
        "doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("content_md5")
    )


def sql_quality_kept() -> str:
    return f"""
SELECT doc_id, md5(coalesce(text, '')) AS content_md5
FROM documents WHERE doc_id IN (
  SELECT doc_id FROM ({sql_quality()}) WHERE quality >= {QUALITY_KEEP_T})
"""


def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (dense deterministic token ids) +
    every document encoded to its id sequence in token order — the
    tokenize→ids step of a training pipeline
    (``textstats.vocabulary_ids`` / ``encode_docs``).  The id sequence
    is hash-compared (md5 of the comma-joined ids), so the oracle pins
    BOTH the id assignment and the per-doc ordering.  Runs over
    documents ∪ the multi-byte fixture, so id assignment and encoding
    are driver-exercised on CJK/accented/emoji tokens too."""
    from text_indexer_spark.unicode_fixture import docs_with_fixture

    docs = docs_with_fixture(load_table(spark, sf_dir, "documents"))
    vocab = textstats.vocabulary_ids(docs)
    enc = textstats.encode_docs(docs, vocab)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.md5(
            F.array_join(
                F.transform("ids", lambda x: x.cast("string")), ","
            )
        ).alias("ids_md5"),
    )


def sql_vocab_encode() -> str:
    toks = _tokens_sql()
    return f"""
WITH lt AS (SELECT doc_id, {toks} AS toks FROM documents),
pt AS (SELECT doc_id, s['pos'] AS pos, s['term'] AS term FROM (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
      i -> {{'pos': i, 'term': toks[i]}})) AS s FROM lt)),
c AS (SELECT term, count(*)::BIGINT AS cnt FROM pt GROUP BY term),
v AS (SELECT term, (row_number() OVER (ORDER BY cnt DESC, term ASC) - 1)
      AS token_id FROM c)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       md5(string_agg(token_id::VARCHAR, ',' ORDER BY pos)) AS ids_md5
FROM pt JOIN v USING (term) GROUP BY doc_id
"""


#: Merge rounds for the BPE gates — enough to build multi-char subwords
#: (the sf0.01 run learns whole words like "join" by rank 11) while the
#: unrolled oracle stays ~12 CTE blocks.
BPE_MERGES = 12

#: Trained merge sequences per sf_dir — the vocab and encode gates
#: train on the same corpus, so the second gate reuses the first's
#: 12-round training run (the _WAND_INDEX_CACHE discipline).
_BPE_MERGES_CACHE: dict[str, list] = {}


def _trained_bpe_merges(spark: SparkSession, sf_dir: str) -> list:
    if sf_dir not in _BPE_MERGES_CACHE:
        from text_indexer_spark.operators import bpe

        docs = load_table(spark, sf_dir, "documents")
        _BPE_MERGES_CACHE[sf_dir] = bpe.train_bpe(docs, n_merges=BPE_MERGES)
    return _BPE_MERGES_CACHE[sf_dir]


def _bpe_cte(n_merges: int) -> str:
    """The DuckDB twin of ``bpe.train_bpe``: the merge loop UNROLLED as
    a materialized-CTE chain (``words_0`` … ``words_n``, one
    ``best{r}`` argmax per round).  MATERIALIZED is load-bearing —
    inlined CTEs would re-evaluate the whole prefix per reference
    (~3^n blowup, observed hanging at n=8).  The greedy leftmost
    non-overlapping apply is positional: mark pair starts, split runs
    of consecutive marks (gaps-and-islands), merge even offsets — the
    window-function rendering of the fold ``operators/bpe.py`` runs
    in-row."""
    toks = _tokens_sql()
    parts = [
        f"""words_0 AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS cnt,
         list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)) AS syms
  FROM (SELECT unnest({toks}) AS word FROM documents)
  GROUP BY word)"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""best{r} AS MATERIALIZED (
  SELECT {r} AS rank, lhs, rhs, lhs || rhs AS merged
  FROM (SELECT s['l'] AS lhs, s['r'] AS rhs, sum(cnt) AS c
        FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
                     i -> {{'l': syms[i], 'r': syms[i+1]}})) AS s
              FROM words_{r} WHERE len(syms) >= 2)
        GROUP BY 1, 2)
  ORDER BY c DESC, lhs ASC, rhs ASC LIMIT 1),
words_{r + 1} AS MATERIALIZED (
  SELECT word, any_value(cnt) AS cnt,
         list(CASE WHEN dm THEN sym || nxt ELSE sym END ORDER BY pos) AS syms
  FROM (
    SELECT *, coalesce(lag(dm) OVER (PARTITION BY word ORDER BY pos), false) AS pdm
    FROM (
      SELECT word, cnt, pos, sym,
             mk AND ((pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0) AS dm,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM (
        SELECT *, CASE WHEN mk THEN pos - row_number()
                         OVER (PARTITION BY word, mk ORDER BY pos) END AS grp
        FROM (
          SELECT word, cnt, pos, sym,
                 coalesce(sym = (SELECT lhs FROM best{r})
                          AND lead(sym) OVER (PARTITION BY word ORDER BY pos)
                              = (SELECT rhs FROM best{r}), false) AS mk
          FROM (SELECT word, cnt, s['i'] AS pos, s['sym'] AS sym
                FROM (SELECT word, cnt, unnest(list_transform(range(1, len(syms) + 1),
                             i -> {{'i': i, 'sym': syms[i]}})) AS s
                      FROM words_{r}))))))
  WHERE NOT pdm
  GROUP BY word)"""
        )
    return "WITH " + ",\n".join(parts)


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE subword-vocabulary training (Sennrich et al.
    2016): the learned merge table, rank-ordered.  The oracle REPLAYS
    the full merge sequence (unrolled argmax-per-round CTE chain), so a
    hash match pins every round's pair count, tie-break and greedy
    apply — the strongest oracle an iterative trainer can have
    (``operators/bpe.py``; no reference counterpart — the reference
    tokenizes to whole words, library/.../DocumentTokenizer.kt)."""
    from text_indexer_spark.operators import bpe

    return bpe.merges_table(spark, _trained_bpe_merges(spark, sf_dir))


def sql_bpe_vocab() -> str:
    union = " UNION ALL ".join(
        f"SELECT rank, lhs, rhs, merged FROM best{r}"
        for r in range(BPE_MERGES)
    )
    return f"{_bpe_cte(BPE_MERGES)}\nSELECT * FROM ({union})"


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document encoded to its BPE piece sequence under the
    merges trained on the same corpus — train + encode end-to-end.
    The md5 of the length-prefixed 0x1f-joined pieces pins piece
    identity AND order for any token content (a bare join would be
    ambiguous for tokens containing 0x1f, which the tokenizer does
    not strip); docs with zero tokens are dropped on both sides
    (inner-join encode semantics)."""
    from text_indexer_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe.encode_docs_bpe(docs, _trained_bpe_merges(spark, sf_dir))
    return enc.select(
        "doc_id",
        "n_pieces",
        bpe.pieces_digest_column(F.col("pieces")).alias("pieces_md5"),
    )


def sql_bpe_encode() -> str:
    toks = _tokens_sql()
    return f"""{_bpe_cte(BPE_MERGES)},
occ AS (
  SELECT doc_id, s['pos'] AS pos, s['term'] AS term
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
               i -> {{'pos': i, 'term': t[i]}})) AS s
        FROM (SELECT doc_id, {toks} AS t FROM documents)))
SELECT o.doc_id,
       sum(len(w.syms))::BIGINT AS n_pieces,
       md5(string_agg(array_to_string(list_transform(w.syms, s -> length(s) || ':' || s), chr(31)), chr(31) ORDER BY o.pos)) AS pieces_md5
FROM occ o JOIN words_{BPE_MERGES} w ON w.word = o.term
GROUP BY o.doc_id
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text_indexer_spark.unicode_fixture import docs_with_fixture

    return textstats.token_counts(
        docs_with_fixture(load_table(spark, sf_dir, "documents"))
    )


def sql_token_counts() -> str:
    t = _tokens_sql()
    return f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'), x -> x <> ''))::BIGINT AS ws_tokens,
       len({t})::BIGINT AS word_tokens,
       (ceil(length(regexp_replace(coalesce(text, ''), '[^a-zA-Z0-9]', '', 'g')) / 4.0)
        + length(regexp_replace(coalesce(text, ''), '[a-zA-Z0-9\\s]', '', 'g')))::BIGINT AS bpe_ish_pieces
FROM documents
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprints(load_table(spark, sf_dir, "documents"), n=5)


def sql_fingerprints() -> str:
    t = _tokens_sql()
    n = 5
    shing = (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n} + 2), "
        f"i -> md5(array_to_string(list_slice({t}, i, i + {n} - 1), ' '))) "
        f"ELSE [md5(array_to_string({t}, ' '))] END"
    )
    return f"SELECT doc_id, list_min({shing}) AS fingerprint FROM documents"


# ---------------------------------------------------------------- multimodal
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real encoders end to end: n_bytes is the TRUE size of the BMP /
    PCM-WAV / Y4M blob the synthesizer wrote; the oracle recomputes it
    from the public format math (header + stride/plane layout)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.synthesize_media(docs).select(
        "media_id", "kind", "n_bytes", "sha256"
    )


def sql_multimodal_meta() -> str:
    return """
SELECT doc_id AS media_id,
       (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
       (CASE doc_id % 3
          WHEN 0 THEN 54 + (doc_id % 7 + 3) * (((3 * (doc_id % 13 + 4) + 3) // 4) * 4)
          WHEN 1 THEN 44 + 2 * (doc_id % 400 + 50)
          ELSE length('YUV4MPEG2 W' || (doc_id % 6 + 2) * 2
                      || ' H' || (doc_id % 4 + 2) * 2
                      || ' F25:1 Ip A1:1 C420') + 1
               + (doc_id % 12 + 2)
                 * (6 + (doc_id % 6 + 2) * 2 * (doc_id % 4 + 2) * 2
                    + 2 * ((doc_id % 6 + 2) * ((doc_id % 4 + 2) * 2 // 2)))
        END)::BIGINT AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → DECODE (real header/pixel parsing) → per-frame explode.
    width/height/n_frames come out of the payload bytes, so the oracle's
    closed-form dimensions verify the parse, not the synthesis."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs)
    decoded = multimodal.decode_media(media, strict=True)
    return multimodal.frame_sample(decoded, every_n=5).select(
        "media_id", "kind", "frame_idx", "width", "height"
    )


def sql_multimodal_frames() -> str:
    return """
WITH m AS (
  SELECT doc_id AS media_id,
         (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
         CASE doc_id % 3
           WHEN 0 THEN doc_id % 13 + 4
           WHEN 1 THEN doc_id % 400 + 50
           ELSE (doc_id % 6 + 2) * 2 END AS width,
         CASE doc_id % 3
           WHEN 0 THEN doc_id % 7 + 3
           WHEN 1 THEN 1
           ELSE (doc_id % 4 + 2) * 2 END AS height,
         CASE WHEN doc_id % 3 = 2 THEN doc_id % 12 + 2 ELSE 1 END AS nf
  FROM documents
)
SELECT media_id, kind, unnest(
  CASE WHEN kind = 'video' THEN range(0, nf, 5) ELSE [0] END
)::INT AS frame_idx,
       width::INT AS width, height::INT AS height
FROM m
"""


PHRASE = ["table", "hash"]  # 46 docs at sf0.01 — non-vacuous
PROX_TERMS = ["merge", "vector", "stream"]
PROX_W = 10


def _pp_cte() -> str:
    t = _tokens_sql()
    return (
        f"tk AS (SELECT doc_id, {t} AS toks FROM documents), "
        "pp AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term "
        "FROM tk, unnest(range(1, len(toks) + 1)) AS u(i))"
    )


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact consecutive-token phrase match (tokenizer-faithful
    positional joins — engine extension beyond the reference's boolean
    membership index)."""
    from text_indexer_spark.operators.phrase import phrase_match

    docs = load_table(spark, sf_dir, "documents")
    return phrase_match(docs, PHRASE)


def sql_phrase_match() -> str:
    return f"""
WITH {_pp_cte()}
SELECT DISTINCT p0.doc_id
FROM pp p0 JOIN pp p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
WHERE p0.term = '{PHRASE[0]}' AND p1.term = '{PHRASE[1]}'
"""


def q_proximity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered NEAR/w: all terms within a 10-token window."""
    from text_indexer_spark.operators.phrase import proximity_match

    docs = load_table(spark, sf_dir, "documents")
    return proximity_match(docs, PROX_TERMS, window=PROX_W)


def sql_proximity_match() -> str:
    a, b, c = PROX_TERMS
    return f"""
WITH {_pp_cte()}
SELECT DISTINCT a.doc_id
FROM pp a JOIN pp b ON b.doc_id = a.doc_id JOIN pp c ON c.doc_id = a.doc_id
WHERE a.term = '{a}' AND b.term = '{b}' AND c.term = '{c}'
  AND greatest(a.pos, b.pos, c.pos) - least(a.pos, b.pos, c.pos) < {PROX_W}
"""


def q_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level term co-occurrence + PMI over a df-bounded
    vocabulary (the corpus-analytics companion: phrase candidates /
    stopword diagnosis)."""
    from text_indexer_spark.operators.cooccur import term_cooccurrence

    docs = load_table(spark, sf_dir, "documents")
    return term_cooccurrence(docs, min_pair_df=5, min_term_df=2)


def sql_term_cooccurrence() -> str:
    t = _tokens_sql()
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, term FROM
  (SELECT doc_id, unnest({t}) AS term FROM documents)
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
vocab AS (SELECT term FROM tdf WHERE df >= 2),
kept AS (SELECT toks.* FROM toks SEMI JOIN vocab USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS pair_df
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term HAVING count(*) >= 5
)
SELECT term_a, term_b, pair_df,
       round(ln(n.n_docs) + ln(pair_df) - ln(da.df) - ln(db.df), {ROUND}) AS pmi
FROM pairs
JOIN tdf da ON da.term = term_a
JOIN tdf db ON db.term = term_b
CROSS JOIN n
"""


EXPAND_SEED = "spark"


def q_term_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI query-expansion candidates for one seed term (top-5
    co-occurrence neighbors, deterministic tie-breaks)."""
    from text_indexer_spark.operators.cooccur import (
        expansion_terms,
        term_cooccurrence,
    )

    docs = load_table(spark, sf_dir, "documents")
    cooc = term_cooccurrence(docs, min_pair_df=5, min_term_df=2)
    return expansion_terms(cooc, EXPAND_SEED, k=5)


def _cooc_cte() -> str:
    """The term_cooccurrence oracle as a CTE chain ending in ``cooc``."""
    t = _tokens_sql()
    return f"""toks AS (
  SELECT DISTINCT doc_id, term FROM
  (SELECT doc_id, unnest({t}) AS term FROM documents)
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
vocab AS (SELECT term FROM tdf WHERE df >= 2),
kept AS (SELECT toks.* FROM toks SEMI JOIN vocab USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS pair_df
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term HAVING count(*) >= 5
),
cooc AS (
  SELECT term_a, term_b, pair_df,
         round(ln(n.n_docs) + ln(pair_df) - ln(da.df) - ln(db.df), {ROUND})
           AS pmi
  FROM pairs
  JOIN tdf da ON da.term = term_a
  JOIN tdf db ON db.term = term_b
  CROSS JOIN n
)"""


def sql_term_expansion() -> str:
    return f"""
WITH {_cooc_cte()}
SELECT CASE WHEN term_a = '{EXPAND_SEED}' THEN term_b ELSE term_a END AS term,
       pmi, pair_df
FROM cooc WHERE term_a = '{EXPAND_SEED}' OR term_b = '{EXPAND_SEED}'
ORDER BY pmi DESC, pair_df DESC, term ASC LIMIT 5
"""


def q_search_expanded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-boosted search: seed term + its top-3 PMI neighbors,
    disjunctive, with per-doc matched-term counts."""
    from text_indexer_spark.operators.cooccur import (
        search_expanded,
        term_cooccurrence,
    )
    from text_indexer_spark.driver_queries import doc_postings

    docs = load_table(spark, sf_dir, "documents")
    cooc = term_cooccurrence(docs, min_pair_df=5, min_term_df=2)
    return search_expanded(doc_postings(spark, sf_dir), cooc, EXPAND_SEED, k_expand=3)


def sql_search_expanded() -> str:
    t = _tokens_sql()
    return f"""
WITH {_cooc_cte()},
exp AS (
  SELECT CASE WHEN term_a = '{EXPAND_SEED}' THEN term_b ELSE term_a END AS term,
         pmi, pair_df
  FROM cooc WHERE term_a = '{EXPAND_SEED}' OR term_b = '{EXPAND_SEED}'
  ORDER BY pmi DESC, pair_df DESC, term ASC LIMIT 3
),
q AS (SELECT term FROM exp UNION SELECT '{EXPAND_SEED}'),
hits AS (
  SELECT DISTINCT doc_id, term FROM
  (SELECT doc_id, unnest({t}) AS term FROM documents)
  WHERE term IN (SELECT term FROM q)
)
SELECT doc_id, count(*)::BIGINT AS n_terms FROM hits GROUP BY doc_id
"""


CHUNK_TOKENS = 64


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (≤64 tokens per chunk) — the pretraining
    preprocessing step; row-local, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.chunk_documents(docs, max_tokens=CHUNK_TOKENS)


def sql_doc_chunks() -> str:
    t = _tokens_sql()
    N = CHUNK_TOKENS
    return f"""
WITH tk AS (SELECT doc_id, {t} AS toks FROM documents),
c AS (
  SELECT doc_id, len(toks) AS n, toks,
         unnest(range(0, greatest(1, ceil(len(toks) / {N}.0)::INT))) AS chunk_idx
  FROM tk
)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
       least({N}, n - chunk_idx * {N})::BIGINT AS n_tokens,
       array_to_string(list_slice(toks, chunk_idx * {N} + 1, chunk_idx * {N} + {N}), ' ') AS chunk_text
FROM c
"""


def q_packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing of chunks into training sequences. The
    greedy fold is sequential PER BUCKET, but buckets are small and
    independent — the oracle replays the identical fold as a DuckDB
    recursive CTE stepping one row per bucket per iteration (the md5
    bucket hash is the engine-portable sampling-family recipe), so the
    full (bucket, seq_idx) assignment is hash-compared, not just row
    counts."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = textstats.chunk_documents(docs, max_tokens=CHUNK_TOKENS)
    return textstats.pack_chunks(chunks, budget=256, buckets=16)


def sql_packed_chunks(budget: int = 256, buckets: int = 16) -> str:
    t = _tokens_sql()
    N = CHUNK_TOKENS
    return f"""
WITH RECURSIVE tk AS (SELECT doc_id, {t} AS toks FROM documents),
c AS (
  SELECT doc_id, len(toks) AS n,
         unnest(range(0, greatest(1, ceil(len(toks) / {N}.0)::INT))) AS chunk_idx
  FROM tk
),
ch AS (
  SELECT (('0x' || substr(md5(doc_id::VARCHAR || '|pack'), 1, 8))::BIGINT
          % {buckets})::INT AS bucket,
         doc_id, chunk_idx::INT AS chunk_idx,
         least({N}, n - chunk_idx * {N})::BIGINT AS n_tokens
  FROM c
),
base AS (
  SELECT bucket, doc_id, chunk_idx, n_tokens,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id, chunk_idx)
           AS rn
  FROM ch
),
packed AS (
  SELECT bucket, doc_id, chunk_idx, n_tokens, rn,
         0::BIGINT AS seq_idx, n_tokens AS acc
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.bucket, b.doc_id, b.chunk_idx, b.n_tokens, b.rn,
         CASE WHEN p.acc + b.n_tokens > {budget}
              THEN p.seq_idx + 1 ELSE p.seq_idx END,
         CASE WHEN p.acc + b.n_tokens > {budget}
              THEN b.n_tokens ELSE p.acc + b.n_tokens END
  FROM packed p JOIN base b ON b.bucket = p.bucket AND b.rn = p.rn + 1
)
SELECT bucket, seq_idx, doc_id, chunk_idx, n_tokens FROM packed
"""


# ---------------------------------------------------------------- sampling
_U_SQL = "(('0x' || substr(md5(doc_id::VARCHAR || '|{salt}'), 1, 8))::BIGINT / 4294967296.0)"


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 30 % corpus sample (content-stable hash, no RNG —
    identical on any cluster size / rerun)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, 0.3, salt="s1").select("doc_id")


def sql_hash_sample() -> str:
    u = _U_SQL.format(salt="s1")
    return f"SELECT doc_id FROM documents WHERE {u} < 0.3"


STRATA = {"en": 0.15, "de": 0.9}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep fractions (rebalancing, the training-mix use
    case); unlisted langs keep 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_hash_sample(
        docs, STRATA, stratum_col="lang", salt="s1", default_fraction=0.5
    ).select("doc_id", "lang")


def sql_stratified_sample() -> str:
    u = _U_SQL.format(salt="s1")
    return f"""
SELECT doc_id, lang FROM documents
WHERE {u} < (CASE lang WHEN 'en' THEN 0.15 WHEN 'de' THEN 0.9 ELSE 0.5 END)
"""


SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint train/val/test labels from one hash draw — rows never
    migrate between splits across reruns or weight appends."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_split(docs, SPLITS, salt="split1").select("doc_id", "split")


def sql_hash_split() -> str:
    u = _U_SQL.format(salt="split1")
    return f"""
SELECT doc_id,
       CASE WHEN {u} < 0.8 THEN 'train'
            WHEN {u} < 0.9 THEN 'val'
            WHEN {u} < 1.0 THEN 'test' END AS split
FROM documents
"""


# ---------------------------------------------------------------- WAND path
def q_wand_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 served from the COMPRESSED persisted index (build →
    encode → block-skip WAND) — checked against the identical SQL oracle
    as the uncompressed scorer. This gates the whole storage+query
    pipeline, not just the math."""
    from text_indexer_spark.driver_queries import BM25_TERMS
    from text_indexer_spark.operators.index_build import build_index, load_posting_lists
    from text_indexer_spark.operators.wand import wand_topk
    from text_indexer_spark.sources.tables import documents_as_corpus

    idx = _ensure_wand_index(spark, sf_dir)
    lists = load_posting_lists(spark, idx)
    # tie-inclusive per-shard candidates; the GLOBAL cut happens after
    # re-mapping engine ids to the table's doc_id so the tie-break
    # (score desc, table doc_id asc) matches the oracle exactly
    cands = wand_topk(lists, BM25_TERMS, k=10, round_to=ROUND, global_topk=False)
    from text_indexer_spark.operators.index_build import load_catalog

    cat = load_catalog(spark, _WAND_INDEX_CACHE[sf_dir]).select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_extract("path", r"doc_(\d+)\.txt", 1).cast("long").alias("doc_id"),
    )
    return (
        cands.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(cat), "engine_id")
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_wand_bm25_topk_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive (classic WAND) variant of the compressed query path:
    any-term match, summed BM25 — gated against the same SQL scorer with
    the conjunctive guard dropped."""
    from text_indexer_spark.driver_queries import BM25_TERMS
    from text_indexer_spark.operators.index_build import load_catalog, load_posting_lists
    from text_indexer_spark.operators.wand import wand_topk

    if sf_dir not in _WAND_INDEX_CACHE:
        q_wand_bm25_topk(spark, sf_dir).collect()
    lists = load_posting_lists(spark, _WAND_INDEX_CACHE[sf_dir])
    cands = wand_topk(
        lists, BM25_TERMS, k=10, round_to=ROUND, global_topk=False, conjunctive=False
    )
    cat = load_catalog(spark, _WAND_INDEX_CACHE[sf_dir]).select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_extract("path", r"doc_(\d+)\.txt", 1).cast("long").alias("doc_id"),
    )
    return (
        cands.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(cat), "engine_id")
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def _engine_id_map(spark: SparkSession, index_dir: str) -> DataFrame:
    from text_indexer_spark.operators.index_build import load_catalog

    return load_catalog(spark, index_dir).select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_extract("path", r"doc_(\d+)\.txt", 1).cast("long").alias("doc_id"),
    )


def _decode_lists(lists: DataFrame, merged: bool = False) -> DataFrame:
    """Compressed lists → exploded (engine_id, term, tf) via the codec's
    full-decode path (delta-gap + varbyte round trip). Merged term-major
    rows need the chunk-aware decoder (spliced lists have short blocks
    at chunk boundaries)."""
    import pandas as pd

    def dec(batches):
        from text_indexer_spark.operators.codec import decode_posting_list
        from text_indexer_spark.operators.merge import decode_merged

        decode = decode_merged if merged else decode_posting_list
        for b in batches:
            for r in b.to_dict("records"):
                ids, tfs, _ = decode(r)
                yield pd.DataFrame(
                    {"engine_id": ids, "term": r["term"], "tf": tfs}
                )

    return lists.mapInPandas(dec, "engine_id long, term string, tf long")


def _ensure_wand_index(spark: SparkSession, sf_dir: str) -> str:
    from text_indexer_spark.operators.index_build import build_index
    from text_indexer_spark.sources.tables import documents_as_corpus

    if sf_dir not in _WAND_INDEX_CACHE:
        idx = tempfile.mkdtemp(prefix="driver_wand_idx_")
        corpus = documents_as_corpus(spark, sf_dir)
        build_index(corpus, idx, num_shards=8, verify_sha=False, resume=False)
        _WAND_INDEX_CACHE[sf_dir] = idx
    return _WAND_INDEX_CACHE[sf_dir]


def _ensure_pos_index(spark: SparkSession, sf_dir: str) -> str:
    """Like :func:`_ensure_wand_index` but built with
    ``with_positions=True`` — the positional payload enables phrase /
    proximity serving straight from the committed compressed index."""
    from text_indexer_spark.operators.index_build import build_index
    from text_indexer_spark.sources.tables import documents_as_corpus

    if sf_dir not in _POS_INDEX_CACHE:
        idx = tempfile.mkdtemp(prefix="driver_pos_idx_")
        corpus = documents_as_corpus(spark, sf_dir)
        build_index(
            corpus, idx, num_shards=8, verify_sha=False, resume=False,
            with_positions=True,
        )
        _POS_INDEX_CACHE[sf_dir] = idx
    return _POS_INDEX_CACHE[sf_dir]


def q_phrase_match_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase match served from the POSITIONAL committed index (no
    corpus re-scan) — same oracle as the corpus-level ``phrase_match``,
    so the gate proves the positional payload survives encode → shard →
    decode byte-exactly."""
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.phrase import phrase_match_index

    idx = _ensure_pos_index(spark, sf_dir)
    m = phrase_match_index(load_posting_lists(spark, idx), PHRASE)
    return (
        m.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id")
    )


def q_proximity_match_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/w served from the positional committed index — same oracle
    as the corpus-level ``proximity_match``."""
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.phrase import proximity_match_index

    idx = _ensure_pos_index(spark, sf_dir)
    m = proximity_match_index(
        load_posting_lists(spark, idx), PROX_TERMS, window=PROX_W
    )
    return (
        m.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("doc_id")
    )


def q_decoded_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full positional-payload round trip: build(with_positions) →
    per-posting delta-varbyte → decode must reproduce the exact
    (term, doc_id, pos) occurrence relation the tokenizer defines."""
    import numpy as np
    import pandas as pd

    from text_indexer_spark.operators.index_build import load_posting_lists

    idx = _ensure_pos_index(spark, sf_dir)
    lists = load_posting_lists(spark, idx)

    def dec(batches):
        from text_indexer_spark.operators.codec import decode_posting_positions

        for pdf in batches:
            for _, r in pdf.iterrows():
                ids, pos, offs = decode_posting_positions(r)
                if ids.size == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "engine_id": np.repeat(ids, np.diff(offs)),
                        "term": r["term"],
                        "pos": pos,
                    }
                )

    decoded = lists.mapInPandas(dec, "engine_id long, term string, pos long")
    return (
        decoded.join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("term", "doc_id", "pos")
    )


def sql_decoded_positions() -> str:
    return f"WITH {_pp_cte()} SELECT term, doc_id, pos FROM pp"


def q_decoded_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip gate for the WHOLE storage pipeline: build → encode
    (delta-gap + varbyte + block-max) → decode must reproduce the exact
    (doc, term, tf) relation the tokenizer defines — checked against the
    same SQL oracle as the uncompressed ``tokenize_postings``."""
    from text_indexer_spark.operators.index_build import load_posting_lists

    idx = _ensure_wand_index(spark, sf_dir)
    decoded = _decode_lists(load_posting_lists(spark, idx))
    return (
        decoded.join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("term", "doc_id", "tf")
    )


def q_merged_decoded_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate for the salted term-major merge: splicing the per-shard
    compressed chunks (no re-encode) must yield globally sorted lists
    that decode to the identical (doc, term, tf) relation."""
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.merge import merge_term_major

    idx = _ensure_wand_index(spark, sf_dir)
    merged = merge_term_major(load_posting_lists(spark, idx))
    decoded = _decode_lists(merged, merged=True)
    return (
        decoded.join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("term", "doc_id", "tf")
    )


def _corpus_snapshot2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``driver_queries._snapshot2`` (the deterministic delete/modify/add
    mix, SNAPSHOT2_SQL ground truth) mapped onto the corpus input shape —
    drives the COMMITTED-index sync + optimize gates."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    modified = kept.withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(10)) == 1,
            F.concat(F.col("text"), F.lit(" modified snapshot marker")),
        ).otherwise(F.col("text")),
    ).select("doc_id", "text", "source", "lang")
    added = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 2).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("added doc body "), F.col("text")).alias("text"),
        "source",
        "lang",
    )
    snap2 = modified.unionByName(added)
    return snap2.select(
        F.col("source").alias("repo"),
        F.concat(
            F.lit("docs/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
        F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _ensure_opt_index(spark: SparkSession, sf_dir: str) -> str:
    """v1 (the cached WAND index) → incremental sync to snapshot 2 →
    ``optimize_index``: the full committed-index lifecycle in one gate
    input."""
    if sf_dir not in _OPT_INDEX_CACHE:
        from text_indexer_spark.operators.index_optimize import optimize_index
        from text_indexer_spark.operators.index_sync import sync_index_dir

        v1 = _ensure_wand_index(spark, sf_dir)
        synced = tempfile.mkdtemp(prefix="driver_sync_idx_")
        sync_index_dir(spark, v1, _corpus_snapshot2(spark, sf_dir), synced)
        opt = tempfile.mkdtemp(prefix="driver_opt_idx_")
        optimize_index(spark, synced, opt)
        _OPT_INDEX_CACHE[sf_dir] = opt
    return _OPT_INDEX_CACHE[sf_dir]


def q_optimized_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle gate: build → incremental sync → OPTIMIZE (compaction
    back to the build's id layout, ``operators/index_optimize.py``) →
    decode must reproduce the exact (term, doc, tf) relation of snapshot
    2 — the same ground truth the DataFrame-level sync gate uses."""
    from text_indexer_spark.operators.index_build import load_posting_lists

    idx = _ensure_opt_index(spark, sf_dir)
    decoded = _decode_lists(load_posting_lists(spark, idx))
    return (
        decoded.join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("term", "doc_id", "tf")
    )


def sql_optimized_postings() -> str:
    # ground truth: tokenize snapshot 2 directly — identical oracle to
    # the DataFrame-level sync gate (the committed path must agree)
    from text_indexer_spark.driver_queries import sql_sync_apply_postings

    return sql_sync_apply_postings()


def q_trigram_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram content index over ``documents`` (the public
    code-search design: Cox's trigram index / Zoekt) — one codegen'd
    scan, no Python workers, no shuffle."""
    from text_indexer_spark.operators.trigram import trigram_postings

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return trigram_postings(docs)


def sql_trigram_postings() -> str:
    return (
        "SELECT doc_id, unnest(list_distinct(list_transform("
        "range(1, greatest(length(text) - 1, 1)), "
        "i -> substr(lower(text), i, 3)))) AS gram FROM documents"
    )


def q_regex_grep_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-accelerated regex grep: required trigrams prune candidates,
    the true regex verifies only the semi-joined sliver — must equal the
    full-scan relation exactly (``operators/trigram.py``)."""
    from text_indexer_spark.operators.trigram import grep_trigram, trigram_postings

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return grep_trigram(docs, trigram_postings(docs), TRIGRAM_REGEX)


def sql_regex_grep_trigram() -> str:
    return (
        f"SELECT doc_id, length(regexp_extract_all(text, '{TRIGRAM_REGEX}'))::INT "
        "AS n_matches FROM documents "
        f"WHERE length(regexp_extract_all(text, '{TRIGRAM_REGEX}')) > 0"
    )


def q_regex_grep_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The id-PUSHDOWN probe form of the trigram grep: candidate ids
    are collected (bounded) and pushed as an IN-list into the corpus
    scan — row-group pruning reads candidate blocks only, the
    Zoekt/Code Search access shape (``trigram.grep_trigram_pushdown``).
    Must equal the full-scan relation exactly; same oracle as the
    join-form gate."""
    from text_indexer_spark.operators.trigram import (
        grep_trigram_pushdown,
        trigram_postings,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return grep_trigram_pushdown(docs, trigram_postings(docs), TRIGRAM_REGEX)


def sql_regex_grep_pushdown() -> str:
    return sql_regex_grep_trigram()


#: mixed batch: two trigram-indexed patterns + one with no usable
#: literal (shares the single fallback scan pass) — the amortization
#: shape the round-4 crossover bench motivated
GREP_BATCH = ["quer[a-z]+", "stream", "s[a-z]+m"]


def q_regex_grep_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pattern grep: ONE gram-index probe + ONE verify pass for
    the indexed patterns, one shared full-scan pass for literal-free
    ones (``trigram.grep_trigram_batch``) — must equal the per-pattern
    union exactly."""
    from text_indexer_spark.operators.trigram import (
        grep_trigram_batch,
        trigram_postings,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return grep_trigram_batch(docs, trigram_postings(docs), GREP_BATCH)


def sql_regex_grep_batch() -> str:
    return " UNION ALL ".join(
        f"SELECT '{p}' AS pattern, doc_id, "
        f"length(regexp_extract_all(text, '{p}'))::INT AS n_matches "
        f"FROM documents WHERE length(regexp_extract_all(text, '{p}')) > 0"
        for p in GREP_BATCH
    )


_TRI_SYNC_CACHE: dict[str, str] = {}


def q_trigram_sync_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle gate for the COMMITTED trigram index (LSM segments +
    tombstones, ``operators/trigram.py``): initial ingest → one sync
    (adds + removes) → one reindex sync (re-add with reversed text),
    then the live merged view — must equal the trigram relation over the
    surviving doc set computed relationally by the oracle."""
    from text_indexer_spark.operators.trigram import (
        read_committed_trigrams,
        trigram_commit,
    )

    from text_indexer_spark.unicode_fixture import docs_with_fixture

    if sf_dir not in _TRI_SYNC_CACHE:
        docs = docs_with_fixture(
            load_table(spark, sf_dir, "documents")
        ).select("doc_id", "text")
        d = tempfile.mkdtemp(prefix="driver_tri_sync_")
        trigram_commit(docs.filter(F.col("doc_id") % 5 != 0), d)
        trigram_commit(
            docs.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 2 == 0)),
            d,
            removed_ids=docs.filter(F.col("doc_id") % 3 == 0).select("doc_id"),
        )
        trigram_commit(
            docs.filter(F.col("doc_id") % 15 == 0).select(
                "doc_id", F.reverse(F.col("text")).alias("text")
            ),
            d,
            removed_ids=docs.filter(F.col("doc_id") % 15 == 0).select("doc_id"),
        )
        _TRI_SYNC_CACHE[sf_dir] = d
    return read_committed_trigrams(spark, _TRI_SYNC_CACHE[sf_dir])


def sql_trigram_sync_postings() -> str:
    grams = (
        "unnest(list_distinct(list_transform("
        "range(1, greatest(length(text) - 1, 1)), "
        "i -> substr(lower(text), i, 3)))) AS gram"
    )
    # survivors of the three commits, derived relationally:
    #   seg1 (id%5!=0)          minus ts2 (id%3==0)   [ts3 can't hit seg1]
    #   seg2 (id%10==0)         minus ts3 (id%15==0)
    #   seg3 (id%15==0, reversed text) — no later tombstone
    return (
        "WITH live AS ("
        "SELECT doc_id, text FROM documents "
        "WHERE doc_id % 5 <> 0 AND doc_id % 3 <> 0 "
        "UNION ALL "
        "SELECT doc_id, text FROM documents "
        "WHERE doc_id % 10 = 0 AND doc_id % 15 <> 0 "
        "UNION ALL "
        "SELECT doc_id, reverse(text) AS text FROM documents "
        "WHERE doc_id % 15 = 0) "
        f"SELECT doc_id, {grams} FROM live"
    )


def _kotlin_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents rendered as Kotlin-shaped source derived from each
    doc's tokens INSIDE the query (both engines compute it from the same
    table): ``fun <t1>_<t2>() {}\\nclass <T3> { val <t4> = 1 }``; docs
    with fewer than 4 tokens are dropped on both sides."""
    from text_indexer_spark.tokenizer import tokenize_column

    toks = tokenize_column(F.col("text"))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 4)
    )
    cap3 = F.concat(
        F.upper(F.substring(F.element_at("toks", 3), 1, 1)),
        F.substring(F.element_at("toks", 3), 2, 2147483647),
    )
    code = F.concat(
        F.lit("fun "), F.element_at("toks", 1), F.lit("_"),
        F.element_at("toks", 2), F.lit("() {}\nclass "), cap3,
        F.lit(" { val "), F.element_at("toks", 4), F.lit(" = 1 }"),
    )
    return docs.select(
        "doc_id", code.alias("text"), F.lit("kotlin").alias("lang")
    )


def _sql_kotlin_docs_cte() -> str:
    from text_indexer_spark.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    return (
        f"toked AS (SELECT doc_id, {toks} AS toks FROM documents), "
        "kot AS (SELECT doc_id, 'fun ' || toks[1] || '_' || toks[2] || "
        "'() {}' || chr(10) || 'class ' || upper(toks[3][1:1]) || "
        "toks[3][2:] || ' { val ' || toks[4] || ' = 1 }' AS text "
        "FROM toked WHERE len(toks) >= 4)"
    )


#: one regexp_extract_all+unnest per kotlin declaration kind, unioned —
#: must stay in lockstep with symbols.SYMBOL_PATTERNS['kotlin']
_SQL_KOTLIN_SYMS = (
    "syms AS ("
    "SELECT doc_id, 'function' AS kind, "
    "unnest(regexp_extract_all(text, '\\bfun\\s+([A-Za-z_][A-Za-z0-9_]*)', 1)) AS symbol FROM kot "
    "UNION ALL SELECT doc_id, 'class', "
    "unnest(regexp_extract_all(text, '\\bclass\\s+([A-Za-z_][A-Za-z0-9_]*)', 1)) FROM kot "
    "UNION ALL SELECT doc_id, 'value', "
    "unnest(regexp_extract_all(text, '\\bval\\s+([A-Za-z_][A-Za-z0-9_]*)', 1)) FROM kot)"
)


def q_symbol_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ctags-lite definition index (``operators/symbols.py``): per-lang
    declaration regexes in one codegen scan → (symbol, kind, doc_id,
    n_defs) postings."""
    from text_indexer_spark.operators.symbols import symbol_postings

    return symbol_postings(_kotlin_docs(spark, sf_dir))


def sql_symbol_postings() -> str:
    return (
        f"WITH {_sql_kotlin_docs_cte()}, {_SQL_KOTLIN_SYMS} "
        "SELECT symbol, kind, doc_id, count(*)::BIGINT AS n_defs "
        "FROM syms GROUP BY 1, 2, 3"
    )


def q_search_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Definition lookup: docs declaring ``class Query`` (the 'query'
    token capitalized by the derivation) with definition counts."""
    from text_indexer_spark.operators.symbols import search_symbol

    return search_symbol(_kotlin_docs(spark, sf_dir), "Query", kind="class")


def sql_search_symbol() -> str:
    return (
        f"WITH {_sql_kotlin_docs_cte()}, {_SQL_KOTLIN_SYMS} "
        "SELECT doc_id, kind, count(*)::BIGINT AS n_defs FROM syms "
        "WHERE symbol = 'Query' AND kind = 'class' "
        "GROUP BY doc_id, kind ORDER BY doc_id, kind"
    )


def q_grep_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grep -n over the corpus (``highlight.grep_lines``): per-LINE
    matches with 1-based line numbers. The testdata text is single-line,
    so the gate derives a multi-line rendering inside the query (every
    token on its own line — both engines compute it from the same
    table), then greps it."""
    from text_indexer_spark.operators.highlight import grep_lines

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.translate(F.col("text"), " ", "\n").alias("text")
    )
    return grep_lines(docs, "qu[a-z]+").orderBy("doc_id", "line_no")


def sql_grep_lines() -> str:
    return (
        "WITH lined AS (SELECT doc_id, replace(text, ' ', chr(10)) AS text "
        "FROM documents), ex AS (SELECT doc_id, "
        "unnest(string_split(text, chr(10))) AS line, "
        "unnest(range(1, len(string_split(text, chr(10))) + 1)) AS line_no "
        "FROM lined) "
        "SELECT doc_id, line_no::INT AS line_no, line FROM ex "
        "WHERE regexp_matches(line, 'qu[a-z]+') ORDER BY doc_id, line_no"
    )


#: substring probe CROSSING a token boundary — the lookup the inverted
#: token index cannot serve at all ("vector str..." tail+head chars)
SUBSTRING_NEEDLE = "ctor str"


def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring match served from the trigram index
    (``substring_search``): conjunctive gram candidates, ``contains``
    verification above the join — must equal the naive LIKE relation."""
    from text_indexer_spark.operators.trigram import (
        substring_search,
        trigram_postings,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return substring_search(
        docs, trigram_postings(docs), SUBSTRING_NEEDLE
    ).orderBy("doc_id")


def sql_substring_search() -> str:
    return (
        "SELECT doc_id FROM documents "
        f"WHERE contains(lower(text), '{SUBSTRING_NEEDLE}') ORDER BY doc_id"
    )


#: identifier-shaped probe for the code-search gates: camelCase +
#: snake_case + an acronym run, tokenizing to ["table", "hash", "scan"]
CODE_IDENT_QUERY = "TableHash_scan"


def _camel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a deterministic identifier-shaped rendering of each
    doc's token stream (camelCase-join) — derives code-like text from the
    flat testdata vocabulary INSIDE the query, so the Spark gate and the
    DuckDB oracle both compute it from the same table."""
    from text_indexer_spark.operators.codetok import camelcase_column
    from text_indexer_spark.tokenizer import tokenize_column

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id", camelcase_column(tokenize_column(F.col("text"))).alias("ident")
    )


def _sql_camel_docs_cte() -> str:
    from text_indexer_spark.operators.codetok import duckdb_camelcase_sql
    from text_indexer_spark.tokenizer import duckdb_tokens_sql

    camel = duckdb_camelcase_sql(duckdb_tokens_sql("text"))
    return f"camel AS (SELECT doc_id, {camel} AS ident FROM documents)"


def q_code_ident_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-identifier tokenization (camelCase / snake_case / acronym
    runs, ``operators/codetok.py``): (doc_id, term, tf) postings under
    the identifier splitter — same shape as the default build's postings
    so sharding/encode/WAND consume it unchanged."""
    from text_indexer_spark.operators.codetok import ident_postings

    return ident_postings(_camel_docs(spark, sf_dir), text_col="ident")


def sql_code_ident_postings() -> str:
    from text_indexer_spark.operators.codetok import duckdb_ident_tokens_sql

    return (
        f"WITH {_sql_camel_docs_cte()}, toks AS ("
        f"SELECT doc_id, unnest({duckdb_ident_tokens_sql('ident')}) AS term "
        "FROM camel) "
        "SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2"
    )


def q_search_code_ident(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive search where BOTH sides sub-tokenize identifiers: the
    query ``TableHash_scan`` splits to [table, hash, scan] and matches
    documents whose identifier postings contain all three — the lookup a
    whitespace index cannot serve."""
    from text_indexer_spark.operators.codetok import (
        ident_postings,
        split_identifiers_text,
    )

    terms = split_identifiers_text(CODE_IDENT_QUERY)
    posts = ident_postings(_camel_docs(spark, sf_dir), text_col="ident")
    return (
        posts.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("_n"))
        .filter(F.col("_n") == len(terms))
        .select("doc_id")
        .orderBy("doc_id")
    )


def sql_search_code_ident() -> str:
    from text_indexer_spark.operators.codetok import (
        duckdb_ident_tokens_sql,
        split_identifiers_text,
    )

    terms = split_identifiers_text(CODE_IDENT_QUERY)
    in_list = ", ".join(f"'{t}'" for t in terms)
    return (
        f"WITH {_sql_camel_docs_cte()}, toks AS ("
        f"SELECT doc_id, unnest({duckdb_ident_tokens_sql('ident')}) AS term "
        "FROM camel) "
        f"SELECT doc_id FROM toks WHERE term IN ({in_list}) "
        f"GROUP BY doc_id HAVING count(DISTINCT term) = {len(terms)} "
        "ORDER BY doc_id"
    )


def sql_wand_bm25_topk() -> str:
    from text_indexer_spark.driver_queries import sql_bm25_topk

    return sql_bm25_topk()


def q_search_results_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SERVING composition a search frontend issues as one
    query: block-max WAND top-10 from the compressed index → broadcast
    id→metadata join → snippet extraction over ONLY the top-k docs (the
    semi-join keeps the scan tier to k rows — the shape highlight.py
    prescribes for result pages)."""
    from text_indexer_spark.driver_queries import BM25_TERMS, SNIPPET_WINDOW
    from text_indexer_spark.operators.highlight import snippets

    topk = q_wand_bm25_topk(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    hits = docs.join(F.broadcast(topk.select("doc_id")), "doc_id", "left_semi")
    snips = snippets(hits, BM25_TERMS, window=SNIPPET_WINDOW)
    return (
        topk.join(F.broadcast(docs.select("doc_id", "source", "lang")), "doc_id")
        .join(F.broadcast(snips), "doc_id")
        .select("doc_id", "score", "source", "lang", "first_pos", "snippet")
    )


def sql_search_results_page() -> str:
    from text_indexer_spark.driver_queries import (
        sql_bm25_topk,
        sql_search_snippets,
    )

    return f"""
WITH topk AS ({sql_bm25_topk()}),
snips AS ({sql_search_snippets()})
SELECT topk.doc_id, topk.score, d.source, d.lang, snips.first_pos, snips.snippet
FROM topk
JOIN documents d USING (doc_id)
JOIN snips USING (doc_id)
"""


BATCH_QUERIES = {
    "q_join": ["join"],
    "q_the_data": ["the", "data"],
    "q_mvs": ["merge", "vector", "stream"],
}


def q_wand_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched serving path: all queries answered in ONE Spark job over
    the compressed index (per-job overhead amortized across the batch).
    Oracle = UNION ALL of the per-query BM25 SQL."""
    from pyspark.sql import Window

    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.wand import wand_topk_batch

    idx = _ensure_wand_index(spark, sf_dir)
    lists = load_posting_lists(spark, idx)
    cands = wand_topk_batch(
        lists, BATCH_QUERIES, k=10, round_to=ROUND, global_topk=False
    )
    remapped = (
        cands.withColumnRenamed("doc_id", "engine_id")
        .join(F.broadcast(_engine_id_map(spark, idx)), "engine_id")
        .select("query_id", "doc_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        remapped.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


def sql_wand_batch_topk() -> str:
    from text_indexer_spark.driver_queries import sql_bm25_topk

    parts = [
        f"SELECT '{qid}' AS query_id, * FROM ({sql_bm25_topk(terms=terms)})"
        for qid, terms in BATCH_QUERIES.items()
    ]
    return " UNION ALL ".join(parts)


def _sql_postings_oracle() -> str:
    from text_indexer_spark.driver_queries import sql_postings

    return sql_postings()


# ---------------------------------------------------------------- registry
def queries():
    return {
        "registry_listing": q_registry_listing,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_sigs": q_dedup_minhash,
        "dedup_lsh_pairs": q_dedup_lsh_pairs,
        "dedup_ngram_jaccard": q_dedup_jaccard,
        "hot_shingles": q_hot_shingles,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_kept_corpus": q_dedup_kept_corpus,
        "neardup_cosine": q_neardup_cosine,
        "neardup_cosine_lsh": q_neardup_cosine_lsh,
        "neardup_clusters_cosine": q_neardup_clusters_cosine,
        "semdedup_kept": q_semdedup_kept,
        "ann_cosine_topk": q_ann_topk,
        "ann_int8_topk": q_ann_int8,
        "ann_ivf_int8_full_probe": q_ann_ivf_int8,
        "ann_ivf_full_probe": q_ann_ivf_full,
        "ann_ivf_indexed_full_probe": q_ann_ivf_indexed,
        "ann_ivf_upsert_topk": q_ann_ivf_upsert,
        "lang_id": q_lang_id,
        "lang_id_nb": q_lang_id_nb,
        "quality_scores": q_quality,
        "quality_kept_corpus": q_quality_kept,
        "token_counts": q_token_counts,
        "vocab_encode": q_vocab_encode,
        "bpe_vocab": q_bpe_vocab,
        "bpe_encode": q_bpe_encode,
        "doc_fingerprints": q_fingerprints,
        "doc_chunks": q_doc_chunks,
        "packed_chunks": q_packed_chunks,
        "term_cooccurrence": q_term_cooccurrence,
        "term_expansion": q_term_expansion,
        "search_expanded": q_search_expanded,
        "phrase_match": q_phrase_match,
        "proximity_match": q_proximity_match,
        "phrase_match_index": q_phrase_match_index,
        "proximity_match_index": q_proximity_match_index,
        "decoded_positions": q_decoded_positions,
        "sample_hash": q_hash_sample,
        "sample_stratified": q_stratified_sample,
        "split_hash": q_hash_split,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_frames": q_multimodal_frames,
        "wand_bm25_topk": q_wand_bm25_topk,
        "search_results_page": q_search_results_page,
        "wand_bm25_topk_or": q_wand_bm25_topk_or,
        "decoded_postings": q_decoded_postings,
        "wand_bm25_batch": q_wand_batch_topk,
        "merged_decoded_postings": q_merged_decoded_postings,
        "optimized_postings": q_optimized_postings,
        "trigram_postings": q_trigram_postings,
        "regex_grep_trigram": q_regex_grep_trigram,
        "regex_grep_pushdown": q_regex_grep_pushdown,
        "regex_grep_batch": q_regex_grep_batch,
        "code_ident_postings": q_code_ident_postings,
        "search_code_ident": q_search_code_ident,
        "trigram_sync_postings": q_trigram_sync_postings,
        "substring_search": q_substring_search,
        "grep_lines": q_grep_lines,
        "symbol_postings": q_symbol_postings,
        "search_symbol": q_search_symbol,
    }


def oracle_sql():
    return {
        "registry_listing": sql_registry_listing(),
        "dedup_exact": sql_dedup_exact(),
        "dedup_minhash_sigs": sql_dedup_minhash(),
        "dedup_lsh_pairs": sql_dedup_lsh_pairs(),
        "dedup_ngram_jaccard": sql_dedup_jaccard(),
        "hot_shingles": sql_hot_shingles(),
        "dedup_simhash": sql_dedup_simhash(),
        "dedup_simhash_pairs": sql_dedup_simhash_pairs(),
        "dedup_clusters": sql_dedup_clusters(),
        "dedup_kept_corpus": sql_dedup_kept_corpus(),
        "neardup_cosine": sql_neardup_cosine(),
        "neardup_cosine_lsh": sql_neardup_cosine(),
        "neardup_clusters_cosine": sql_neardup_clusters_cosine(),
        "semdedup_kept": sql_semdedup_kept(),
        "ann_cosine_topk": sql_ann_topk(),
        "ann_int8_topk": sql_ann_topk(),
        "ann_ivf_int8_full_probe": sql_ann_topk(),
        "ann_ivf_full_probe": sql_ann_topk(),
        "ann_ivf_indexed_full_probe": sql_ann_topk(),
        "ann_ivf_upsert_topk": sql_ann_upsert_topk(),
        "lang_id": _ufix(sql_lang_id()),
        "lang_id_nb": sql_lang_id_nb(),
        "quality_scores": _ufix(sql_quality()),
        "quality_kept_corpus": sql_quality_kept(),
        "token_counts": _ufix(sql_token_counts()),
        "vocab_encode": _ufix(sql_vocab_encode()),
        "bpe_vocab": sql_bpe_vocab(),
        "bpe_encode": sql_bpe_encode(),
        "doc_fingerprints": sql_fingerprints(),
        "doc_chunks": sql_doc_chunks(),
        "packed_chunks": sql_packed_chunks(),
        "term_cooccurrence": sql_term_cooccurrence(),
        "term_expansion": sql_term_expansion(),
        "search_expanded": sql_search_expanded(),
        "phrase_match": sql_phrase_match(),
        "proximity_match": sql_proximity_match(),
        "phrase_match_index": sql_phrase_match(),
        "proximity_match_index": sql_proximity_match(),
        "decoded_positions": sql_decoded_positions(),
        "sample_hash": sql_hash_sample(),
        "sample_stratified": sql_stratified_sample(),
        "split_hash": sql_hash_split(),
        "multimodal_meta": sql_multimodal_meta(),
        "multimodal_frames": sql_multimodal_frames(),
        "wand_bm25_topk": sql_wand_bm25_topk(),
        "search_results_page": sql_search_results_page(),
        "decoded_postings": _sql_postings_oracle(),
        "wand_bm25_batch": sql_wand_batch_topk(),
        "merged_decoded_postings": _sql_postings_oracle(),
        "wand_bm25_topk_or": __import__("text_indexer_spark.driver_queries", fromlist=["sql_bm25_topk"]).sql_bm25_topk(conjunctive=False),
        "optimized_postings": sql_optimized_postings(),
        "trigram_postings": sql_trigram_postings(),
        "regex_grep_trigram": sql_regex_grep_trigram(),
        "regex_grep_pushdown": sql_regex_grep_pushdown(),
        "regex_grep_batch": sql_regex_grep_batch(),
        "code_ident_postings": sql_code_ident_postings(),
        "search_code_ident": sql_search_code_ident(),
        "trigram_sync_postings": _ufix(sql_trigram_sync_postings()),
        "substring_search": sql_substring_search(),
        "grep_lines": sql_grep_lines(),
        "symbol_postings": sql_symbol_postings(),
        "search_symbol": sql_search_symbol(),
    }

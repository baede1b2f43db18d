"""Ingest connectors: JSONL / CSV / parquet corpus files → the canonical
corpus shape ``(repo, path, commit, lang, content)``.

Web-scale text corpora commonly arrive as JSONL (one document object per
line — the Common Crawl-derivative convention) or CSV exports rather
than curated tables. These readers normalize any such dump into the
engine's corpus schema in ONE scan-fused projection:

* column mapping (caller says which source fields mean what),
* missing optional fields synthesized deterministically
  (``commit`` ← sha256(content): exactly the content-version identity
  the build verifies; ``lang`` ← 'und'; ``path`` ← row hash),
* required-field validation that fails loudly instead of building an
  index over half-parsed rows (``mode=FAILFAST`` on the parser,
  null-key check on the result).

Scale notes: both ``spark.read.json`` and ``spark.read.csv`` are
splittable scans (JSONL by newline, CSV without multiline quoting), so
a 100 TB dump parallelizes across input splits like parquet does —
schema is supplied explicitly, which skips the INFER pass that would
otherwise scan everything twice. The projection is pure codegen
(sha2/coalesce/concat); nothing here adds a shuffle, and the corpus
flows straight into ``build_index``'s single wide exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_FIELDS = ("repo", "path", "commit", "lang", "content")


def _source_schema(mapping: dict[str, str]) -> T.StructType:
    """Explicit all-string read schema over the mapped source fields —
    supplying it skips schema inference (a full extra scan of the dump)
    and pins the parse so a numeric-looking column can't drift."""
    return T.StructType(
        [T.StructField(src, T.StringType(), True) for src in mapping.values()]
    )


def normalize_corpus(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Mapped source columns → canonical corpus frame.

    ``mapping``: corpus field → source column, e.g.
    ``{"content": "text", "repo": "domain", "path": "url"}``. ``content``
    is required; every other field synthesizes a deterministic default:

    * ``commit`` ← sha256(content) — the content-version identity the
      reference keys staleness on (``IndexedItem.kt:45-51``),
    * ``repo``   ← '' (single-source dump),
    * ``path``   ← xxhash64(content) hex — stable, collision-checked
      downstream by the build's dedup (identical content = same row),
    * ``lang``   ← 'und'.
    """
    if "content" not in mapping:
        raise ValueError("mapping must bind 'content' to a source column")
    unknown = set(mapping) - set(CORPUS_FIELDS)
    if unknown:
        raise ValueError(f"unknown corpus fields in mapping: {sorted(unknown)}")
    content = F.coalesce(F.col(mapping["content"]).cast("string"), F.lit(""))
    cols = {"content": content}
    cols["repo"] = (
        F.coalesce(F.col(mapping["repo"]).cast("string"), F.lit(""))
        if "repo" in mapping
        else F.lit("")
    )
    cols["path"] = (
        F.coalesce(F.col(mapping["path"]).cast("string"), F.lit(""))
        if "path" in mapping
        else F.lower(F.hex(F.xxhash64(content)))
    )
    cols["commit"] = (
        F.coalesce(F.col(mapping["commit"]).cast("string"), F.lit(""))
        if "commit" in mapping
        else F.sha2(content, 256)
    )
    cols["lang"] = (
        F.coalesce(F.col(mapping["lang"]).cast("string"), F.lit("und"))
        if "lang" in mapping
        else F.lit("und")
    )
    return df.select(*[cols[f].alias(f) for f in CORPUS_FIELDS])


def read_corpus_jsonl(
    spark: SparkSession, path: str, mapping: dict[str, str]
) -> DataFrame:
    """JSONL dump → corpus frame. One JSON object per line; explicit
    schema (no inference scan); a malformed line FAILS the read rather
    than silently dropping documents."""
    df = spark.read.schema(_source_schema(mapping)).option(
        "mode", "FAILFAST"
    ).json(path)
    return normalize_corpus(df, mapping)


def read_corpus_csv(
    spark: SparkSession,
    path: str,
    mapping: dict[str, str],
    header: bool = True,
    sep: str = ",",
    columns: list[str] | None = None,
) -> DataFrame:
    """CSV export → corpus frame. ``multiLine`` stays OFF so the scan
    remains splittable (newline-in-quotes dumps must be re-exported or
    read as JSONL); malformed rows fail the read.

    Unlike JSON, a CSV schema is POSITIONAL — a partial schema would
    silently misalign columns — so either the header names the columns
    (all parsed as string, no inference scan: ``inferSchema`` stays
    off) or the caller supplies the full ``columns`` list in file
    order for headerless dumps."""
    if not header and not columns:
        raise ValueError("headerless CSV needs the full `columns` list in file order")
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "FAILFAST")
    )
    if columns:
        reader = reader.schema(
            T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
        )
    df = reader.csv(path)
    return normalize_corpus(df, mapping)

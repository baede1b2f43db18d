"""Canonical StructTypes for every table the engine reads or writes.

The primary input is the ``corpus`` table with the shape mandated by the
baseline input hint: ``(repo, path, commit, lang, content)`` — one row
per source file (reference analogue: one ``Document`` per file,
``Document.kt:7``). Derived tables:

* ``catalog`` — the document registry (replaces the reference's path
  trie, ``IndexedDocuments.kt:9-21``): deterministic ``doc_id`` via
  ``row_number() over (order by repo, path, commit)``, ``content_sha256``
  per-row invariant, ``doc_len`` token count, nested/source-root dir
  bookkeeping (``IndexedItem.kt:13-22``).
* ``postings`` — the exploded inverted index ``(term, doc_id, tf)``
  (replaces ``Index.kt:8-9`` map-of-sets, extended with tf for BM25).
* ``posting_lists`` — per-term compressed lists: delta-gap + varbyte
  doc-id blocks with block-max metadata (engine addition; no reference
  analogue — the reference keeps raw in-memory sets).
"""

from __future__ import annotations

from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("doc_len", T.IntegerType(), False),
        T.StructField("is_nested", T.BooleanType(), False),
        T.StructField("source_root", T.StringType(), True),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
    ]
)

POSTING_LIST_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("doc_ids_delta_varbyte", T.BinaryType(), False),
        T.StructField("tfs_varbyte", T.BinaryType(), False),
        T.StructField(
            "block_max",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("last_doc_id", T.LongType(), False),
                        T.StructField("max_tf", T.LongType(), False),
                        T.StructField("max_score_ub", T.FloatType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

# Multimodal: opaque binary payload + typed metadata (decode is stubbed —
# no image/audio libs in this container; the Spark-side plumbing is real).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

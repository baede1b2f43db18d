"""text_indexer_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the capabilities of the reference full-text
indexer (vbutrim/text-indexer: tokenize documents, maintain an inverted
index, answer conjunctive multi-token queries, incrementally sync against
a changing corpus — see /root/reference), re-expressed Spark-first:

* the inverted index is a postings DataFrame (``term, doc_id, tf``),
  never a driver-side map (reference ``Index.kt:8-9`` keeps
  ``MutableMap<String, MutableSet<Int>>`` in memory);
* index mutation becomes snapshot-versioned anti-join + union merges
  (reference replace semantics ``Index.kt:15-23``);
* the path-trie document registry (``IndexedDocuments.kt:9-21``) becomes a
  ``catalog`` DataFrame queried with joins and path-prefix predicates;
* conjunctive AND search (``DocumentsIndexer.kt:58-67``) becomes a
  bucket-prunable postings scan + group-count semi-join, extended with
  BM25 top-k scoring and a block-max skipping path (mapInPandas);
* incremental sync (``IndexedFileManager.kt:83-143``) becomes a full
  outer join of catalog snapshots.

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no RDDs and
no per-row Python UDFs anywhere.
"""

from text_indexer_spark.tokenizer import TOKEN_DELIM_REGEX, tokenize_column

__all__ = ["TOKEN_DELIM_REGEX", "tokenize_column"]

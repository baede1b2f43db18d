from text_indexer_spark.sources.tables import (
    documents_as_corpus,
    load_table,
)

__all__ = ["load_table", "documents_as_corpus"]

from text_indexer_spark.functions.bm25 import K1, B, bm25_weight, idf_expr

__all__ = ["K1", "B", "bm25_weight", "idf_expr"]

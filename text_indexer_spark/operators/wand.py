"""Block-max conjunctive top-k over the compressed index.

The distributed analogue of the reference's search
(``DocumentsIndexer.kt:46-76``) on the persisted index:

1. driver tokenizes the query and broadcasts the terms (reference
   parses in the UI thread, ``IndexerUI.kt:183-189``);
2. one scan of ``posting_lists`` with ``term IN (...)`` — predicate
   pushdown prunes parquet row groups; only |Q| lists per shard survive;
3. per doc-range shard, an Arrow applyInPandas kernel intersects the
   lists doc-at-a-time — rarest list drives, other lists are probed via
   their block-max skip pointers so only candidate blocks are DECODED
   (``codec.decode_block_ids``); scores come from the stored exact
   weights, so ranks match the uncompressed DataFrame scorer;
4. per-shard local top-k, then a global
   ``orderBy(score desc, doc_id).limit(k)`` — TakeOrderedAndProject, no
   global sort shuffle.

Block-max early exit: within a shard, if the sum of all lists'
max-weight bounds cannot beat the running local threshold the shard
emits nothing — cheap insurance that matters when k is small and shards
are many.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shard_topk_kernel(terms: list[str], k: int):
    nq = len(set(terms))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
        if pdf["term"].nunique() < nq:
            return empty  # AND: a missing term kills the whole shard
        from text_indexer_spark.operators.codec import decode_block_ids

        rows = pdf.sort_values("df").to_dict("records")
        # shard-level upper bound: best possible score in this shard
        ub = sum(max(r["block_max_w"]) for r in rows)
        if ub <= 0.0:
            return empty

        # driver list = rarest term: decode fully
        r0 = rows[0]
        nblocks0 = len(r0["block_last_id"])
        cand, pos0 = decode_block_ids(r0, np.arange(nblocks0))
        weights0 = np.frombuffer(r0["weights_f64"], dtype=np.float64)
        scores = weights0[pos0]

        for r in rows[1:]:
            if cand.size == 0:
                return empty
            lastids = np.asarray(r["block_last_id"], dtype=np.int64)
            # which block could contain each candidate
            blk = np.searchsorted(lastids, cand, side="left")
            valid = blk < lastids.size
            cand, scores, blk = cand[valid], scores[valid], blk[valid]
            if cand.size == 0:
                return empty
            need = np.unique(blk)
            ids_sub, pos_sub = decode_block_ids(r, need)
            idx = np.searchsorted(ids_sub, cand)
            idx = np.minimum(idx, ids_sub.size - 1)
            found = ids_sub[idx] == cand
            cand, scores = cand[found], scores[found]
            if cand.size == 0:
                return empty
            w = np.frombuffer(r["weights_f64"], dtype=np.float64)
            scores = scores + w[pos_sub[idx[found]]]

        if cand.size > k:
            part = np.argpartition(-scores, k - 1)[:k]
            cand, scores = cand[part], scores[part]
        order = np.lexsort((cand, -scores))
        return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})

    return kernel


def wand_topk(
    posting_lists: DataFrame,
    terms: list[str],
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) for a conjunctive query over the compressed
    index; rank-identical to ``search.bm25_topk`` (differential-tested)."""
    spark = posting_lists.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    matched = posting_lists.filter(F.col("term").isin(terms))
    local = matched.groupBy("shard_id").applyInPandas(
        lambda pdf: _shard_topk_kernel(terms, k)(pdf),
        "doc_id long, score double",
    )
    out = local
    if round_to is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_to))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

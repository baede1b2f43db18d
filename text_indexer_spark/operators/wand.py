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


# driver-list blocks decoded per pruning round; small enough that the
# second round onward benefits from a warm threshold, large enough that
# the per-round Python overhead amortizes over vectorized decode
DRIVER_CHUNK_BLOCKS = 64


def scope_ranges(
    catalog: DataFrame,
    repo: str | None = None,
    path_prefix: str | None = None,
    max_intruders: int = 1_000_000,
) -> list[tuple[int, int]]:
    """A catalog scope ("search within this repo/dir") as a doc-id
    INTERVAL LIST — the layout dividend of deterministic rank ids.

    The build assigns doc ids in global (repo, path) sort order (both
    dense and stride modes), so any order-contiguous scope — a repo, a
    path prefix within a repo — occupies ONE id interval [min, max]:
    every id inside it belongs to the scope, stride gaps hold no docs.
    One pruned catalog aggregation yields the interval; the scoped query
    kernel then skips whole blocks by comparing interval bounds against
    block-last-id skip pointers — no per-doc filter join anywhere.

    A catalog mutated by incremental sync mints ADDED ids above the
    global max (order no longer equals (repo, path)), which can break
    single-interval exactness.  Contiguity is VERIFIED here (two tiny
    aggs); when it fails, the scope DEGRADES instead of erroring: the
    catalog's (doc_id, in_scope) projection is range-partitioned on id
    and each partition emits its maximal in-scope id RUNS — an interval
    list whose size is bounded by the number of order breaks (≈ sync
    deltas + partition seams), never by corpus size, and whose work is
    one two-column shuffle, fully parallel.  The kernel's block pruning
    already takes interval lists, so scoped serving keeps working
    between syncs; a merge/rebuild restores the single-interval fast
    path (and its zero-shuffle cost).

    ``max_intruders`` caps the interval-list size (it ships inside the
    broadcast kernel closure); past it the catalog has drifted so far
    from id order that scoped serving should wait for a merge, and we
    raise with that guidance.
    """
    in_scope = F.lit(True)
    if repo is not None:
        in_scope = in_scope & (F.col("repo") == repo)
    if path_prefix is not None:
        in_scope = in_scope & F.col("path").startswith(path_prefix)
    row = catalog.filter(in_scope).agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    if row["n"] == 0:
        return []
    lo, hi = int(row["lo"]), int(row["hi"])
    inside = catalog.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
    )
    if inside.count() == row["n"]:
        return [(lo, hi)]
    ranges = _scope_runs(inside, in_scope)
    if len(ranges) > max_intruders:
        raise ValueError(
            f"scope fragments into {len(ranges)} id intervals "
            f"(> max_intruders={max_intruders}); the catalog has "
            "drifted too far from (repo, path) id order — merge or "
            "rebuild the index before interval-scoped queries"
        )
    return ranges


def _scope_runs(catalog: DataFrame, in_scope) -> list[tuple[int, int]]:
    """Maximal id-consecutive runs of in-scope docs → sorted disjoint
    [(lo, hi)] intervals containing every in-scope id and no existing
    out-of-scope id.

    Each range partition computes its runs locally over id-sorted rows
    (vectorized — one np.diff over the flag array); runs are NOT merged
    across partition seams, which costs at most +num_partitions extra
    intervals and keeps the reduce a tiny collect.  Ids absent from the
    catalog (stride gaps, removed docs) match no posting, so whether a
    gap splits a run or not never changes results — only interval
    count.  The in-scope predicate is null-safe: NULL means OUT."""
    flag = catalog.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(in_scope, F.lit(False)).alias("s"),
    ).repartitionByRange(F.col("doc_id")).sortWithinPartitions("doc_id")

    def part_runs(batches):
        ids_l, s_l = [], []
        for b in batches:
            ids_l.append(b["doc_id"].to_numpy(dtype=np.int64))
            s_l.append(b["s"].to_numpy(dtype=bool))
        if not ids_l:
            return
        ids = np.concatenate(ids_l)
        s = np.concatenate(s_l)
        if not s.any():
            return
        # run starts: in-scope row whose predecessor is out (or first)
        prev = np.empty(s.size, dtype=bool)
        prev[0] = False
        prev[1:] = s[:-1]
        starts = np.flatnonzero(s & ~prev)
        nxt = np.empty(s.size, dtype=bool)
        nxt[-1] = False
        nxt[:-1] = s[1:]
        ends = np.flatnonzero(s & ~nxt)
        yield pd.DataFrame({"lo": ids[starts], "hi": ids[ends]})

    rows = flag.mapInPandas(part_runs, "lo long, hi long").collect()
    return sorted((int(r["lo"]), int(r["hi"])) for r in rows)


def _ranges_arrays(ranges):
    """Sorted disjoint [(lo, hi)] → (los, his) int64 arrays (or None)."""
    if not ranges:
        return None
    pairs = sorted((int(lo), int(hi)) for lo, hi in ranges)
    los = np.array([p[0] for p in pairs], dtype=np.int64)
    his = np.array([p[1] for p in pairs], dtype=np.int64)
    return los, his


def _ids_in_ranges(ids: np.ndarray, los: np.ndarray, his: np.ndarray) -> np.ndarray:
    """Boolean mask: which ids fall inside any [lo, hi] interval."""
    i = np.searchsorted(los, ids, side="right") - 1
    ok = i >= 0
    ok[ok] = ids[ok] <= his[i[ok]]
    return ok


def _local_topk(cand: np.ndarray, scores: np.ndarray, k: int,
                round_to: int | None) -> pd.DataFrame:
    """Tie-INCLUSIVE local top-k: exact duplicates score bit-identically,
    and dropping one of a tie group locally could flip the global
    tie-break. ``round_to`` applies BEFORE selection so the global cut
    sees the same ordering the caller will use."""
    if round_to is not None:
        scores = np.round(scores, round_to)
    if cand.size > k:
        kth = np.partition(-scores, k - 1)[k - 1]
        keep = -scores <= kth
        cand, scores = cand[keep], scores[keep]
    order = np.lexsort((cand, -scores))
    return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})


def _shard_or_kernel(terms: list[str], k: int, round_to: int | None = None,
                     ranges=None):
    """Disjunctive (true WAND semantics) per-shard kernel: score every
    doc appearing in ANY query-term list — union of the decoded lists,
    summed by doc id. Fully vectorized (concat + sort + reduceat).
    ``ranges``: optional (los, his) scope intervals — out-of-scope ids
    drop before the union."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from text_indexer_spark.operators.codec import decode_posting_list

        ids_all, w_all = [], []
        for r in pdf.to_dict("records"):
            ids, _, w = decode_posting_list(r)
            ids_all.append(ids)
            w_all.append(w)
        ids = np.concatenate(ids_all)
        w = np.concatenate(w_all)
        if ranges is not None:
            keep = _ids_in_ranges(ids, *ranges)
            ids, w = ids[keep], w[keep]
            if ids.size == 0:
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
        order = np.argsort(ids, kind="stable")
        ids, w = ids[order], w[order]
        uniq_mask = np.empty(ids.size, dtype=bool)
        uniq_mask[0] = True
        np.not_equal(ids[1:], ids[:-1], out=uniq_mask[1:])
        starts = np.flatnonzero(uniq_mask)
        scores = np.add.reduceat(w, starts)
        return _local_topk(ids[starts], scores, k, round_to)

    return kernel


def _shard_topk_kernel(terms: list[str], k: int, round_to: int | None = None,
                       chunk_blocks: int | None = None, ranges=None):
    """Conjunctive per-shard kernel (reference AND semantics,
    DocumentsIndexer.kt:58-67): rarest list drives, other lists probed
    via block-max skip pointers so only candidate blocks are decoded.

    ``ranges``: optional (los, his) scope intervals. Scope pruning acts
    at BLOCK granularity on the driver list — a block whose id span
    misses every interval is never decoded (for a narrow path scope
    that's ~all blocks) — and surviving candidates are interval-filtered
    before any probe decode."""
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

        # driver list = rarest term. Its blocks are processed in chunks
        # with BLOCK-MAX PRUNING: once k candidates are scored, a driver
        # block whose (own block-max + sum of the other lists' global
        # maxima) rounds below the running k-th score cannot contribute
        # to the tie-inclusive top-k and is never decoded. Rounding is
        # monotone, so pruning on the rounded bound is exact.
        r0, rest = rows[0], rows[1:]
        rest_ub = sum(max(r["block_max_w"]) for r in rest)
        weights0 = np.frombuffer(r0["weights_f64"], dtype=np.float64)
        blk_ub0 = np.asarray(r0["block_max_w"], dtype=np.float64) + rest_ub
        if round_to is not None:
            blk_ub0 = np.round(blk_ub0, round_to)
        nblocks0 = blk_ub0.size
        blk_allowed = None
        if ranges is not None:
            los, his = ranges
            last0 = np.asarray(r0["block_last_id"], dtype=np.int64)
            # block i spans (last[i-1], last[i]]; it overlaps the scope
            # iff the first interval with hi >= block-start also starts
            # at or before the block's last id
            starts = np.empty(nblocks0, dtype=np.int64)
            starts[0] = np.iinfo(np.int64).min
            starts[1:] = last0[:-1] + 1
            j = np.searchsorted(his, starts)
            blk_allowed = (j < los.size) & (
                los[np.minimum(j, los.size - 1)] <= last0
            )
            if not blk_allowed.any():
                return empty
        rest_w = [np.frombuffer(r["weights_f64"], dtype=np.float64) for r in rest]
        rest_last = [np.asarray(r["block_last_id"], dtype=np.int64) for r in rest]

        kept_ids: list[np.ndarray] = []
        kept_scores: list[np.ndarray] = []
        n_kept = 0
        theta = None  # k-th best (rounded) score so far

        chunk = chunk_blocks or DRIVER_CHUNK_BLOCKS
        for start in range(0, nblocks0, chunk):
            blocks = np.arange(start, min(start + chunk, nblocks0))
            if blk_allowed is not None:
                blocks = blocks[blk_allowed[blocks]]
                if blocks.size == 0:
                    continue
            if theta is not None:
                blocks = blocks[blk_ub0[blocks] >= theta]
                if blocks.size == 0:
                    continue
            cand, pos0 = decode_block_ids(r0, blocks)
            scores = weights0[pos0]
            if ranges is not None:
                keep = _ids_in_ranges(cand, *ranges)
                cand, scores = cand[keep], scores[keep]
                if cand.size == 0:
                    continue
            for r, w, lastids in zip(rest, rest_w, rest_last):
                if cand.size == 0:
                    break
                # which block could contain each candidate
                blk = np.searchsorted(lastids, cand, side="left")
                valid = blk < lastids.size
                cand, scores, blk = cand[valid], scores[valid], blk[valid]
                if cand.size == 0:
                    break
                need = np.unique(blk)
                ids_sub, pos_sub = decode_block_ids(r, need)
                idx = np.searchsorted(ids_sub, cand)
                idx = np.minimum(idx, ids_sub.size - 1)
                found = ids_sub[idx] == cand
                cand, scores = cand[found], scores[found]
                if cand.size == 0:
                    break
                scores = scores + w[pos_sub[idx[found]]]
            if cand.size == 0:
                continue
            kept_ids.append(cand)
            kept_scores.append(scores)
            n_kept += cand.size
            if n_kept >= k:
                alls = np.concatenate(kept_scores)
                allr = np.round(alls, round_to) if round_to is not None else alls
                theta = -np.partition(-allr, k - 1)[k - 1]
                # trim survivors to the tie-inclusive top-k: bounds kept
                # memory to ~k and keeps the θ recompute O(k)
                keep = allr >= theta
                kept_ids = [np.concatenate(kept_ids)[keep]]
                kept_scores = [alls[keep]]
                n_kept = int(kept_ids[0].size)

        if not kept_ids:
            return empty
        return _local_topk(
            np.concatenate(kept_ids), np.concatenate(kept_scores), k, round_to
        )

    return kernel


def wand_topk_batch(
    posting_lists: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    round_to: int | None = None,
    global_topk: bool = True,
) -> DataFrame:
    """Many queries in ONE Spark job → (query_id, doc_id, score).

    Per-job fixed overhead (scheduling, Python worker dispatch, plan
    analysis) dominates single-query latency on a warm index; a serving
    tier amortizes it by batching. One scan with ``term IN (union of all
    query terms)``, per-shard kernels loop the (tiny) query list over the
    shard's decoded lists, global per-query top-k via window rank."""
    from pyspark.sql import Window

    spark = posting_lists.sparkSession
    qmap = {qid: list(dict.fromkeys(t)) for qid, t in queries.items() if t}
    if not qmap:
        return spark.createDataFrame([], "query_id string, doc_id long, score double")
    all_terms = sorted({t for terms in qmap.values() for t in terms})
    matched = posting_lists.filter(F.col("term").isin(all_terms))
    kernels = {qid: _shard_topk_kernel(terms, k) for qid, terms in qmap.items()}
    term_sets = {qid: set(terms) for qid, terms in qmap.items()}

    def per_partition(batches):
        parts = [b for b in batches if not b.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        for _, g in pdf.groupby("shard_id", sort=False):
            for qid, kern in kernels.items():
                sub = g[g["term"].isin(term_sets[qid])]
                if sub.empty:
                    continue
                out = kern(sub)
                if len(out):
                    out.insert(0, "query_id", qid)
                    yield out

    local = matched.mapInPandas(
        per_partition, "query_id string, doc_id long, score double"
    )
    if round_to is not None:
        local = local.withColumn("score", F.round(F.col("score"), round_to))
    if not global_topk:
        # tie-inclusive per-shard candidates; caller applies its own cut
        # (e.g. after re-keying doc ids — see wand_topk's contract)
        return local
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def wand_topk(
    posting_lists: DataFrame,
    terms: list[str],
    k: int = 10,
    round_to: int | None = None,
    global_topk: bool = True,
    conjunctive: bool = True,
    driver_chunk_blocks: int | None = None,
    scope: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) over the compressed index; rank-identical
    to ``search.bm25_topk`` (differential-tested). ``conjunctive=True``
    is the reference's AND semantics; ``False`` is classic disjunctive
    WAND (any-term match, summed BM25).

    ``scope``: optional doc-id intervals from ``scope_ranges`` — the
    "search within this repo/dir" serving feature. Scores stay GLOBAL
    (weights were baked index-wide); only the candidate set narrows, and
    it narrows at block granularity before decode, so a narrow scope
    costs proportionally less, not a post-filter.

    ``global_topk=False`` returns all per-shard candidates (tie-inclusive
    local top-k) so the caller can apply its own global cut — e.g. after
    re-mapping doc ids to an external keying with a different tie-break."""
    spark = posting_lists.sparkSession
    terms = list(dict.fromkeys(terms))
    if not terms or (scope is not None and not scope):
        return spark.createDataFrame([], "doc_id long, score double")
    matched = posting_lists.filter(F.col("term").isin(terms))
    ranges = _ranges_arrays(scope)
    kernel = (
        _shard_topk_kernel(terms, k, round_to,
                           chunk_blocks=driver_chunk_blocks, ranges=ranges)
        if conjunctive
        else _shard_or_kernel(terms, k, round_to, ranges=ranges)
    )

    def per_partition(batches):
        # Shuffle-free shard grouping: the index layout guarantees one
        # row group per shard file, so a scan partition holds whole
        # shards (possibly several). Group locally instead of groupBy.
        parts = [b for b in batches if not b.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        for _, g in pdf.groupby("shard_id", sort=False):
            out = kernel(g)
            if len(out):
                yield out

    local = matched.mapInPandas(per_partition, "doc_id long, score double")
    if not global_topk:
        return local
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

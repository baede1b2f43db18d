"""Phrase and proximity matching — positional queries over the corpus.

The reference is a boolean membership index (``Index.kt:9``: token →
doc-id set — no positions), so phrase search is an ENGINE EXTENSION:
conjunctive AND (J1) strengthened with token-position constraints.
Implemented query-time over the tokenized corpus (no index-format
change): positions come from ``posexplode`` of the SAME tokenizer the
index uses, so phrase semantics are tokenizer-faithful (punctuation and
case behave exactly like indexed terms — a raw substring match would
not be).

Scale shape: the first phrase term's postings are filtered FIRST (the
rarest-first heuristic belongs to the caller via term order), then each
subsequent term joins on (doc, position+i) — equi-joins on composite
keys, no theta join; each join's build side is one term's positional
postings, pruned by the term filter at the scan. For a served system
the same joins run against a positional postings table
(term, doc_id, pos) built once — the operator takes either a corpus or
a prebuilt positional table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.tokenizer import tokenize_column


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, pos): the positional postings relation (0-based
    token positions, duplicates kept — one row per occurrence)."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "term"),
    )


def phrase_match(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids containing the EXACT consecutive token sequence
    ``phrase`` (tokenizer-faithful). Empty phrase → empty result (the
    empty-token guard, same policy as conjunctive search)."""
    spark = df.sparkSession
    if not phrase:
        return spark.createDataFrame([], f"{id_col} long")
    posts = positional_postings(df, text_col, id_col)
    base = posts.filter(F.col("term") == phrase[0]).select(
        id_col, F.col("pos").alias("p0")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = posts.filter(F.col("term") == term).select(
            id_col, (F.col("pos") - i).alias("p0")
        )
        base = base.join(nxt, [id_col, "p0"], "left_semi")
    return base.select(id_col).distinct()


def proximity_match(
    df: DataFrame,
    terms: list[str],
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids where ALL ``terms`` occur within some ``window``
    consecutive tokens (unordered NEAR/w). Anchor = the first term:
    every other term must appear within [anchor − w + 1, anchor + w − 1]
    and the full span must fit in ``window`` — checked exactly via
    min/max positions per anchor occurrence."""
    spark = df.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long")
    uniq = list(dict.fromkeys(terms))
    posts = positional_postings(df, text_col, id_col)
    anchor = posts.filter(F.col("term") == uniq[0]).select(
        id_col, F.col("pos").alias("apos")
    )
    cur = anchor.withColumn("minp", F.col("apos")).withColumn("maxp", F.col("apos"))
    for term in uniq[1:]:
        t = posts.filter(F.col("term") == term).select(
            id_col, F.col("pos").alias("tpos")
        )
        cur = (
            cur.join(t, id_col)
            .filter(
                (F.col("tpos") > F.col("apos") - window)
                & (F.col("tpos") < F.col("apos") + window)
            )
            .withColumn("minp", F.least("minp", "tpos"))
            .withColumn("maxp", F.greatest("maxp", "tpos"))
            .drop("tpos")
        )
    return (
        cur.filter(F.col("maxp") - F.col("minp") < window)
        .select(id_col)
        .distinct()
    )


# ---------------------------------------------------------------------
# Committed-index serving: the same phrase / proximity semantics over
# the COMPRESSED positional index (build_index(with_positions=True)),
# no corpus re-scan. Shards are disjoint doc-id ranges, so per-shard
# evaluation is exact and the union of shard results is global.
# ---------------------------------------------------------------------

def proximity_ids_from_decoded(decoded: dict, terms: list[str], window: int):
    """Decoded positional lists ``{term: (ids, tfs, pos, offs)}`` →
    doc ids where ALL ``terms`` occur within some ``window``-token span
    (unordered NEAR/w). Pure numpy set algebra over (local-doc,
    window-start) composite keys; shared by the proximity kernel and the
    query-DSL evaluator. A term missing from ``decoded`` ⇒ no match."""
    import numpy as np

    empty = np.empty(0, dtype=np.int64)
    uniq = list(dict.fromkeys(terms))
    if any(t not in decoded for t in uniq):
        return empty
    # candidate docs: in every term's list (cheap pre-cut before any
    # positional work)
    cand = decoded[uniq[0]][0]
    for t in uniq[1:]:
        cand = cand[np.isin(cand, decoded[t][0])]
    if cand.size == 0:
        return empty
    max_pos = 0
    sel = {}
    for t in uniq:
        ids, tfs, pos, offs = decoded[t]
        pick = np.flatnonzero(np.isin(ids, cand))
        # flattened positions of the selected postings + their docs
        reps = tfs[pick]
        docs = np.repeat(ids[pick], reps)
        total = int(reps.sum())
        # idx enumerates each posting's [start, start+tf) run:
        # start + (global position - segment start)
        seg = np.repeat(np.cumsum(reps) - reps, reps)
        idx = np.repeat(offs[pick], reps) + (np.arange(total) - seg)
        p = pos[idx]
        sel[t] = (docs, p)
        if p.size:
            max_pos = max(max_pos, int(p.max()))
    # composite keys on a DENSE local doc index so int64 never
    # overflows (stride-mode shard doc ids sit at huge offsets)
    span = np.int64(max_pos + window + 2)
    local = np.sort(cand)

    def keys(t: str) -> np.ndarray:
        docs, p = sel[t]
        li = np.searchsorted(local, docs)
        # NEAR/w: occurrence at p covers window-starts [p-w+1, p]
        s0 = np.maximum(p - window + 1, 0)
        cnt = (p - s0 + 1).astype(np.int64)
        tot = int(cnt.sum())
        base = np.repeat(li * span + s0, cnt)
        off = np.repeat(np.cumsum(cnt) - cnt, cnt)
        k = base + (np.arange(tot) - off)
        return np.unique(k)

    inter = keys(uniq[0])
    for t in uniq[1:]:
        inter = np.intersect1d(inter, keys(t), assume_unique=True)
        if inter.size == 0:
            break
    if inter.size == 0:
        return empty
    return np.unique(local[(inter // span).astype(np.int64)]).astype(np.int64)


def _proximity_kernel(terms: list[str], window: int):
    """Per-shard NEAR/w kernel wrapping :func:`proximity_ids_from_decoded`."""
    import pandas as pd

    uniq = list(dict.fromkeys(terms))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        from text_indexer_spark.operators.codec import (
            decode_positions,
            decode_posting_list,
        )

        rows = {r["term"]: r for _, r in g.iterrows()}
        if any(t not in rows for t in uniq):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        decoded = {}
        for t in uniq:
            ids, tfs, _ = decode_posting_list(rows[t])
            pos, offs = decode_positions(rows[t]["positions_varbyte"], tfs)
            decoded[t] = (ids, tfs, pos, offs)
        out = proximity_ids_from_decoded(decoded, terms, window)
        return pd.DataFrame({"doc_id": out})

    return kernel


def _positional_lists_scan(posting_lists: DataFrame, terms: list[str], kernel):
    import pandas as pd

    matched = posting_lists.filter(F.col("term").isin(list(set(terms))))

    def per_partition(batches):
        parts = [b for b in batches if not b.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        for _, g in pdf.groupby("shard_id", sort=False):
            out = kernel(g)
            if len(out):
                yield out

    return matched.mapInPandas(per_partition, "doc_id long")


def phrase_match_index(posting_lists: DataFrame, phrase: list[str]) -> DataFrame:
    """doc_ids containing the exact consecutive token sequence, served
    from the positional committed index. Result ≡ ``phrase_match`` over
    the source corpus (differential-tested). A repeated term in the
    phrase is handled exactly: its position set is checked at every slot
    it occupies (shift differs per slot)."""
    spark = posting_lists.sparkSession
    if not phrase:
        return spark.createDataFrame([], "doc_id long")
    if "positions_varbyte" not in posting_lists.columns:
        raise ValueError(
            "index has no positional payload; rebuild with "
            "build_index(..., with_positions=True)"
        )
    # repeated terms need one key-set per SLOT, not per term — expand to
    # per-slot pseudo-terms sharing the decoded list
    kernel = _phrase_slots_kernel(phrase)
    return _positional_lists_scan(posting_lists, phrase, kernel)


def phrase_ids_from_decoded(decoded: dict, phrase: list[str]):
    """Decoded positional lists ``{term: (ids, tfs, pos, offs)}`` →
    doc ids containing the exact consecutive token sequence ``phrase``.
    Pure numpy (shared by the phrase kernel and the query-DSL
    evaluator); a term missing from ``decoded`` ⇒ no match. A repeated
    phrase term is handled exactly: its position set is checked at every
    slot it occupies (shift differs per slot)."""
    import numpy as np

    empty = np.empty(0, dtype=np.int64)
    uniq = list(dict.fromkeys(phrase))
    if any(t not in decoded for t in uniq):
        return empty
    cand = decoded[uniq[0]][0]
    for t in uniq[1:]:
        cand = cand[np.isin(cand, decoded[t][0])]
    if cand.size == 0:
        return empty
    local = np.sort(cand)
    max_pos = 0
    flat = {}
    for t in uniq:
        ids, tfs, pos, offs = decoded[t]
        pick = np.flatnonzero(np.isin(ids, cand))
        reps = tfs[pick]
        docs = np.repeat(ids[pick], reps)
        total = int(reps.sum())
        seg = np.repeat(np.cumsum(reps) - reps, reps)
        idx = np.repeat(offs[pick], reps) + (np.arange(total) - seg)
        p = pos[idx]
        flat[t] = (np.searchsorted(local, docs), p)
        if p.size:
            max_pos = max(max_pos, int(p.max()))
    span = np.int64(max_pos + len(phrase) + 2)
    inter = None
    for slot, t in enumerate(phrase):
        li, p = flat[t]
        q = p - slot
        ok = q >= 0
        k = li[ok] * span + q[ok]
        inter = k if inter is None else np.intersect1d(inter, k)
        if inter.size == 0:
            break
    if inter is None or inter.size == 0:
        return empty
    return np.unique(local[(inter // span).astype(np.int64)]).astype(np.int64)


def _phrase_slots_kernel(phrase: list[str]):
    import numpy as np
    import pandas as pd

    uniq = list(dict.fromkeys(phrase))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        from text_indexer_spark.operators.codec import (
            decode_positions,
            decode_posting_list,
        )

        rows = {r["term"]: r for _, r in g.iterrows()}
        if any(t not in rows for t in uniq):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        decoded = {}
        for t in uniq:
            ids, tfs, _ = decode_posting_list(rows[t])
            pos, offs = decode_positions(rows[t]["positions_varbyte"], tfs)
            decoded[t] = (ids, tfs, pos, offs)
        out = phrase_ids_from_decoded(decoded, phrase)
        return pd.DataFrame({"doc_id": out})

    return kernel


def proximity_match_index(
    posting_lists: DataFrame, terms: list[str], window: int = 8
) -> DataFrame:
    """Unordered NEAR/``window`` served from the positional committed
    index: a doc matches iff some ``window``-token span contains every
    term — equivalent to ∃ occurrence choice with max−min < window,
    i.e. exactly ``proximity_match``'s semantics (differential-tested).
    Each occurrence at position p covers window-starts [p−w+1, p]; the
    per-term covered-start sets intersect non-empty iff such a span
    exists."""
    spark = posting_lists.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    if "positions_varbyte" not in posting_lists.columns:
        raise ValueError(
            "index has no positional payload; rebuild with "
            "build_index(..., with_positions=True)"
        )
    kernel = _proximity_kernel(terms, window)
    return _positional_lists_scan(posting_lists, terms, kernel)

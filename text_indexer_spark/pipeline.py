"""Declarative corpus-cleaning pipeline — the whole C4 / CCNet /
Gopher hygiene stack as ONE ordered stage list.

Every published pre-training pipeline is a fixed sequence of the same
cuts (normalize → blocklists → rule filters → dedup tiers → LM cut →
decontamination → PII → sampling/mixing/selection); this module makes
that sequence a config value instead of a hand-written script, with
per-stage accounting so the run reports exactly where documents went
— the number every data card wants and ad-hoc scripts never keep.

Design:

* **A stage is a name + params dict**; the registry maps it onto the
  corresponding operator module.  Nothing here re-implements an
  operator — the runner is pure composition, so every stage keeps the
  scale shape (and the oracle gates) of its operator.
* **Stats are optional and honest.** ``collect_stats=True`` counts
  the corpus after every stage (one cheap count action per stage —
  the frames are lineage-cut, so nothing upstream recomputes).
  ``collect_stats=False`` builds one fully lazy plan with zero extra
  actions for production runs where only the final write matters.
* **Each stage materializes once, and the previous copy is
  released.**  With stats on, every stage output is ``persist``ed so
  the count and the next stage share the work, and the prior stage's
  snapshot is ``unpersist``ed as soon as the new one is counted — at
  most TWO corpus copies live in the block manager at any moment
  (stage chains are linear, so plan growth is modest and a lineage
  cut is not needed; every stage is deterministic, so recompute after
  cache eviction is always safe).  Pass ``checkpoint_dir`` for
  RELIABLE disk checkpoints instead (the ``connected_components``
  precedent) when executor loss must not kill a multi-hour run.
  With ``collect_stats=False`` nothing persists — the plan stays
  lazy end to end.
* **Schema contract**: stages that reassemble text from token/line
  grain (``dedup_lines``, ``dedup_spans``) emit ``(id, text)``; the
  runner re-joins the corpus' other columns by id so the pipeline
  preserves the full schema regardless of stage order.

The text stages assume a ``(doc_id, text, …)`` corpus (the engine's
document grain).  Embedding-grain semantic dedup (``semdedup``) and
the ANN store live at a different grain and keep their own CLIs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageStat:
    stage: str
    docs_in: int
    docs_out: int

    @property
    def dropped(self) -> int:
        return self.docs_in - self.docs_out


def _st_normalize(spark, df, p, ic, tc):
    from text_indexer_spark.operators.normalize import normalize_text

    form = p.get("form")
    form = None if form in (None, "ws") else str(form).upper()
    return normalize_text(df, text_col=tc, form=form)


def _st_block_domains(spark, df, p, ic, tc):
    from text_indexer_spark.operators import urlfilter

    bl = spark.read.parquet(p["blocklist"])
    return urlfilter.filter_blocked_domains(df, bl, id_col=ic, text_col=tc)


def _st_block_words(spark, df, p, ic, tc):
    from text_indexer_spark.operators import urlfilter

    return urlfilter.filter_blocked_words(
        df, list(p["words"]), text_col=tc, id_col=ic
    )


def _st_quality(spark, df, p, ic, tc):
    from text_indexer_spark.operators import textstats

    return textstats.filter_by_quality(
        df, min_quality=p.get("min_quality", 0.4), text_col=tc
    )


def _st_repetition(spark, df, p, ic, tc):
    from text_indexer_spark.operators import textstats

    return textstats.filter_by_repetition(
        df,
        max_dup_line_frac=p.get("max_dup_line_frac", 0.3),
        max_top_2gram_frac=p.get("max_top_2gram_frac", 0.2),
        text_col=tc,
    )


def _st_lm_ppl(spark, df, p, ic, tc):
    from text_indexer_spark.operators import lm

    high = (
        lm.lm_self_score(df, k=p.get("k", 0.5), id_col=ic, text_col=tc)
        .filter(F.col("ppl") > float(p["max_ppl"]))
        .select(ic)
    )
    # no forced broadcast — a tight cut can flag an unbounded fraction
    return df.join(high, ic, "left_anti")


def _st_decontam(spark, df, p, ic, tc):
    from text_indexer_spark.operators import decontam

    ev = spark.read.parquet(p["evalset"])
    ev_tc = "content" if "content" in ev.columns else "text"
    grams = decontam.eval_ngrams(ev, n=p.get("n", 8), text_col=ev_tc)
    return decontam.decontaminate_auto(
        df, grams, n=p.get("n", 8), id_col=ic, text_col=tc,
        tier=p.get("tier", "auto"),
    )


def _st_pii(spark, df, p, ic, tc):
    from text_indexer_spark.operators import redact

    return redact.redact_pii(df, text_col=tc)


def _st_dedup_exact(spark, df, p, ic, tc):
    from text_indexer_spark.operators import dedup

    losers = (
        dedup.exact_dedup(df, text_col=tc, id_col=ic)
        .filter(F.col(ic) != F.col("canonical_id"))
        .select(ic)
    )
    return df.join(losers, ic, "left_anti")


def _restore_columns(df, cleaned, ic, tc):
    """Re-join non-text columns after a text-reassembling stage and
    restore the original column order."""
    extra = [c for c in df.columns if c not in (ic, tc)]
    if not extra:
        return cleaned.select(df.columns)
    return cleaned.join(df.select(ic, *extra), ic).select(df.columns)


def _st_dedup_neardup(spark, df, p, ic, tc):
    """Fuzzy document dedup (the C4/FineWeb MinHash stage): banded LSH
    candidate pairs → connected-component groups → min-id survivor."""
    from text_indexer_spark.operators import dedup
    from text_indexer_spark.operators.cluster import (
        dedup_clusters,
        materialize_deduped,
    )

    num_hashes = p.get("num_hashes", 16)
    sigs = dedup.minhash_signatures(
        df, num_hashes=num_hashes, n=p.get("n", 3),
        text_col=tc, id_col=ic,
    )
    pairs = dedup.lsh_candidate_pairs(
        sigs, num_hashes=num_hashes, bands=p.get("bands", 4), id_col=ic
    )
    clusters = dedup_clusters(pairs, src="doc_a", dst="doc_b")
    return materialize_deduped(df, clusters, id_col=ic)


def _st_dedup_lines(spark, df, p, ic, tc):
    from text_indexer_spark.operators import linededup

    out = linededup.dedup_lines(
        df, min_docs=p.get("min_docs", 2), id_col=ic, text_col=tc
    )
    return _restore_columns(df, out, ic, tc)


def _st_dedup_spans(spark, df, p, ic, tc):
    from text_indexer_spark.operators import spandedup

    out = spandedup.dedup_spans(
        df, n=p.get("n", 8), min_count=p.get("min_count", 2),
        id_col=ic, text_col=tc,
    )
    return _restore_columns(df, out, ic, tc)


def _st_sample(spark, df, p, ic, tc):
    from text_indexer_spark.operators import sampling

    return sampling.hash_sample(
        df, float(p["fraction"]), key_col=ic, salt=p.get("salt", "s1")
    )


def _st_mix(spark, df, p, ic, tc):
    from text_indexer_spark.operators import mixing

    return mixing.mixture_sample(
        df, dict(p["weights"]), int(p["total_tokens"]),
        source_col=p.get("source_col", "lang"), text_col=tc,
        key_col=ic, salt=p.get("salt", "mix1"),
    )


def _st_dsir_select(spark, df, p, ic, tc):
    from text_indexer_spark.operators import dsir

    # dsir_select applies (id_col, text_col) to BOTH frames, so the
    # target — an arbitrary external corpus — is normalized to the
    # pipeline's column names first.  Target ids only group the target
    # feature counts (never join the corpus), so a content hash is a
    # fine stand-in when the target carries no id column.
    tgt = spark.read.parquet(p["target"])
    tgt_tc = "content" if "content" in tgt.columns else "text"
    if tgt_tc != tc:
        tgt = tgt.withColumn(tc, F.col(tgt_tc))
    if ic not in tgt.columns:
        tgt = tgt.withColumn(
            ic, F.xxhash64(F.coalesce(F.col(tc), F.lit("")))
        )
    return dsir.dsir_select(
        df, tgt.select(ic, tc), int(p["n"]),
        n_buckets=p.get("buckets", 1 << 16), k=p.get("k", 0.5),
        salt=p.get("salt", "dsir1"), id_col=ic, text_col=tc,
    )


def _st_chunk_pack(spark, df, p, ic, tc):
    """Terminal stage: chunk → token-budget pack → assembled training
    sequences (``textstats.packed_sequences``).  Changes the output
    grain from documents to ``(bucket, seq_idx, n_tokens, text)``
    sequences, so it must be the LAST stage (validated up front)."""
    from text_indexer_spark.operators import textstats

    return textstats.packed_sequences(
        df, max_tokens=p.get("max_tokens", 64),
        budget=p.get("budget", 2048), buckets=p.get("buckets", 256),
        text_col=tc, id_col=ic,
    )


#: op name → stage function.  Transform stages (normalize, pii) change
#: text; filter stages drop rows; reassembly stages rewrite text at
#: token/line grain (schema restored by the runner).
STAGES = {
    "normalize": _st_normalize,
    "block_domains": _st_block_domains,
    "block_words": _st_block_words,
    "quality": _st_quality,
    "repetition": _st_repetition,
    "lm_ppl": _st_lm_ppl,
    "decontam": _st_decontam,
    "pii": _st_pii,
    "dedup_exact": _st_dedup_exact,
    "dedup_neardup": _st_dedup_neardup,
    "dedup_lines": _st_dedup_lines,
    "dedup_spans": _st_dedup_spans,
    "sample": _st_sample,
    "mix": _st_mix,
    "dsir_select": _st_dsir_select,
    "chunk_pack": _st_chunk_pack,
}


#: op → (required params, optional params).  Validation rejects a
#: missing required key and any key outside the union — a typo'd knob
#: ("min_qualty") must fail the config, not silently fall back to the
#: operator default (found in review).
_STAGE_PARAMS = {
    "normalize": (set(), {"form"}),
    "block_domains": ({"blocklist"}, set()),
    "block_words": ({"words"}, set()),
    "quality": (set(), {"min_quality"}),
    "repetition": (set(), {"max_dup_line_frac", "max_top_2gram_frac"}),
    "lm_ppl": ({"max_ppl"}, {"k"}),
    "decontam": ({"evalset"}, {"n", "tier"}),
    "pii": (set(), set()),
    "dedup_exact": (set(), set()),
    "dedup_neardup": (set(), {"num_hashes", "bands", "n"}),
    "dedup_lines": (set(), {"min_docs"}),
    "dedup_spans": (set(), {"n", "min_count"}),
    "sample": ({"fraction"}, {"salt"}),
    "mix": ({"weights", "total_tokens"}, {"source_col", "salt"}),
    "dsir_select": ({"target", "n"}, {"buckets", "k", "salt"}),
    "chunk_pack": (set(), {"max_tokens", "budget", "buckets"}),
}

assert set(_STAGE_PARAMS) == set(STAGES)  # registries must not drift

#: stages whose semantics require doc ids to be UNIQUE (dedup keeps /
#: drops rows BY id; a content-derived synthetic id collides exactly on
#: the duplicates these stages exist to find)
ID_SENSITIVE_STAGES = {
    "dedup_exact", "dedup_neardup", "dedup_lines", "dedup_spans",
}

#: stages that change the OUTPUT GRAIN (documents → training
#: sequences) — nothing can run after them
TERMINAL_STAGES = {"chunk_pack"}


def validate_stages(stages: list[dict]) -> None:
    """Fail fast on a malformed config — BEFORE any Spark job runs:
    unknown ops, missing required params, and unknown (typo'd) params
    all reject the whole config up front."""
    if not stages:
        raise ValueError("pipeline needs at least one stage")
    for i, s in enumerate(stages):
        if not isinstance(s, dict) or "op" not in s:
            raise ValueError(f"stage {i}: every stage needs an 'op' key")
        op = s["op"]
        if op not in STAGES:
            known = ", ".join(sorted(STAGES))
            raise ValueError(f"stage {i}: unknown op {op!r} (known: {known})")
        required, optional = _STAGE_PARAMS[op]
        keys = set(s) - {"op"}
        missing = required - keys
        if missing:
            raise ValueError(
                f"stage {i} ({op}): missing required param(s) "
                f"{sorted(missing)}"
            )
        unknown = keys - required - optional
        if unknown:
            raise ValueError(
                f"stage {i} ({op}): unknown param(s) {sorted(unknown)} "
                f"(accepted: {sorted(required | optional)})"
            )
        if op in TERMINAL_STAGES and i != len(stages) - 1:
            raise ValueError(
                f"stage {i} ({op}): changes the output grain to "
                "training sequences and must be the LAST stage"
            )


def _stage_dir(work_dir: str, i: int, op: str) -> str:
    return os.path.join(work_dir, f"stage_{i:02d}_{op}")


def _stage_marker(work_dir: str, i: int, op: str) -> str:
    return _stage_dir(work_dir, i, op) + ".done.json"


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    stages: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_stats: bool = True,
    checkpoint_dir: str | None = None,
    work_dir: str | None = None,
) -> tuple[DataFrame, list[StageStat]]:
    """Run ``stages`` in order over ``corpus``; returns the cleaned
    corpus and (when ``collect_stats``) one :class:`StageStat` per
    stage.  Each stage dict is ``{"op": <name>, ...params}``.

    ``work_dir`` makes the run RESUMABLE (the engine-wide discipline:
    builds resume per shard, streams replay per batch — a multi-hour
    cleaning run must not restart at stage 0 because stage 7 died):
    each stage's output is written to ``stage_NN_<op>`` parquet and
    sealed by a marker recording the FULL stage spec and row count,
    written only AFTER the parquet completes (crash between the two →
    the stage reruns; the overwrite is idempotent because every stage
    is deterministic).  A rerun replays markers from the front: a
    stage whose marker matches its spec is read back instead of
    recomputed, and the first changed/missing/unsealed stage
    invalidates everything after it (a spec edit mid-chain cannot
    serve stale downstream outputs).  With ``work_dir`` every stage is
    materialized on disk, so stats cost nothing extra and no persist
    juggling happens."""
    validate_stages(stages)
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    df = corpus
    stats: list[StageStat] = []
    prev = None  # the previous stage's persisted frame, for release
    n = df.count() if collect_stats else -1

    if work_dir is not None:
        os.makedirs(work_dir, exist_ok=True)
        valid_prefix = True
        for i, spec in enumerate(stages):
            op = spec["op"]
            marker_path = _stage_marker(work_dir, i, op)
            marker = None
            if valid_prefix and os.path.exists(marker_path):
                try:
                    with open(marker_path) as f:
                        marker = json.load(f)
                except (OSError, ValueError):
                    marker = None
                # the seal covers the stage spec AND the column
                # contract — a rerun under different id/text columns
                # must not reuse outputs computed under the old ones
                if marker is not None and (
                    marker.get("spec") != spec
                    or marker.get("cols") != [id_col, text_col]
                ):
                    marker = None  # changed → recompute from here
            if marker is not None:
                df = spark.read.parquet(_stage_dir(work_dir, i, op))
                n_out = int(marker["docs_out"])
            else:
                valid_prefix = False
                params = {k: v for k, v in spec.items() if k != "op"}
                df = STAGES[op](spark, df, params, id_col, text_col)
                out_dir = _stage_dir(work_dir, i, op)
                # stale marker (if any) dies BEFORE the overwrite so a
                # crash mid-write can never leave a sealed-but-partial
                # stage behind
                try:
                    os.remove(marker_path)
                except OSError:
                    pass
                df.write.mode("overwrite").parquet(out_dir)
                df = spark.read.parquet(out_dir)
                n_out = df.count()
                tmp = marker_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(
                        {
                            "spec": spec,
                            "cols": [id_col, text_col],
                            "docs_out": n_out,
                        },
                        f,
                    )
                os.replace(tmp, marker_path)
            if collect_stats:
                stats.append(StageStat(spec["op"], n, n_out))
            n = n_out
        return df, stats

    for spec in stages:
        params = {k: v for k, v in spec.items() if k != "op"}
        df = STAGES[spec["op"]](spark, df, params, id_col, text_col)
        if collect_stats:
            # materialize once per stage so the count and the next
            # stage share the work, then RELEASE the previous stage's
            # copy — at most two corpus snapshots live at any moment
            # (an unreleased per-stage localCheckpoint chain holds one
            # full copy per stage in the block manager, found in
            # review).  checkpoint() (reliable, disk) is for clusters
            # where executor loss must not kill a multi-hour run;
            # persist is the single-job default.  Every stage is
            # deterministic (content-stable draws), so recompute after
            # cache eviction cannot change the result.
            if checkpoint_dir is not None:
                df = df.checkpoint(eager=True)
            else:
                df = df.persist()
            n_out = df.count()
            if prev is not None and checkpoint_dir is None:
                prev.unpersist()
            prev = df
            stats.append(StageStat(spec["op"], n, n_out))
            n = n_out
        # lazy mode: one end-to-end plan, zero extra actions
    return df, stats

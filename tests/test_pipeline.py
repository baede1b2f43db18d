"""Declarative pipeline runner (pipeline.py): composition ≡ chained
operators, schema restoration after reassembly stages, per-stage
accounting, lazy mode, config validation, CLI roundtrip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from text_indexer_spark import pipeline
from text_indexer_spark.operators import dedup, sampling, textstats

GOOD = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while traders discuss quarterly earnings and weather patterns"
)
# rows: 8 good docs (2 exact dups among them), 2 low-quality, 1 repetitive
ROWS = (
    [(i, "en", GOOD + f" variant {i}") for i in range(6)]
    + [(6, "en", GOOD + " variant 0"), (7, "de", GOOD + " variant 1")]
    + [(8, "en", "x"), (9, "en", "")]
    + [(10, "en", " ".join(["spam"] * 30))]
)


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


STAGES = [
    {"op": "quality", "min_quality": 0.1},
    {"op": "repetition", "max_top_2gram_frac": 0.2},
    {"op": "dedup_exact"},
    {"op": "sample", "fraction": 0.9, "salt": "p1"},
]


def _manual(spark):
    df = _df(spark)
    df = textstats.filter_by_quality(df, min_quality=0.1)
    df = textstats.filter_by_repetition(df, max_top_2gram_frac=0.2)
    losers = (
        dedup.exact_dedup(df)
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )
    df = df.join(losers, "doc_id", "left_anti")
    return sampling.hash_sample(df, 0.9, salt="p1")


def test_pipeline_equals_manual_composition(spark):
    out, stats = pipeline.run_pipeline(spark, _df(spark), STAGES)
    got = {r["doc_id"] for r in out.collect()}
    exp = {r["doc_id"] for r in _manual(spark).collect()}
    assert got == exp
    assert [s.stage for s in stats] == [s["op"] for s in STAGES]
    # accounting chains: docs_in of stage i+1 == docs_out of stage i
    assert stats[0].docs_in == len(ROWS)
    for a, b in zip(stats, stats[1:]):
        assert a.docs_out == b.docs_in
    assert stats[-1].docs_out == len(got)
    # the fixture exercises every stage: each drops at least one doc
    # except sample (which may keep all) — quality drops 8/9,
    # repetition drops 10, dedup drops one of each dup pair
    assert stats[0].dropped >= 2
    assert stats[1].dropped >= 1
    assert stats[2].dropped == 2


def test_lazy_mode_same_result_no_stats(spark):
    eager, stats = pipeline.run_pipeline(spark, _df(spark), STAGES)
    lazy, no_stats = pipeline.run_pipeline(
        spark, _df(spark), STAGES, collect_stats=False
    )
    assert no_stats == []
    assert {r["doc_id"] for r in lazy.collect()} == {
        r["doc_id"] for r in eager.collect()
    }


def test_reassembly_stage_restores_schema(spark):
    # shared line in docs 1/2/3 -> dedup_lines rewrites text but the
    # lang column and column order survive
    rows = [
        (1, "en", "shared line here\nunique one"),
        (2, "de", "shared line here\nunique two"),
        (3, "fr", "shared line here\nunique three"),
    ]
    out, stats = pipeline.run_pipeline(
        spark, _df(spark, rows), [{"op": "dedup_lines", "min_docs": 2}]
    )
    assert out.columns == ["doc_id", "lang", "text"]
    got = {r["doc_id"]: (r["lang"], r["text"]) for r in out.collect()}
    assert got == {
        1: ("en", "unique one"),
        2: ("de", "unique two"),
        3: ("fr", "unique three"),
    }
    assert stats[0].dropped == 0


def test_transform_stages_and_file_backed_stages(spark, tmp_path):
    rows = [
        (1, "en", "contact bob@example.com about the spark engine build"),
        (2, "en", "see https://blocked.example.org/page for the details"),
        (3, "en", "nothing to scrub in this perfectly ordinary text"),
    ]
    bl = str(tmp_path / "bl")
    spark.createDataFrame([("blocked.example.org",)], "domain string").write.parquet(bl)
    out, stats = pipeline.run_pipeline(
        spark,
        _df(spark, rows),
        [{"op": "block_domains", "blocklist": bl}, {"op": "pii"}],
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 3}
    assert "bob@example.com" not in got[1]
    assert stats[0].dropped == 1 and stats[1].dropped == 0


def test_neardup_stage_equals_manual_minhash_pipeline(spark):
    from text_indexer_spark.operators.cluster import (
        dedup_clusters,
        materialize_deduped,
    )

    df = _df(spark)
    sigs = dedup.minhash_signatures(df, num_hashes=16, n=3)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    exp = {
        r["doc_id"]
        for r in materialize_deduped(df, dedup_clusters(pairs)).collect()
    }
    out, stats = pipeline.run_pipeline(
        spark, df, [{"op": "dedup_neardup", "num_hashes": 16, "bands": 4}]
    )
    got = {r["doc_id"] for r in out.collect()}
    assert got == exp
    # the GOOD variants are genuine near-dups: the stage must drop some
    assert stats[0].dropped >= 1
    assert stats[0].docs_out == len(exp)


def test_remaining_stages_smoke(spark, tmp_path):
    """Every registry op not covered above runs inside a chain:
    normalize, block_words, lm_ppl, decontam, dedup_spans, mix,
    dsir_select — accounting stays chained throughout."""
    ev = str(tmp_path / "eval")
    # the only eval 5-gram present in the corpus is "and weather
    # patterns variant 0" — exactly docs 0 and 6 are contaminated
    spark.createDataFrame(
        [(100, "xx yy and weather patterns variant 0")],
        "doc_id long, text string",
    ).write.parquet(ev)
    # target deliberately CONTENT-shaped and id-less — the stage must
    # normalize it to the pipeline's (doc_id, text) columns
    tgt = str(tmp_path / "target")
    spark.createDataFrame(
        [(GOOD,)], "content string"
    ).write.parquet(tgt)
    stages = [
        {"op": "normalize"},
        {"op": "block_words", "words": ["nonexistentword"]},
        {"op": "lm_ppl", "max_ppl": 10_000.0},
        {"op": "decontam", "evalset": ev, "n": 5},
        {"op": "dedup_spans", "n": 8},
        {"op": "mix", "weights": {"en": 0.8, "de": 0.2},
         "total_tokens": 500},
        {"op": "dsir_select", "target": tgt, "n": 3, "buckets": 64},
    ]
    out, stats = pipeline.run_pipeline(spark, _df(spark), stages)
    assert [s.stage for s in stats] == [s["op"] for s in stages]
    for a, b in zip(stats, stats[1:]):
        assert a.docs_out == b.docs_in
    rows = out.collect()
    assert stats[-1].docs_out == len(rows) == 3
    assert out.columns == ["doc_id", "lang", "text"]
    # the decontam stage dropped the docs sharing the planted 5-gram
    assert stats[3].dropped >= 1


def _stage_mtimes(wd):
    import os

    return {
        d: os.path.getmtime(os.path.join(wd, d, "_SUCCESS"))
        for d in sorted(os.listdir(wd))
        if d.startswith("stage_") and not d.endswith(".json")
    }


def test_work_dir_resume_skips_sealed_stages(spark, tmp_path):
    """A rerun with an unchanged config reads every sealed stage back
    instead of recomputing; result and stats match the in-memory run."""
    import os

    wd = str(tmp_path / "work")
    out1, stats1 = pipeline.run_pipeline(
        spark, _df(spark), STAGES, work_dir=wd
    )
    mem, mem_stats = pipeline.run_pipeline(spark, _df(spark), STAGES)
    assert {r["doc_id"] for r in out1.collect()} == {
        r["doc_id"] for r in mem.collect()
    }
    assert [(s.stage, s.docs_in, s.docs_out) for s in stats1] == [
        (s.stage, s.docs_in, s.docs_out) for s in mem_stats
    ]
    markers = [f for f in os.listdir(wd) if f.endswith(".done.json")]
    assert len(markers) == len(STAGES)
    before = _stage_mtimes(wd)
    out2, stats2 = pipeline.run_pipeline(
        spark, _df(spark), STAGES, work_dir=wd
    )
    assert _stage_mtimes(wd) == before  # nothing rewritten
    assert {r["doc_id"] for r in out2.collect()} == {
        r["doc_id"] for r in out1.collect()
    }
    assert [(s.stage, s.docs_out) for s in stats2] == [
        (s.stage, s.docs_out) for s in stats1
    ]


def test_work_dir_spec_change_invalidates_downstream(spark, tmp_path):
    """Editing a mid-chain stage spec recomputes that stage and
    everything after it, but reuses the untouched prefix."""
    wd = str(tmp_path / "work")
    pipeline.run_pipeline(spark, _df(spark), STAGES, work_dir=wd)
    before = _stage_mtimes(wd)
    changed = [dict(s) for s in STAGES]
    changed[3] = {"op": "sample", "fraction": 0.5, "salt": "p2"}
    out, stats = pipeline.run_pipeline(
        spark, _df(spark), changed, work_dir=wd
    )
    after = _stage_mtimes(wd)
    for d in before:
        if d.startswith(("stage_00", "stage_01", "stage_02")):
            assert after[d] == before[d], f"{d} should be reused"
    assert after["stage_03_sample"] != before["stage_03_sample"]
    expect, _ = pipeline.run_pipeline(spark, _df(spark), changed)
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in expect.collect()
    }


def test_work_dir_column_contract_invalidates(spark, tmp_path):
    """A rerun under different id/text column names must not reuse
    stage outputs computed under the old contract."""
    wd = str(tmp_path / "work")
    rows = [(i, f"content body number {i} with several more words here")
            for i in range(8)]
    base = spark.createDataFrame(rows, "doc_id long, text string")
    pipeline.run_pipeline(
        spark, base, [{"op": "sample", "fraction": 0.5, "salt": "x"}],
        work_dir=wd,
    )
    before = _stage_mtimes(wd)
    renamed = base.withColumnRenamed("doc_id", "uid")
    out, _ = pipeline.run_pipeline(
        spark, renamed, [{"op": "sample", "fraction": 0.5, "salt": "x"}],
        id_col="uid", work_dir=wd,
    )
    assert _stage_mtimes(wd)["stage_00_sample"] != before["stage_00_sample"]
    assert out.columns == ["uid", "text"]


def test_work_dir_unsealed_stage_recomputes(spark, tmp_path):
    """A missing marker (crash between parquet write and seal) reruns
    that stage and invalidates the suffix, never serving partial data."""
    import os

    wd = str(tmp_path / "work")
    out1, _ = pipeline.run_pipeline(spark, _df(spark), STAGES, work_dir=wd)
    ids1 = {r["doc_id"] for r in out1.collect()}  # snapshot BEFORE the
    # rerun: the rerun overwrites the stage parquet, so a stale handle
    # from the first run is invalid afterwards (normal Spark semantics)
    os.remove(os.path.join(wd, "stage_01_repetition.done.json"))
    before = _stage_mtimes(wd)
    out2, _ = pipeline.run_pipeline(spark, _df(spark), STAGES, work_dir=wd)
    after = _stage_mtimes(wd)
    assert after["stage_00_quality"] == before["stage_00_quality"]
    assert after["stage_01_repetition"] != before["stage_01_repetition"]
    assert {r["doc_id"] for r in out2.collect()} == ids1


def test_chunk_pack_terminal_stage(spark):
    """Terminal chunk→pack→assemble: every corpus token survives into
    exactly one training sequence, sequences respect the budget, and
    the result is partition-independent."""
    import re

    from text_indexer_spark.tokenizer import TOKEN_DELIM_REGEX

    delim = re.compile(TOKEN_DELIM_REGEX)
    stages = [
        {"op": "quality", "min_quality": 0.1},
        {"op": "chunk_pack", "max_tokens": 8, "budget": 16, "buckets": 4},
    ]
    out, stats = pipeline.run_pipeline(spark, _df(spark), stages)
    assert out.columns == ["bucket", "seq_idx", "n_tokens", "text"]
    rows = out.collect()
    assert stats[-1].docs_out == len(rows)
    # token conservation vs the quality-filtered corpus
    kept = pipeline.run_pipeline(
        spark, _df(spark), [{"op": "quality", "min_quality": 0.1}]
    )[0].collect()
    exp_tokens = sorted(
        t for r in kept for t in delim.split(r["text"].lower()) if t
    )
    got_tokens = sorted(
        t for r in rows for t in delim.split(r["text"].lower()) if t
    )
    assert got_tokens == exp_tokens
    for r in rows:
        assert r["n_tokens"] <= 16
        assert r["n_tokens"] == len([t for t in delim.split(r["text"]) if t])
    # deterministic across partitionings
    out7 = pipeline.run_pipeline(
        spark, _df(spark).repartition(7), stages
    )[0]
    assert sorted(map(tuple, out7.collect())) == sorted(map(tuple, rows))
    # terminal enforcement
    with pytest.raises(ValueError, match="LAST stage"):
        pipeline.validate_stages(
            [{"op": "chunk_pack"}, {"op": "quality"}]
        )


def test_validation(spark):
    with pytest.raises(ValueError):
        pipeline.validate_stages([])
    with pytest.raises(ValueError):
        pipeline.validate_stages([{"min_quality": 0.3}])
    with pytest.raises(ValueError):
        pipeline.validate_stages([{"op": "no_such_stage"}])
    with pytest.raises(ValueError):
        pipeline.run_pipeline(spark, _df(spark), [{"op": "bogus"}])
    # missing required param fails BEFORE any job runs
    with pytest.raises(ValueError, match="max_ppl"):
        pipeline.validate_stages([{"op": "lm_ppl"}])
    # a typo'd knob must reject the config, not silently use a default
    with pytest.raises(ValueError, match="min_qualty"):
        pipeline.validate_stages([{"op": "quality", "min_qualty": 0.9}])


def test_cli_pipeline_requires_real_ids_for_dedup(spark, tmp_path, capsys):
    """A doc_id-less corpus + a dedup stage must refuse up front: a
    content-hash id collides exactly on the duplicates dedup exists to
    find (the silent-no-op failure mode found in review)."""
    from text_indexer_spark import cli

    src = str(tmp_path / "noid")
    spark.createDataFrame(
        [("same text",), ("same text",)], "text string"
    ).write.parquet(src)
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps([{"op": "dedup_exact"}]))
    with pytest.raises(SystemExit, match="UNIQUE doc ids"):
        cli.main(
            ["--master", "local[4]", "pipeline", "--corpus", src,
             "--out", str(tmp_path / "o"), "--config", str(cfg)]
        )


def test_cli_pipeline(spark, tmp_path, capsys):
    from text_indexer_spark import cli

    src = str(tmp_path / "corpus")
    _df(spark).write.parquet(src)
    cfg = tmp_path / "stages.json"
    cfg.write_text(json.dumps({"stages": STAGES}))
    out = str(tmp_path / "cleaned")
    rc = cli.main(
        ["--master", "local[4]", "pipeline", "--corpus", src,
         "--out", out, "--config", str(cfg)]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    exp = {r["doc_id"] for r in _manual(spark).collect()}
    assert rep["rows_out"] == len(exp)
    assert [s["op"] for s in rep["stages"]] == [s["op"] for s in STAGES]
    assert rep["stages"][0]["docs_in"] == len(ROWS)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == exp

"""spark-submit CLI drive: build → query → merge → sync through the real
argv interface (subprocess-free: main() is called in-process against the
shared test session via --master)."""

from __future__ import annotations

import json
import os

import pytest

from text_indexer_spark import cli
from text_indexer_spark.corpus import golden_corpus


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "corpus")
    golden_corpus(spark, snapshot=1).write.parquet(d)
    return d


def test_cli_build_query_merge(spark, corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    rc = cli.main(["--master", "local[4]", "build", "--corpus", corpus_dir,
                   "--index", idx, "--shards", "2"])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["n_docs"] == 5

    rc = cli.main(["--master", "local[4]", "query", "--index", idx,
                   "--query", "me, i, tyler", "-k", "5"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["path"] for l in lines] == ["fight-club.txt"]
    assert lines[0]["score"] > 0

    out = str(tmp_path / "tm")
    rc = cli.main(["--master", "local[4]", "merge", "--index", idx, "--out", out])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["terms"] > 0
    assert os.path.isdir(out)


def test_cli_sync(spark, corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx2")
    cli.main(["--master", "local[4]", "build", "--corpus", corpus_dir, "--index", idx])
    capsys.readouterr()

    src2 = str(tmp_path / "src2")
    golden_corpus(spark, snapshot=2).write.parquet(src2)
    out_cat, out_post = str(tmp_path / "cat2"), str(tmp_path / "post2")
    # postings parquet from the built index is the sharded postings dir
    rc = cli.main([
        "--master", "local[4]", "sync",
        "--catalog", os.path.join(idx, "catalog"),
        "--postings", os.path.join(idx, "postings"),
        "--source", src2,
        "--out-catalog", out_cat, "--out-postings", out_post,
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["diff"] == {"reindex": 1}
    post2 = spark.read.parquet(out_post)
    assert post2.filter("term = 'whitman'").count() == 1


def test_cli_sync_index(spark, corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx3")
    cli.main(["--master", "local[4]", "build", "--corpus", corpus_dir, "--index", idx])
    capsys.readouterr()
    src2 = str(tmp_path / "src3")
    golden_corpus(spark, snapshot=2).write.parquet(src2)
    out = str(tmp_path / "idx3_v2")
    rc = cli.main([
        "--master", "local[4]", "sync-index",
        "--index", idx, "--source", src2, "--out", out,
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["version"] == 2
    assert res["synced"]["reindex"] == 1
    # new index serves the modified content
    capsys.readouterr()
    rc = cli.main([
        "--master", "local[4]", "query", "--index", out,
        "--query", "whitman", "-k", "5",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert any(h.get("score") for h in lines)


def test_cli_dedup(spark, tmp_path, capsys):
    """dedup subcommand: plant an exact duplicate + a near-duplicate;
    the cleaned corpus drops the dupes and keeps everything else."""
    from pyspark.sql import functions as F

    base = golden_corpus(spark, snapshot=1)
    one = base.orderBy("repo", "path").first()
    planted = spark.createDataFrame(
        [
            (one["repo"], "zz/exact_copy.txt", "c9", one["lang"], one["content"]),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "corpus")
    base.unionByName(planted).write.parquet(d)
    out = str(tmp_path / "clean")
    rc = cli.main(["dedup", "--corpus", d, "--out", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_in"] == base.count() + 1
    assert stats["rows_dropped"] >= 1  # at least the planted exact dup
    kept = spark.read.parquet(out)
    # exactly one of the two identical contents survives
    assert kept.filter(F.col("content") == one["content"]).count() == 1


def test_cli_dsl_search(spark, corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx_pos")
    rc = cli.main(["--master", "local[4]", "build", "--corpus", corpus_dir,
                   "--index", idx, "--shards", "2", "--positions"])
    assert rc == 0
    capsys.readouterr()

    # ranked: phrase filter + boolean NOT, scored by the stored weights
    rc = cli.main(["--master", "local[4]", "search", "--index", idx,
                   "--query", '"be curious" AND NOT tyler', "-k", "5"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["path"] for l in lines] == ["temp_file.txt"]
    assert lines[0]["score"] > 0

    # unranked listing (prefix leaf only -> no score terms)
    rc = cli.main(["--master", "local[4]", "search", "--index", idx,
                   "--query", "tyler*", "--unranked"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert "fight-club.txt" in {l["path"] for l in lines}
    assert all("score" not in l for l in lines)


def test_cli_clean(spark, tmp_path, capsys):
    src = str(tmp_path / "dirty")
    rows = [
        (1, "a solid paragraph of reasonable natural language text that "
            "keeps going long enough to clear the quality length gate and "
            "mentions nothing from any benchmark at all " * 3, "en"),
        (2, "boiler plate\nboiler plate\nboiler plate\nboiler plate", "en"),
        (3, "!!!! ???? ,,,, ....", "en"),  # junk -> quality filter
        (4, "the secret benchmark sentence appears here verbatim today "
            "surrounded by plenty of otherwise fine filler words that "
            "easily clear every quality and repetition threshold " * 3, "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(src)
    ev = str(tmp_path / "eval")
    spark.createDataFrame(
        [(100, "the secret benchmark sentence appears here verbatim today")],
        "doc_id long, text string",
    ).write.parquet(ev)

    out = str(tmp_path / "cleaned")
    rc = cli.main([
        "--master", "local[4]", "clean", "--corpus", src, "--out", out,
        "--evalset", ev, "--decontam-n", "6",
        "--max-dup-line-frac", "0.5",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_in"] == 4
    assert stats["contaminated"] == 1
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1}


def test_cli_grep_lifecycle(spark, corpus_dir, tmp_path, capsys):
    """grep-ingest → grep (indexed) ≡ grep (full scan) → sync with a
    tombstone → compact, all through argv."""
    tri = str(tmp_path / "tri")
    rc = cli.main(["--master", "local[4]", "grep-ingest",
                   "--corpus", corpus_dir, "--tri-index", tri])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["version"] == 1

    args_common = ["--master", "local[4]", "grep", "--corpus", corpus_dir,
                   "--pattern", "T[a-z]+ler"]
    rc = cli.main(args_common + ["--tri-index", tri])
    assert rc == 0
    indexed = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    rc = cli.main(args_common)
    assert rc == 0
    full = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert indexed == full and len(indexed) >= 1

    # tombstone every doc -> indexed grep returns nothing
    import pyspark.sql.functions as F
    ids = str(tmp_path / "ids")
    spark.read.parquet(corpus_dir).select(
        F.xxhash64("repo", "path").alias("doc_id")
    ).write.parquet(ids)
    empty_add = str(tmp_path / "empty")
    spark.read.parquet(corpus_dir).limit(0).write.parquet(empty_add)
    rc = cli.main(["--master", "local[4]", "grep-ingest", "--corpus", empty_add,
                   "--tri-index", tri, "--removed-ids", ids])
    assert rc == 0
    capsys.readouterr()
    rc = cli.main(args_common + ["--tri-index", tri])
    assert rc == 0
    assert capsys.readouterr().out.strip() == ""

    rc = cli.main(["--master", "local[4]", "grep-compact", "--tri-index", tri])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["version"] == 3


def test_cli_grep_pushdown(spark, corpus_dir, tmp_path, capsys):
    """grep --pushdown ≡ grep (join form) ≡ full scan, including with a
    cap that forces the join fallback."""
    tri = str(tmp_path / "tri_p")
    rc = cli.main(["--master", "local[4]", "grep-ingest",
                   "--corpus", corpus_dir, "--tri-index", tri])
    assert rc == 0
    capsys.readouterr()
    args_common = ["--master", "local[4]", "grep", "--corpus", corpus_dir,
                   "--pattern", "T[a-z]+ler"]
    outs = []
    for extra in ([], ["--tri-index", tri],
                  ["--tri-index", tri, "--pushdown"],
                  ["--tri-index", tri, "--pushdown", "--pushdown-cap", "1"]):
        rc = cli.main(args_common + extra)
        assert rc == 0
        outs.append([json.loads(l)
                     for l in capsys.readouterr().out.strip().splitlines()])
    assert outs[0] == outs[1] == outs[2] == outs[3] and len(outs[0]) >= 1


def test_cli_grep_line_numbers(spark, corpus_dir, tmp_path, capsys):
    """grep -n: per-line rows, indexed ≡ full scan, and the lines/line
    numbers agree with a Python re reference over the same parquet."""
    import re

    tri = str(tmp_path / "tri_n")
    rc = cli.main(["--master", "local[4]", "grep-ingest",
                   "--corpus", corpus_dir, "--tri-index", tri])
    assert rc == 0
    capsys.readouterr()

    pattern = "count_2"
    args_common = ["--master", "local[4]", "grep", "--corpus", corpus_dir,
                   "--pattern", pattern, "-n"]
    rc = cli.main(args_common + ["--tri-index", tri])
    assert rc == 0
    indexed = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    rc = cli.main(args_common)
    assert rc == 0
    full = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert indexed == full and len(indexed) >= 2  # two lines in Example.kt

    import pyspark.sql.functions as F
    want = []
    for r in spark.read.parquet(corpus_dir).select(
        F.xxhash64("repo", "path").alias("doc_id"), "content"
    ).collect():
        for i, line in enumerate(r["content"].split("\n"), start=1):
            if re.search(pattern, line):
                want.append({"doc_id": r["doc_id"], "line_no": i, "line": line})
    key = lambda h: (h["doc_id"], h["line_no"])
    assert sorted(indexed, key=key) == sorted(want, key=key)


def test_cli_clean_bloom_equals_exact(spark, tmp_path, capsys):
    src = str(tmp_path / "dirty_b")
    rows = [
        (1, "a solid paragraph of reasonable natural language text that "
            "keeps going long enough to clear the quality length gate and "
            "mentions nothing from any benchmark at all " * 3, "en"),
        (4, "the secret benchmark sentence appears here verbatim today "
            "surrounded by plenty of otherwise fine filler words that "
            "easily clear every quality and repetition threshold " * 3, "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(src)
    ev = str(tmp_path / "eval_b")
    spark.createDataFrame(
        [(100, "the secret benchmark sentence appears here verbatim today")],
        "doc_id long, text string",
    ).write.parquet(ev)

    outs = {}
    for mode, extra in (("exact", []), ("bloom", ["--decontam-bloom"])):
        out = str(tmp_path / f"cleaned_{mode}")
        rc = cli.main([
            "--master", "local[4]", "clean", "--corpus", src, "--out", out,
            "--evalset", ev, "--decontam-n", "6",
            "--max-dup-line-frac", "0.5", *extra,
        ])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["contaminated"] == 1
        outs[mode] = sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        )
    assert outs["exact"] == outs["bloom"] == [1]


def test_cli_grep_multi_pattern_batch(spark, tmp_path, capsys):
    src = str(tmp_path / "grepsrc")
    spark.createDataFrame(
        [(1, "alpha query beta"), (2, "query stream query"), (3, "nothing")],
        "doc_id long, text string",
    ).write.parquet(src)
    rc = cli.main([
        "--master", "local[4]", "grep", "--corpus", src,
        "--pattern", "quer[a-z]+", "--pattern", "s.re",
    ])
    assert rc == 0
    got = {
        (j["pattern"], j["doc_id"]): j["n_matches"]
        for j in map(json.loads, capsys.readouterr().out.strip().splitlines())
    }
    assert got == {
        ("quer[a-z]+", 1): 1, ("quer[a-z]+", 2): 2, ("s.re", 2): 1,
    }
    # -n with multiple patterns must refuse
    with pytest.raises(SystemExit):
        cli.main([
            "grep", "--corpus", src, "-n",
            "--pattern", "a", "--pattern", "b",
        ])


def test_cli_dedup_lines(spark, tmp_path, capsys):
    src = str(tmp_path / "linesrc")
    spark.createDataFrame(
        [
            (1, "all rights reserved\nkeep me one"),
            (2, "all rights reserved\nkeep me two"),
            (3, "all rights reserved"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "lineout")
    rc = cli.main([
        "--master", "local[4]", "dedup-lines", "--corpus", src, "--out", out,
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {
        "rows_in": 3, "rows_kept": 2, "rows_dropped": 1, "shared_lines": 1,
    }
    kept = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    assert kept == {1: "keep me one", 2: "keep me two"}


def test_cli_dedup_spans(spark, tmp_path, capsys):
    boiler = "one two three four five six seven eight"
    src = str(tmp_path / "spansrc")
    spark.createDataFrame(
        [
            (1, boiler + " unique tail here"),
            (2, "other head words " + boiler),
            (3, boiler),  # nothing but the repeated span -> dropped
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "spanout")
    rc = cli.main([
        "--master", "local[4]", "dedup-spans", "--corpus", src,
        "--out", out, "--n", "8",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {
        "rows_in": 3, "rows_kept": 2, "rows_dropped": 1,
        "tokens_total": 30, "tokens_removed": 24,
    }
    kept = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    assert kept == {1: "unique tail here", 2: "other head words"}


def test_cli_clean_max_ppl_drops_lm_outlier(spark, tmp_path, capsys):
    base = ("a solid paragraph of reasonable natural language text that "
            "keeps going long enough to clear the quality length gate "
            "and reads like every other document in this corpus " * 3)
    rows = [(i, base, "en") for i in range(1, 9)]
    # the outlier clears quality/repetition but its bigrams are unique
    rows.append((99, "zebra quartz vortex nimbus oracle keeps going long "
                     "enough to clear the quality length gate with fully "
                     "novel pairings every single time it runs onward "
                     "through distinct vocabulary items again " * 3, "en"))
    src = str(tmp_path / "ppl_src")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(src)
    out = str(tmp_path / "ppl_out")
    rc = cli.main([
        "--master", "local[4]", "clean", "--corpus", src, "--out", out,
        "--max-dup-line-frac", "1.0", "--max-top-2gram-frac", "1.0",
        "--max-ppl", "3",
    ])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 99 not in kept and kept == set(range(1, 9))


def test_cli_ann_lifecycle(spark, tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    src = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(src)
    idx = str(tmp_path / "ivf")
    rc = cli.main([
        "--master", "local[4]", "ann-ingest", "--embeddings", src,
        "--index", idx, "--centroids", "4", "--quantize",
    ])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["quantized"] is True and meta["n_vectors"] == 60

    rc = cli.main([
        "--master", "local[4]", "ann-query", "--index", idx,
        "--query-ids", "0,1", "-k", "5", "--n-probe", "4",
    ])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 10  # 2 queries x k=5
    # full probe + int8 certified path == brute force
    from text_indexer_spark.operators.similarity import cosine_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(src)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    brute = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    assert {(h["query_id"], h["vec_id"], h["cos"]) for h in hits} == brute
    # exactly one of --queries / --query-ids
    with pytest.raises(SystemExit):
        cli.main(["ann-query", "--index", idx])

    # --- maintenance: upsert (replace + insert), delete, compact,
    # vacuum — the served view tracks the logical corpus throughout
    rows2 = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(55, 70)
    ]
    src2 = str(tmp_path / "emb2")
    spark.createDataFrame(
        rows2, "vec_id long, embedding array<float>"
    ).write.parquet(src2)
    rc = cli.main([
        "--master", "local[4]", "ann-upsert", "--index", idx,
        "--embeddings", src2, "--delete-ids", "3,4",
    ])
    assert rc == 0
    up = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert up["version"] == 2 and up["n_upserts"] == 15 and up["n_deletes"] == 2

    logical = (
        emb.filter(~F.col("vec_id").isin(3, 4))
        .filter(F.col("vec_id") < 55)
        .unionByName(spark.read.parquet(src2))
    )
    brute2 = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in cosine_topk(logical, queries, k=5).collect()
    }
    rc = cli.main([
        "--master", "local[4]", "ann-query", "--index", idx,
        "--query-ids", "0,1", "-k", "5", "--n-probe", "4",
    ])
    assert rc == 0
    hits2 = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {(h["query_id"], h["vec_id"], h["cos"]) for h in hits2} == brute2

    rc = cli.main(["--master", "local[4]", "ann-stats", "--index", idx])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_segments"] == 2 and st["n_tombstone_lists"] == 1
    assert st["n_live"] == 68 and st["quantized"] is True

    rc = cli.main(["--master", "local[4]", "ann-compact", "--index", idx])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["version"] == 3
    rc = cli.main([
        "--master", "local[4]", "vacuum", "--ann-index", idx,
        "--keep-last", "1",
    ])
    assert rc == 0
    removed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["removed"]
    assert "seg_000002" in removed
    rc = cli.main([
        "--master", "local[4]", "ann-query", "--index", idx,
        "--query-ids", "0,1", "-k", "5", "--n-probe", "4",
    ])
    assert rc == 0
    hits3 = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {(h["query_id"], h["vec_id"], h["cos"]) for h in hits3} == brute2


def test_cli_bpe_train_encode(spark, tmp_path, capsys):
    """bpe-train persists the rank-ordered merge list; bpe-encode
    replays it over a corpus — lifecycle wiring ≡ the library calls
    (the library itself is oracle-verified in test_bpe / the driver
    gates)."""
    from text_indexer_spark.operators import bpe

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    ).write.parquet(src)

    vocab = str(tmp_path / "vocab")
    rc = cli.main(["--master", "local[4]", "bpe-train", "--corpus", src,
                   "--vocab", vocab, "--merges", "6"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_merges_learned"] == 6
    persisted = json.load(open(os.path.join(vocab, "merges.json")))
    lib_merges = bpe.train_bpe(
        spark.read.parquet(src), n_merges=6
    )
    assert [tuple(m) for m in persisted["merges"]] == lib_merges

    out = str(tmp_path / "enc")
    rc = cli.main(["--master", "local[4]", "bpe-encode", "--corpus", src,
                   "--vocab", vocab, "--out", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 2 and stats["n_merges"] == 6
    got = {
        r["doc_id"]: r["pieces"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: r["pieces"]
        for r in bpe.encode_docs_bpe(
            spark.read.parquet(src), lib_merges
        ).collect()
    }
    assert got == want

    # missing vocab dir fails loudly, not with an empty encode
    with pytest.raises(SystemExit):
        cli.main(["--master", "local[4]", "bpe-encode", "--corpus", src,
                  "--vocab", str(tmp_path / "nope"), "--out", out])


def test_cli_media_resize(spark, tmp_path, capsys):
    """media-resize resizes image payloads and passes non-images
    through byte-identical, reporting counts as one JSON line."""
    import numpy as np

    from text_indexer_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        encode_wav,
    )

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    wav = encode_wav(np.array([0, 1000, -1000], dtype=np.int16))
    media = str(tmp_path / "media")
    spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(6, 4, px))),
            (2, bytearray(wav)),
        ],
        "media_id long, payload binary",
    ).write.parquet(media)

    out = str(tmp_path / "resized")
    rc = cli.main(
        ["--master", "local[4]", "media-resize", "--media", media,
         "--out", out, "--width", "3", "--height", "2"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {
        "rows": 2, "images_resized": 1, "passthrough": 1,
        "width": 3, "height": 2,
    }
    rows = {r["media_id"]: r for r in spark.read.parquet(out).collect()}
    w, h, _ = decode_bmp(bytes(rows[1]["payload"]))
    assert (w, h) == (3, 2) and rows[1]["resized"]
    assert bytes(rows[2]["payload"]) == bytes(wav)  # byte-identical
    assert rows[2]["kind"] == "audio" and not rows[2]["resized"]


def test_cli_vacuum_line_counts(spark, tmp_path, capsys):
    """vacuum --line-counts applies retention to the line-count store;
    bare vacuum (no target) exits with a usage error."""
    from text_indexer_spark.streaming.linecount_stream import (
        commit_line_counts,
        load_line_counts_version,
    )

    counts_dir = str(tmp_path / "counts")
    os.makedirs(counts_dir)
    for b in range(3):
        commit_line_counts(
            spark.createDataFrame(
                [(f"l{b}", 1)], "line string, n_docs long"
            ),
            counts_dir, txn_app="ck", txn_batch_id=b,
        )
    rc = cli.main(
        ["--master", "local[4]", "vacuum", "--line-counts", counts_dir,
         "--keep-last", "1"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [os.path.basename(p) for p in rep["removed"]] == [
        "counts_v000001", "counts_v000002",
    ]
    assert load_line_counts_version(counts_dir) == 3

    with pytest.raises(SystemExit):
        cli.main(["--master", "local[4]", "vacuum"])


def test_cli_vacuum_trigram(spark, corpus_dir, tmp_path, capsys):
    """vacuum --trigram sweeps unreachable LSM files after grep-compact."""
    tri = str(tmp_path / "tri")
    cli.main(["--master", "local[4]", "grep-ingest",
              "--corpus", corpus_dir, "--tri-index", tri])
    cli.main(["--master", "local[4]", "grep-compact", "--tri-index", tri])
    capsys.readouterr()
    rc = cli.main(
        ["--master", "local[4]", "vacuum", "--trigram", tri,
         "--keep-last", "1"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "seg_000001" in rep["removed"]
    assert os.path.exists(os.path.join(tri, "seg_000002"))


def test_cli_hot_items(spark, tmp_path, capsys):
    """hot-items prints exact heavy-hitter counts, hottest first."""
    d = str(tmp_path / "hh")
    spark.createDataFrame(
        [(i, "the common the words the filler%d" % i) for i in range(10)],
        "doc_id long, text string",
    ).write.parquet(d)
    rc = cli.main(
        ["--master", "local[4]", "hot-items", "--corpus", d,
         "--min-frac", "0.15"]
    )
    assert rc == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    # 60 tokens total: 'the' 30 (0.5), 'common'/'words' 10 (0.167)
    assert lines[0] == {"item": "the", "n": 30}
    assert {(l["item"], l["n"]) for l in lines} == {
        ("the", 30), ("common", 10), ("words", 10),
    }


def test_cli_ann_sync_drains_drop_dir(spark, tmp_path, capsys):
    """ann-sync: drop-dir feed → one committed store version; the
    checkpoint makes a re-run a no-op (version unchanged), and the
    served view reflects the upsert + delete."""
    import numpy as np
    import os
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(20)]
    src = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(src)
    idx = str(tmp_path / "ivf")
    assert cli.main([
        "--master", "local[4]", "ann-ingest", "--embeddings", src,
        "--index", idx, "--centroids", "2",
    ]) == 0
    capsys.readouterr()

    drop = str(tmp_path / "drops")
    os.makedirs(drop)
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    new_vec = [float(x) for x in rng.normal(size=6)]
    spark.createDataFrame(
        [(30, new_vec, t0, False), (3, None, t0, True)],
        "vec_id long, embedding array<float>, event_time timestamp, deleted boolean",
    ).coalesce(1).write.mode("append").parquet(drop)
    ck = str(tmp_path / "ck")
    assert cli.main([
        "--master", "local[4]", "ann-sync", "--index", idx,
        "--drop-dir", drop, "--checkpoint", ck,
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 2

    from text_indexer_spark.operators.vecstore import resolved_vectors
    live = {r["vec_id"] for r in resolved_vectors(spark, idx).collect()}
    assert 30 in live and 3 not in live and len(live) == 20

    # re-run: checkpoint suppresses the processed file -> no new version
    assert cli.main([
        "--master", "local[4]", "ann-sync", "--index", idx,
        "--drop-dir", drop, "--checkpoint", ck,
    ]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["version"] == 0  # no batch seen this run
    assert {r["vec_id"] for r in resolved_vectors(spark, idx).collect()} == live

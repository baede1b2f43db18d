"""DSIR importance resampling (operators/dsir.py): hashed-feature
buckets vs hashlib, scores vs a pure-Python oracle, parallelism
independence, target-affinity, deterministic Gumbel top-k, guards."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import dsir
from text_indexer_spark.tokenizer import TOKEN_DELIM_REGEX

_DELIM = re.compile(TOKEN_DELIM_REGEX)
B = 64
K = 0.5


def _py_tokens(t):
    return [x for x in _DELIM.split((t or "").lower()) if x]


def _py_grams(t):
    toks = _py_tokens(t)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(g, n_buckets=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets


def _py_counts(rows, n_buckets=B):
    out: dict[int, int] = {}
    for _, t in rows:
        for g in _py_grams(t):
            b = _py_bucket(g, n_buckets)
            out[b] = out.get(b, 0) + 1
    return out


def _py_scores(corpus_rows, target_rows, n_buckets=B, k=K):
    ct, cr = _py_counts(target_rows, n_buckets), _py_counts(corpus_rows, n_buckets)
    nt, nr = sum(ct.values()), sum(cr.values())
    kb = k * n_buckets
    ilam = {
        b: round(
            (
                math.log((ct.get(b, 0) + k) / (nt + kb))
                - math.log((cr.get(b, 0) + k) / (nr + kb))
            )
            * dsir.LAMBDA_SCALE
        )
        for b in range(n_buckets)
    }
    out = {}
    for i, t in corpus_rows:
        feats: dict[int, int] = {}
        for g in _py_grams(t):
            b = _py_bucket(g, n_buckets)
            feats[b] = feats.get(b, 0) + 1
        if not feats:
            continue
        s = sum(c * ilam[b] for b, c in feats.items())
        out[i] = (sum(feats.values()), s / dsir.LAMBDA_SCALE)
    return out


def _py_key(i, logw, salt="dsir1"):
    h = int(hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / float(1 << 32)
    return round(logw - math.log(-math.log(u)), 5)


# two disjoint styles: A = spark/index prose, B = cooking prose
A_ROWS = [
    (i, f"spark shards compress the index build quickly run {i % 5}")
    for i in range(20)
]
B_ROWS = [
    (100 + i, f"simmer the onion broth slowly add butter salt {i % 5}")
    for i in range(20)
]
CORPUS = A_ROWS + B_ROWS
TARGET = [(900 + j, t) for j, (_, t) in enumerate(A_ROWS[:6])]


def _df(spark, rows, parts=1):
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(
        parts
    )


def test_hash_bucket_matches_hashlib(spark):
    grams = [("alpha",), ("beta gamma",), ("ünïcode",), ("",)]
    df = spark.createDataFrame(grams, "g string").select(
        "g", dsir.hash_bucket(F.col("g"), B).alias("b")
    )
    for r in df.collect():
        assert r["b"] == _py_bucket(r["g"])


def test_scores_match_python_oracle(spark):
    exp = _py_scores(CORPUS, TARGET)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir.dsir_scores(
            _df(spark, CORPUS), _df(spark, TARGET), n_buckets=B, k=K
        ).collect()
    }
    assert set(got) == set(exp)
    for i, (nf, lw) in exp.items():
        assert got[i][0] == nf
        assert got[i][1] == pytest.approx(lw, abs=2e-5)


def test_scores_partition_independent(spark):
    one = dsir.dsir_scores(
        _df(spark, CORPUS, 1), _df(spark, TARGET, 1), n_buckets=B, k=K
    ).collect()
    seven = dsir.dsir_scores(
        _df(spark, CORPUS, 7), _df(spark, TARGET, 3), n_buckets=B, k=K
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, seven))


def test_target_style_scores_higher_and_resample_prefers_it(spark):
    scores = {
        r["doc_id"]: r["logw"]
        for r in dsir.dsir_scores(
            _df(spark, CORPUS), _df(spark, TARGET), n_buckets=B, k=K
        ).collect()
    }
    mean_a = sum(scores[i] for i, _ in A_ROWS) / len(A_ROWS)
    mean_b = sum(scores[i] for i, _ in B_ROWS) / len(B_ROWS)
    assert mean_a > mean_b + 1.0  # clearly separated styles
    picked = dsir.dsir_resample(
        _df(spark, CORPUS), _df(spark, TARGET), n=10, n_buckets=B, k=K
    ).collect()
    a_ids = {i for i, _ in A_ROWS}
    assert sum(1 for r in picked if r["doc_id"] in a_ids) >= 8


def test_resample_matches_python_and_partitioning(spark):
    exp_scores = _py_scores(CORPUS, TARGET)
    exp = sorted(
        ((_py_key(i, lw), -i) for i, (_, lw) in exp_scores.items()),
        reverse=True,
    )[:10]
    exp_ids = [-mi for _, mi in exp]
    for parts in (1, 7):
        got = dsir.dsir_resample(
            _df(spark, CORPUS, parts), _df(spark, TARGET), n=10, n_buckets=B, k=K
        ).collect()
        assert [r["doc_id"] for r in got] == exp_ids
        for r in got:
            assert r["key"] == pytest.approx(
                _py_key(r["doc_id"], exp_scores[r["doc_id"]][1]), abs=2e-5
            )


def test_select_returns_original_rows(spark):
    out = dsir.dsir_select(
        _df(spark, CORPUS), _df(spark, TARGET), n=10, n_buckets=B, k=K
    )
    assert out.columns == ["doc_id", "text"]
    rows = out.collect()
    assert len(rows) == 10
    by_id = dict(CORPUS)
    for r in rows:
        assert r["text"] == by_id[r["doc_id"]]


def test_empty_docs_absent_and_guards(spark):
    c = _df(spark, [(1, "real words here"), (2, ""), (3, None)])
    t = _df(spark, [(9, "real words")])
    assert {
        r["doc_id"] for r in dsir.dsir_scores(c, t, n_buckets=B).collect()
    } == {1}
    with pytest.raises(ValueError):
        dsir.doc_features(c, n_buckets=0)
    with pytest.raises(ValueError):
        dsir.log_ratio_table(
            dsir.bucket_counts(t, B), dsir.bucket_counts(c, B), B, k=0.0
        )
    with pytest.raises(ValueError):
        dsir.dsir_resample(c, t, n=0, n_buckets=B)


def test_cli_select(spark, tmp_path, capsys):
    """select subcommand: target/corpus parquet in, selected rows out,
    identical to the library-level Gumbel top-k."""
    import json

    from text_indexer_spark import cli

    cd, td = str(tmp_path / "corpus"), str(tmp_path / "target")
    spark.createDataFrame(CORPUS, "doc_id long, text string").write.parquet(cd)
    spark.createDataFrame(TARGET, "doc_id long, text string").write.parquet(td)
    out = str(tmp_path / "picked")
    rc = cli.main(
        ["--master", "local[4]", "select", "--corpus", cd, "--target", td,
         "--out", out, "--n", "10", "--buckets", str(B)]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_selected"] == 10
    expect = {
        r["doc_id"]
        for r in dsir.dsir_resample(
            _df(spark, CORPUS), _df(spark, TARGET), n=10, n_buckets=B
        ).collect()
    }
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == expect


def test_scores_plan_no_python_no_cartesian(spark):
    plan = (
        dsir.dsir_scores(
            _df(spark, CORPUS), _df(spark, TARGET), n_buckets=B, k=K
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the feature aggregation must combine map-side
    assert "partial_count" in plan or "partial_sum" in plan

"""Data-mixture sampling (operators/mixing.py): rate arithmetic against
a pure-Python oracle, determinism across partitionings, budget-hit in
expectation, and the allowlist/under-resourced-source contracts."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import mixing
from text_indexer_spark.tokenizer import TOKEN_DELIM_REGEX, tokenize_column

_DELIM = re.compile(TOKEN_DELIM_REGEX)


def _py_tokens(t: str) -> list[str]:
    return [x for x in _DELIM.split((t or "").lower()) if x]


def _py_u(key, salt: str) -> float:
    h = hashlib.md5(f"{key}|{salt}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


def _py_mixture(rows, weights, total_tokens, salt="mix1"):
    """Oracle: kept doc_ids and the per-source rate table."""
    tot_w = sum(weights.values())
    avail: dict[str, int] = {}
    for _, src, text in rows:
        avail[src] = avail.get(src, 0) + len(_py_tokens(text))
    rates = {}
    for s, w in weights.items():
        target = total_tokens * w / tot_w
        a = avail.get(s, 0)
        rates[s] = min(1.0, target / a) if a > 0 else 0.0
    kept = {
        i
        for i, src, _ in rows
        if src in rates and _py_u(i, salt) < rates[src]
    }
    return kept, rates, avail


ROWS = [
    (i, "en", "english words repeat here filler%d more text" % i)
    for i in range(40)
] + [
    (100 + i, "fr", "quelques mots francais ici %d" % i) for i in range(10)
] + [
    (200 + i, "de", "deutsche worte %d" % i) for i in range(5)
] + [
    (300, "xx", "unweighted source must drop entirely")
]


def _docs(spark, parts=4):
    return spark.createDataFrame(
        ROWS, "doc_id long, lang string, text string"
    ).repartition(parts)


WEIGHTS = {"en": 0.5, "fr": 0.3, "de": 0.2}


def test_mixture_rates_match_oracle(spark):
    total = 120
    _, rates, avail = _py_mixture(ROWS, WEIGHTS, total)
    got = {
        r["lang"]: (r["avail_tokens"], r["target_tokens"], r["rate"])
        for r in mixing.mixture_rates(_docs(spark), WEIGHTS, total).collect()
    }
    assert set(got) == set(WEIGHTS)
    for s in WEIGHTS:
        a, t, r = got[s]
        assert a == avail.get(s, 0)
        assert t == pytest.approx(total * WEIGHTS[s] / 1.0, rel=1e-12)
        assert r == pytest.approx(rates[s], rel=1e-12)


def test_mixture_sample_equals_oracle_any_parallelism(spark):
    total = 120
    kept_py, _, _ = _py_mixture(ROWS, WEIGHTS, total)
    for parts in (1, 7):
        kept = {
            r["doc_id"]
            for r in mixing.mixture_sample(
                _docs(spark, parts), WEIGHTS, total
            ).collect()
        }
        assert kept == kept_py, parts
    # the unweighted source is an allowlist drop
    assert not any(i >= 300 for i in kept)


def test_under_resourced_source_keeps_everything(spark):
    """A source whose availability is below its target keeps ALL its
    docs (rate clamps at 1)."""
    total = 10_000  # targets far exceed every source's supply
    kept = {
        r["doc_id"]
        for r in mixing.mixture_sample(_docs(spark), WEIGHTS, total).collect()
    }
    assert kept == {i for i, src, _ in ROWS if src in WEIGHTS}


def test_budget_hit_in_expectation(spark):
    """Kept tokens per source track min(target, avail) within Bernoulli
    noise — checked with a generous tolerance on the large source."""
    total = 200
    _, rates, avail = _py_mixture(ROWS, WEIGHTS, total)
    kept = mixing.mixture_sample(_docs(spark), WEIGHTS, total)
    got = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang")
        .agg(F.sum(F.size(tokenize_column("text"))).alias("n"))
        .collect()
    }
    target_en = min(total * WEIGHTS["en"] / 1.0, avail["en"])
    assert got.get("en", 0) == pytest.approx(target_en, rel=0.6)


def test_validation(spark):
    d = _docs(spark)
    with pytest.raises(ValueError):
        mixing.mixture_rates(d, {}, 10)
    with pytest.raises(ValueError):
        mixing.mixture_rates(d, {"en": 0.0}, 10)
    with pytest.raises(ValueError):
        mixing.mixture_rates(d, WEIGHTS, -1)


def test_rates_join_is_broadcast_and_filter_row_local(spark):
    """The corpus side must see only a broadcast join + row-local hash
    filter — no corpus shuffle anywhere in the plan."""
    plan = (
        mixing.mixture_sample(_docs(spark), WEIGHTS, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_cli_mix(spark, tmp_path, capsys):
    """mix subcommand: weights parse, sampled corpus written, one JSON
    report with per-source rates."""
    import json

    from text_indexer_spark import cli

    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        ROWS, "doc_id long, lang string, text string"
    ).write.parquet(d)
    out = str(tmp_path / "mixed")
    rc = cli.main(
        ["--master", "local[4]", "mix", "--corpus", d, "--out", out,
         "--total-tokens", "120", "--weights", "en=0.5,fr=0.3,de=0.2"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept_py, _, _ = _py_mixture(ROWS, WEIGHTS, 120)
    assert rep["rows_kept"] == len(kept_py)
    assert set(rep["sources"]) == set(WEIGHTS)
    got = {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }
    assert got == kept_py

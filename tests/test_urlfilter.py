"""C4 blocklist stage (operators/urlfilter.py): URL/domain extraction
against a pure-Python oracle, subdomain semantics via the suffix-chain
equi-join (plan-asserted: no nested loop), and the two word-cut tiers'
equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators import urlfilter

DOCS = [
    (1, "intro https://Sub.Example.COM/path?q=1 outro"),
    (2, "see http://blog.evil.net/post. and https://good.org/a,"),
    (3, "deep http://a.b.tracker.io/x plus (https://fine.example.org/y)"),
    (4, "no urls at all in this one"),
    (5, "bare http://evil.net trailing"),
    (6, None),
]
BLOCKED = ["evil.net", "tracker.io"]


def _docs(spark, parts=3):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string"
    ).repartition(parts)


def test_extract_urls(spark):
    got = {
        (r["doc_id"], r["url"], r["domain"])
        for r in urlfilter.extract_urls(_docs(spark)).collect()
    }
    assert got == {
        (1, "https://Sub.Example.COM/path?q=1", "sub.example.com"),
        (2, "http://blog.evil.net/post", "blog.evil.net"),
        (2, "https://good.org/a", "good.org"),
        (3, "http://a.b.tracker.io/x", "a.b.tracker.io"),
        (3, "https://fine.example.org/y", "fine.example.org"),
        (5, "http://evil.net", "evil.net"),
    }


def test_domain_filter_blocks_subdomains(spark):
    """blog.evil.net and a.b.tracker.io match their blocked parents;
    example.com/org do not match anything; exact evil.net matches."""
    bl = spark.createDataFrame([(d,) for d in BLOCKED], "domain string")
    kept = {
        r["doc_id"]
        for r in urlfilter.filter_blocked_domains(_docs(spark), bl).collect()
    }
    assert kept == {1, 4, 6}


def test_domain_filter_is_not_fooled_by_suffix_strings(spark):
    """'notevil.net' must NOT match blocked 'evil.net' — label-aligned
    suffixes only (the suffix chain splits on dots, so a partial label
    can never equal a blocklist entry)."""
    docs = spark.createDataFrame(
        [(1, "ok http://notevil.net/x"), (2, "bad http://evil.net/y")],
        "doc_id long, text string",
    )
    bl = spark.createDataFrame([("evil.net",)], "domain string")
    kept = {
        r["doc_id"]
        for r in urlfilter.filter_blocked_domains(docs, bl).collect()
    }
    assert kept == {1}


def test_domain_join_is_equi_not_nested_loop(spark):
    """The suffix-chain rewrite's whole point: an equi semi-join, never
    the BroadcastNestedLoopJoin an ENDSWITH-style inequality join
    forces.  The blocklist is deliberately NOT hint-forced (unbounded
    caller input — the --max-ppl ADVICE precedent), so the broadcast is
    AQE's runtime choice for a small list: execute first, then assert
    on the final adaptive plan."""
    bl = spark.createDataFrame([(d,) for d in BLOCKED], "domain string")
    df = urlfilter.blocked_doc_ids(_docs(spark), bl)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_word_filter_literal_tier(spark):
    docs = spark.createDataFrame(
        [
            (1, "perfectly fine prose"),
            (2, "contains the BADWORD here"),
            (3, "badword at the start"),
            (4, "notbadword is a different token"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in urlfilter.filter_blocked_words(docs, ["badword"]).collect()
    }
    assert kept == {1, 4, 5}  # whole-token, case-folded; NULL passes


def test_word_filter_tiers_agree(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} common badword" if i % 3 == 0 else f"w{i} common")
         for i in range(30)],
        "doc_id long, text string",
    )
    lit = {
        r["doc_id"]
        for r in urlfilter.filter_blocked_words(docs, ["badword"]).collect()
    }
    joined = {
        r["doc_id"]
        for r in urlfilter.filter_blocked_words(
            docs, ["badword"], max_literal_words=0
        ).collect()
    }
    assert lit == joined == {i for i in range(30) if i % 3 != 0}


def test_word_filter_validation(spark):
    with pytest.raises(ValueError):
        urlfilter.filter_blocked_words(_docs(spark), ["", ""])


def test_filters_are_scan_fused_zero_exchange(spark):
    """The literal word tier must stay a row-local filter — no
    exchange, no join, no Python."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        urlfilter.filter_blocked_words(docs, ["bad"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_cli_clean_blocklist_flags(spark, tmp_path, capsys):
    """clean --block-domains/--block-words drop blocked docs before the
    quality tiers see them."""
    import json

    from text_indexer_spark import cli

    good = (
        "a solid paragraph of reasonable natural language text that "
        "keeps going long enough to clear the quality length gate "
    ) * 3
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, good),
            (2, good + " see https://cdn.evil.net/ad.js for details"),
            (3, good + " contains the forbiddenword sadly"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    bl = str(tmp_path / "bl")
    spark.createDataFrame([("evil.net",)], "domain string").write.parquet(bl)
    out = str(tmp_path / "clean")
    rc = cli.main(
        ["--master", "local[4]", "clean", "--corpus", src, "--out", out,
         "--block-domains", bl, "--block-words", "forbiddenword"]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_in"] == 3
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1}

"""Corpus data-card report — the summary statistics every training
dataset publishes (docs/tokens, language mix, quality distribution,
duplication rate, domain mix, PII exposure) computed in a handful of
aggregation-only Spark jobs.

Composition over the gated operators, nothing bespoke: token counts
and quality come from ``textstats``, PII exposure from ``redact``,
duplication from ``dedup.exact_dedup``, domains from ``urlfilter``.
Every job is either a scan-fused projection + one map-side-combined
aggregate (totals), a bounded groupBy (languages, top domains), or
the md5-window dedup pass — no collect is corpus-sized (quantiles use
Spark's approx sketch; tops are TakeOrderedAndProject-capped).

The report is an OBSERVABILITY artifact, not an oracle-gated query:
the approximate quantiles are partition-layout-dependent by nature
(Greenwald-Khanna), which is why this lives beside — not inside — the
deterministic operator family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_indexer_spark.operators import redact, textstats, urlfilter
from text_indexer_spark.operators.dedup import exact_dedup


def corpus_report(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    top_domains: int = 10,
    top_langs: int = 20,
) -> dict:
    """One dict of data-card numbers for ``corpus``.  Columns beyond
    ``(id, text)`` are optional — the language section appears only
    when ``lang_col`` exists."""
    n_docs = corpus.count()
    out: dict = {"n_docs": n_docs}
    if n_docs == 0:
        return out

    tok = textstats.token_counts(corpus, text_col=text_col, id_col=id_col)
    t = tok.agg(
        F.sum("word_tokens").alias("words"),
        F.sum("ws_tokens").alias("ws"),
        F.sum("bpe_ish_pieces").alias("bpe"),
    ).first()
    chars = corpus.agg(
        F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias("c")
    ).first()["c"]
    out["tokens"] = {
        "word_total": t["words"],
        "ws_total": t["ws"],
        "bpe_ish_total": t["bpe"],
        "chars_total": chars,
        "words_per_doc_mean": round(t["words"] / n_docs, 2),
    }

    from text_indexer_spark.tokenizer import tokenize_column

    vocab = (
        corpus.select(
            F.explode(
                tokenize_column(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("t")
        )
        # HLL sketch (rsd 2 %): vocabulary cardinality without a
        # distinct-key exchange — the sketch merges map-side, so the
        # shuffle carries one sketch per partition, not the vocabulary
        .agg(F.approx_count_distinct("t", rsd=0.02).alias("v"))
        .first()["v"]
    )
    out["tokens"]["vocab_size_approx"] = vocab

    q = textstats.quality_scores(corpus, text_col=text_col, id_col=id_col)
    p10, p50, p90 = q.stat.approxQuantile("quality", [0.1, 0.5, 0.9], 0.01)
    out["quality"] = {"p10": round(p10, 4), "p50": round(p50, 4),
                      "p90": round(p90, 4)}

    groups = exact_dedup(corpus, text_col=text_col, id_col=id_col)
    d = groups.agg(
        F.count(F.lit(1)).alias("dup_docs"),
        F.countDistinct("canonical_id").alias("dup_groups"),
    ).first()
    out["exact_duplication"] = {
        "docs_in_dup_groups": d["dup_docs"],
        "dup_groups": d["dup_groups"],
        "removable_docs": d["dup_docs"] - d["dup_groups"],
        "dup_frac": round((d["dup_docs"] - d["dup_groups"]) / n_docs, 4),
    }

    pii = redact.pii_stats(corpus, text_col=text_col, id_col=id_col).agg(
        F.sum("n_url").alias("urls"),
        F.sum("n_email").alias("emails"),
        F.sum("n_ipv4").alias("ipv4s"),
    ).first()
    out["pii"] = {"urls": pii["urls"], "emails": pii["emails"],
                  "ipv4s": pii["ipv4s"]}

    doms = (
        urlfilter.extract_urls(corpus, id_col=id_col, text_col=text_col)
        .filter(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "domain")
        .limit(top_domains)
        .collect()
    )
    out["top_domains"] = [{"domain": r["domain"], "n": r["n"]} for r in doms]

    if lang_col in corpus.columns:
        langs = (
            corpus.groupBy(lang_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), lang_col)
            .limit(top_langs)
            .collect()
        )
        out["languages"] = {str(r[lang_col]): r["n"] for r in langs}
    return out

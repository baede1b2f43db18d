"""Symbol / definition extraction — the ctags tier of code search.

Code-search engines index DEFINITIONS separately from content so
``class Foo`` / ``fun parse`` queries rank declaration sites above call
sites (Zoekt's symbol sections via universal-ctags; a public design).
This module is the Spark-native lite version: per-language declaration
regexes evaluated with ``regexp_extract_all`` inside one codegen scan —
no Python workers, no shuffle until the optional postings aggregation.

The reference engine has no symbol tier (it tokenizes content only,
``DocumentTokenizer.kt:18-25``); this extends the same corpus schema the
build consumes, keyed by the ``lang`` column like tokenizer routing
(``operators/langroute.py``).

Pattern-set notes: intentionally line-anchorless and conservative —
one capture group per pattern, identifier charset ``[A-Za-z_][A-Za-z0-9_]*``;
false positives (e.g. the word sequence ``fun foo`` in prose) are
acceptable at this tier because symbol results re-rank, never filter,
content results. Regex subset chosen to evaluate identically under
Java's engine (Spark) and RE2-style engines (DuckDB oracle): literal
keywords, ``\\s+``, one capture, no backrefs or lookarounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT = "([A-Za-z_][A-Za-z0-9_]*)"

#: lang -> [(kind, regex-with-one-capture)]
SYMBOL_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "kotlin": [
        ("function", rf"\bfun\s+{_IDENT}"),
        ("class", rf"\bclass\s+{_IDENT}"),
        ("value", rf"\bval\s+{_IDENT}"),
    ],
    "java": [
        ("class", rf"\bclass\s+{_IDENT}"),
        ("interface", rf"\binterface\s+{_IDENT}"),
    ],
    "python": [
        ("function", rf"\bdef\s+{_IDENT}"),
        ("class", rf"\bclass\s+{_IDENT}"),
    ],
}


def extract_symbols(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    patterns: dict[str, list[tuple[str, str]]] | None = None,
) -> DataFrame:
    """(id, kind, symbol) — every declaration the lang's patterns find.

    One scan: per pattern, ``regexp_extract_all`` captures the names and
    a ``transform`` tags them with their kind; the per-kind arrays are
    concatenated and exploded. Rows whose ``lang`` has no pattern set
    contribute nothing. ``lang_col=None`` applies the union of ALL
    pattern sets (schema-less corpora).

    A symbol may repeat (overloads, same name declared twice) — kept,
    with multiplicity, so downstream postings carry a definition count.
    """
    pats = SYMBOL_PATTERNS if patterns is None else patterns

    def kinded(kind: str, regex: str):
        return F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(regex), F.lit(1)),
            lambda s: F.struct(F.lit(kind).alias("kind"), s.alias("symbol")),
        )

    if lang_col is None:
        seen: set[tuple[str, str]] = set()
        arrays = []
        for plist in pats.values():
            for kind, regex in plist:
                if (kind, regex) not in seen:
                    seen.add((kind, regex))
                    arrays.append(kinded(kind, regex))
        combined = F.concat(*arrays)
    else:
        combined = None
        for lang, plist in pats.items():
            arr = F.concat(*[kinded(k, r) for k, r in plist])
            combined = (
                F.when(F.col(lang_col) == lang, arr)
                if combined is None
                else combined.when(F.col(lang_col) == lang, arr)
            )
        combined = combined.otherwise(
            F.array().cast("array<struct<kind:string,symbol:string>>")
        )
    return corpus.select(
        F.col(id_col), F.explode(combined).alias("_s")
    ).select(id_col, F.col("_s.kind").alias("kind"), F.col("_s.symbol").alias("symbol"))


def symbol_postings(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> DataFrame:
    """(symbol, kind, id, n_defs) — the definition index. Same shape as
    term postings, so the committed-index machinery can persist it; one
    shuffle on (symbol, kind, id)."""
    return (
        extract_symbols(corpus, text_col=text_col, id_col=id_col, lang_col=lang_col)
        .groupBy("symbol", "kind", id_col)
        .agg(F.count("*").alias("n_defs"))
    )


def search_symbol(
    corpus: DataFrame,
    name: str,
    kind: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Docs declaring ``name`` (optionally restricted to a kind),
    definition counts included — the ``class Foo``-style lookup."""
    posts = symbol_postings(
        corpus, text_col=text_col, id_col=id_col, lang_col=lang_col
    ).filter(F.col("symbol") == name)
    if kind is not None:
        posts = posts.filter(F.col("kind") == kind)
    return posts.select(id_col, "kind", "n_defs").orderBy(id_col, "kind")

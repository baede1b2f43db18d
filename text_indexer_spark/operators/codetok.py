"""Code-identifier tokenization — camelCase / snake_case / acronym-run
splitting for source-code search.

The graft's payload is source code: a code corpus's vocabulary lives in
identifiers (``parseHttpRequest``, ``shard_offset``, ``HTTPServer``), and
an index built on whitespace tokens alone can't serve ``http request``
against ``parseHttpRequest``.  Real code-search engines (Zoekt, Hound,
GitHub's blackbird — all public designs) therefore sub-tokenize
identifiers at case and underscore boundaries.  The reference engine's
tokenizer (``DocumentTokenizer.kt:18-25``) treats ``_`` and case runs as
token-internal; this module is the code-aware EXTENSION of that
pluggable-tokenizer seam (SURVEY §2.6), not a replacement — the default
build keeps reference parity.

Splitting rules (applied in this order, identically in Spark, Python and
the DuckDB oracle rendering):

1. acronym runs:   ``HTTPServer``  → ``HTTP Server``
   (``([A-Z]+)([A-Z][a-z])`` → ``\\1 \\2``)
2. case boundary:  ``fooBar2Baz``  → ``foo Bar2 Baz``… precisely:
   lower/digit→upper (``([a-z0-9])([A-Z])`` → ``\\1 \\2``)
3. every non-alphanumeric byte (``_``, punctuation, whitespace) becomes
   a separator; digits stay attached to their letters (``utf8``, ``v2``
   stay whole — the common code-search choice).
4. lowercase, drop empties.

Everything stays inside whole-stage codegen: two ``regexp_replace`` +
``split`` + ``filter`` in one projection — no Python in the hot path, no
shuffle. The pandas variant exists only for the pluggable per-``lang``
registry (``operators/langroute.py``), mirroring the reference's
``DocumentTokenizer`` extension point.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

from pyspark.sql import Column
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: rule 1 — break an uppercase run before its last capital when a
#: lowercase letter follows: the trailing capital starts a new word.
ACRONYM_RE = ("([A-Z]+)([A-Z][a-z])", "$1 $2")
#: rule 2 — lower-or-digit → upper is a word boundary.
CASE_RE = ("([a-z0-9])([A-Z])", "$1 $2")
#: rule 3 — anything outside [A-Za-z0-9] separates identifiers.
NONALNUM_RE = "[^A-Za-z0-9]+"

_PY_ACRONYM = re.compile(ACRONYM_RE[0])
_PY_CASE = re.compile(CASE_RE[0])
_PY_NONALNUM = re.compile(NONALNUM_RE)


def split_identifiers_column(text: Column | str) -> Column:
    """``text -> array<string>`` of lowercased identifier sub-tokens.

    Pure codegen: regexp_replace ×2 → separator collapse → lower →
    split → empty filter, all inside the scan projection."""
    col = F.col(text) if isinstance(text, str) else text
    s = F.regexp_replace(col, ACRONYM_RE[0], ACRONYM_RE[1])
    s = F.regexp_replace(s, CASE_RE[0], CASE_RE[1])
    s = F.regexp_replace(s, NONALNUM_RE, " ")
    toks = F.split(F.lower(F.trim(s)), " +")
    return F.filter(toks, lambda t: F.length(t) > 0)


def split_identifiers_text(text: str) -> list[str]:
    """Python mirror of ``split_identifiers_column`` — query-side
    tokenization and test oracle. Must stay rule-for-rule identical."""
    s = _PY_ACRONYM.sub(r"\1 \2", text)
    s = _PY_CASE.sub(r"\1 \2", s)
    s = _PY_NONALNUM.sub(" ", s)
    return [t for t in s.lower().split(" ") if t]


def ident_tokenize_series(texts: "pd.Series") -> "pd.Series":
    """Arrow-vectorized pandas rendering for the per-``lang`` tokenizer
    registry (``langroute.DEFAULT_REGISTRY['code']``)."""
    return texts.fillna("").map(split_identifiers_text)


def duckdb_ident_tokens_sql(text_expr: str) -> str:
    """The identical four rules as a DuckDB expression returning
    ``list<varchar>`` — the oracle rendering. DuckDB backreferences are
    ``\\1`` (Spark's are ``$1``) and global replacement needs the 'g'
    flag (Spark's regexp_replace is global by default)."""
    s = (
        f"regexp_replace({text_expr}, "
        "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')"
    )
    s = f"regexp_replace({s}, '([a-z0-9])([A-Z])', '\\1 \\2', 'g')"
    s = f"regexp_replace({s}, '[^A-Za-z0-9]+', ' ', 'g')"
    return (
        f"list_filter(string_split_regex(lower(trim({s})), ' +'), "
        "t -> length(t) > 0)"
    )


def camelcase_column(tokens: Column) -> Column:
    """Deterministic camelCase rendering of a token array —
    ``[key, agg, row] -> keyAggRow``-style… precisely: every token gets
    its first letter uppercased, then all are concatenated. Used by the
    driver gates to derive identifier-shaped strings from the flat
    testdata vocabulary (both engines compute it from the same table; no
    synthetic side data)."""
    cap = F.transform(
        tokens,
        lambda t: F.concat(F.upper(F.substring(t, 1, 1)), F.substring(t, 2, 2147483647)),
    )
    return F.concat_ws("", cap)


def duckdb_camelcase_sql(tokens_expr: str) -> str:
    """DuckDB rendering of ``camelcase_column`` over a list expression."""
    return (
        f"array_to_string(list_transform({tokens_expr}, "
        "t -> upper(t[1:1]) || t[2:]), '')"
    )


def ident_postings(
    corpus, text_col: str = "text", id_col: str = "doc_id"
):
    """(doc_id, term, tf) postings under identifier tokenization — the
    code-search build input. One codegen scan + one aggregation; same
    shape as the default build's postings so every downstream stage
    (sharding, encode, WAND) consumes it unchanged."""
    toks = split_identifiers_column(F.col(text_col))
    return (
        corpus.select(id_col, F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )

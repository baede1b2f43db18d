"""Deterministic multi-byte fixture rows UNION'd into the ``documents``
table by selected driver gates (and their DuckDB oracles).

The synthetic testdata corpus is pure ASCII, so the per-language
tokenizer routing (``operators/langroute.py``), the char-length oracle
semantics, and the trigram/phrase paths were never driver-exercised on
the inputs they exist for — CJK text with no word delimiters, accented
Latin case folding, Cyrillic/Greek scripts, non-BMP emoji (r3 verdict,
"What's missing" #2).  These rows are fixed literals, injected
identically on both sides of every gate that opts in: the Spark side
unions a ``createDataFrame`` of ``ROWS``, the oracle side shadows the
``documents`` view with a CTE that unions a ``VALUES`` list.

Parity guardrails (measured, tests/test_unicode_fixture.py): Spark's
``lower()`` follows Java full case mapping — contextual final sigma
(``ΟΔΟΣ`` → ``οδος``) and dotted capital İ (→ ``i̇``) — while DuckDB's
applies simple case mapping (``οδοσ``, ``i``), so the fixture contains
NO capital Σ in word-final position and no İ; both engines agree on
everything else here (accented Latin, ß, CJK, Cyrillic, lowercase
Greek, non-BMP emoji; length()/substr() are codepoint-based in both).

doc_ids start at 900001 — far above any testdata sf's id range and the
sync gates' synthetic +1_000_000 adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: (doc_id, text, lang, source) — n_chars is derived (len == codepoints).
ROWS: list[tuple[int, str, str, str]] = [
    (900001, "机器学习 模型训练 数据集 分布式计算 spark 索引构建", "zh", "ufix"),
    (900002, "数据库查询优化 倒排索引 压缩编码 哈希表 并行计算", "zh", "ufix"),
    (900003, "Éléonore a DÉJÀ vu l'été au café très naïve — à bientôt! Ça va?", "fr", "ufix"),
    (900004, "die GRÖSSE der Straße: müssen über Züge hinaus; schön grün", "de", "ufix"),
    (900005, "mañana el NIÑO pequeño corazón señor y señora aquí", "es", "ufix"),
    (900006, "журнал Москва данные индекс поиск система быстро", "ru", "ufix"),
    (900007, "γλώσσα ελληνικά κείμενο αναζήτηση ευρετήριο", "el", "ufix"),
    (900008, "Mixed ASCII with 中文字符 and Ümlaute plus emoji 🎉🚀 scan stream", "en", "ufix"),
]

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def fixture_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in ROWS], _SCHEMA
    )


def docs_with_fixture(docs: DataFrame) -> DataFrame:
    """``documents`` ∪ fixture, column-name aligned."""
    spark = docs.sparkSession
    return docs.unionByName(
        fixture_df(spark).select(*docs.columns), allowMissingColumns=False
    )


def _values_sql() -> str:
    return ", ".join(
        "({i}, '{t}', '{lang}', '{src}', {n})".format(
            i=i, t=t.replace("'", "''"), lang=lang, src=src, n=len(t)
        )
        for i, t, lang, src in ROWS
    )


#: CTE body: the shadowed ``documents`` = base view ∪ fixture VALUES.
#: ``main.documents`` pins the inner reference to the registered view
#: (DuckDB rejects a non-recursive self-reference otherwise).
_DOCS_CTE = (
    "documents AS (SELECT * FROM main.documents UNION ALL "
    "SELECT * FROM (VALUES " + _values_sql()
    + ") t(doc_id, text, lang, source, n_chars))"
)


def with_fixture_sql(sql: str) -> str:
    """Wrap an oracle SQL string so every ``documents`` reference inside
    it resolves to base-table ∪ fixture (CTE shadowing)."""
    s = sql.lstrip()
    if s[:5].upper() == "WITH ":
        return "WITH " + _DOCS_CTE + ", " + s[5:]
    return "WITH " + _DOCS_CTE + " " + s

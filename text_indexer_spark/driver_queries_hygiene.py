"""Driver-contract queries, part 5: pipeline-hygiene + multilingual
operators — benchmark decontamination, repetition filtering, fuzzy
term matching, per-language tokenizer routing.

Same shape as the other driver_queries modules: each Spark query is a
thin call into an operator module; each oracle reproduces the math in
DuckDB exactly (same tokenizer regex, same n-gram construction, same
tie-breaks, same rounding).

Gate parameters are tuned to be non-vacuous at sf0.01: the "benchmark"
eval set is every 41st document (13 docs → 23 contaminated at n=4,
10 of them cross-document), the repetition cut at 0.05 drops 110/500
docs, and the fuzzy queries are deliberate typos of corpus terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_indexer_spark.operators import decontam, fuzzy, linededup, textstats
from text_indexer_spark.sources.tables import load_table
from text_indexer_spark.unicode_fixture import with_fixture_sql as _ufix
from text_indexer_spark.tokenizer import (
    duckdb_tokens_sql,
    duckdb_word_ngrams_sql,
    tokenize_column,
)

DECONTAM_N = 4
EVAL_MOD = 41
TOP2_MAX = 0.05
FUZZY_TERM = "ag"          # 1 edit from both "a" and "agg"
FUZZY_QUERY = "keys tble"  # typos of "key" and "table"
ROUND = 4
LINE_W = 3      # tokens per derived line (see _multiline_docs)
LINE_MIN_DOCS = 2


def _vocab_sql() -> str:
    toks = f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"
    return f"(SELECT DISTINCT unnest({toks}) AS term FROM documents)"


def _pairs_sql() -> str:
    toks = f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"
    return (
        f"(SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents)"
    )


def _contam_ctes(n: int = DECONTAM_N) -> str:
    g = duckdb_word_ngrams_sql("coalesce(text, '')", n)
    return (
        f"ev AS (SELECT DISTINCT unnest({g}) AS gram FROM documents "
        f"WHERE doc_id % {EVAL_MOD} = 0), "
        f"cg AS (SELECT DISTINCT doc_id, unnest({g}) AS gram FROM documents)"
    )


# ------------------------------------------------------------- decontam
def q_decontam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams(
        docs.filter(F.col("doc_id") % EVAL_MOD == 0), n=DECONTAM_N
    )
    return decontam.contamination_hits(docs, ev, n=DECONTAM_N)


def sql_decontam_hits() -> str:
    return (
        f"WITH {_contam_ctes()} "
        f"SELECT doc_id, count(*)::BIGINT AS n_hits "
        f"FROM cg JOIN ev USING (gram) GROUP BY doc_id"
    )


def q_decontam_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams(
        docs.filter(F.col("doc_id") % EVAL_MOD == 0), n=DECONTAM_N
    )
    return decontam.decontaminate(docs, ev, n=DECONTAM_N).select(
        "doc_id", "n_chars"
    )


def sql_decontam_kept() -> str:
    return (
        f"WITH {_contam_ctes()} "
        f"SELECT doc_id, n_chars FROM documents WHERE doc_id NOT IN "
        f"(SELECT DISTINCT doc_id FROM cg JOIN ev USING (gram))"
    )


# ------------------------------------------------------------ repetition
def _repetition_ctes() -> str:
    g2 = duckdb_word_ngrams_sql("coalesce(text, '')", 2)
    return (
        "lines AS (SELECT doc_id, trim(x) AS line FROM (SELECT doc_id, "
        "unnest(regexp_split_to_array(coalesce(text, ''), '\\n')) AS x "
        "FROM documents) WHERE trim(x) <> ''), "
        "lc AS (SELECT doc_id, line, count(*) AS c FROM lines "
        "GROUP BY doc_id, line), "
        "la AS (SELECT doc_id, sum(c) AS n_lines, "
        "sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines, "
        "sum(c * length(line)) AS line_chars, "
        "sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS dup_chars "
        "FROM lc GROUP BY doc_id), "
        f"g AS (SELECT doc_id, unnest({g2}) AS gram FROM documents), "
        "gc AS (SELECT doc_id, gram, count(*) AS c FROM g "
        "GROUP BY doc_id, gram), "
        "ga AS (SELECT doc_id, sum(c) AS n_grams FROM gc GROUP BY doc_id), "
        "gbest AS (SELECT doc_id, gram, c FROM (SELECT doc_id, gram, c, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) "
        "AS rn FROM gc) WHERE rn = 1)"
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.repetition_stats(load_table(spark, sf_dir, "documents"))


def sql_repetition() -> str:
    return (
        f"WITH {_repetition_ctes()} "
        "SELECT d.doc_id, "
        "coalesce(la.n_lines, 0)::BIGINT AS n_lines, "
        f"round(CASE WHEN coalesce(la.n_lines, 0) > 0 "
        f"THEN la.dup_lines / la.n_lines ELSE 0 END, {ROUND}) "
        "AS dup_line_frac, "
        f"round(CASE WHEN coalesce(la.line_chars, 0) > 0 "
        f"THEN la.dup_chars / la.line_chars ELSE 0 END, {ROUND}) "
        "AS dup_line_char_frac, "
        "gbest.gram AS top_2gram, "
        f"round(CASE WHEN coalesce(ga.n_grams, 0) > 0 "
        f"THEN gbest.c / ga.n_grams ELSE 0 END, {ROUND}) AS top_2gram_frac "
        "FROM documents d "
        "LEFT JOIN la ON d.doc_id = la.doc_id "
        "LEFT JOIN ga ON d.doc_id = ga.doc_id "
        "LEFT JOIN gbest ON d.doc_id = gbest.doc_id"
    )


def q_repetition_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textstats.filter_by_repetition(
        docs, max_top_2gram_frac=TOP2_MAX
    ).select("doc_id", "n_chars")


def sql_repetition_kept() -> str:
    # unrounded fractions on BOTH sides: the filter compares the raw
    # IEEE quotient, so the oracle must too (rounding first would move
    # boundary docs across the threshold)
    return (
        f"WITH {_repetition_ctes()} "
        "SELECT d.doc_id, d.n_chars FROM documents d "
        "LEFT JOIN la ON d.doc_id = la.doc_id "
        "LEFT JOIN ga ON d.doc_id = ga.doc_id "
        "LEFT JOIN gbest ON d.doc_id = gbest.doc_id "
        "WHERE (CASE WHEN coalesce(la.n_lines, 0) > 0 "
        "THEN la.dup_lines / la.n_lines ELSE 0 END) <= 0.3 "
        f"AND (CASE WHEN coalesce(ga.n_grams, 0) > 0 "
        f"THEN gbest.c / ga.n_grams ELSE 0 END) <= {TOP2_MAX}"
    )


def q_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination: the broadcast shrinks from the
    eval-gram strings to m/64 packed longs and the exact verify join
    only sees bloom-positive docs.  No false negatives -> the output is
    IDENTICAL to the exact operator, so the gate shares
    ``sql_decontam_kept``'s oracle — the driver proves the scale path
    computes the same relation as the exact one."""
    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams(
        docs.filter(F.col("doc_id") % EVAL_MOD == 0), n=DECONTAM_N
    )
    return decontam.decontaminate_bloom(docs, ev, n=DECONTAM_N).select(
        "doc_id", "n_chars"
    )


# ------------------------------------------------------------ line dedup
# The testdata documents are single-line word soup, so the gates derive
# a deterministic MULTI-LINE corpus inside the query (the same move as
# code_ident_postings): each doc's token stream is folded into lines of
# LINE_W tokens.  With the corpus's small vocabulary, 3-token lines
# repeat heavily across documents (1,413 of 7,460 distinct lines occur
# in ≥2 docs at sf0.01; 26 docs end up fully boilerplate) — exactly the
# structure the C4 line rule exists to kill.
def _multiline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize_column(F.coalesce(F.col("text"), F.lit("")))
    n_lines = F.ceil(F.size(toks) / LINE_W).cast("int")
    lines = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(1), n_lines),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i - 1) * LINE_W + 1, LINE_W)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )


def _linededup_ctes() -> str:
    toks = f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"
    w = LINE_W
    return (
        f"ml AS (SELECT doc_id, list_transform("
        f"range(1, (len({toks}) + {w - 1}) // {w} + 1), "
        f"i -> {{'line_no': i, 'line': array_to_string("
        f"list_slice({toks}, (i-1)*{w}+1, (i-1)*{w}+{w}), ' ')}}) AS lst "
        f"FROM documents), "
        f"lns AS (SELECT doc_id, unnest(lst) AS s FROM ml), "
        f"ln AS (SELECT doc_id, s.line_no AS line_no, s.line AS line "
        f"FROM lns), "
        f"shared AS (SELECT line FROM ln WHERE trim(line) <> '' "
        f"GROUP BY line HAVING count(DISTINCT doc_id) >= {LINE_MIN_DOCS})"
    )


def q_line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return linededup.line_dedup_stats(
        _multiline_docs(spark, sf_dir), min_docs=LINE_MIN_DOCS
    )


def sql_line_dedup_stats() -> str:
    return (
        f"WITH {_linededup_ctes()} "
        "SELECT doc_id, count(*)::BIGINT AS n_lines, "
        "sum(CASE WHEN line IN (SELECT line FROM shared) THEN 1 ELSE 0 "
        "END)::BIGINT AS n_shared_lines, "
        "round(sum(CASE WHEN line IN (SELECT line FROM shared) THEN 1 "
        "ELSE 0 END) / count(*), 4) AS shared_line_frac "
        "FROM ln WHERE trim(line) <> '' GROUP BY doc_id"
    )


def q_line_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = linededup.dedup_lines(
        _multiline_docs(spark, sf_dir), min_docs=LINE_MIN_DOCS
    )
    return kept.select(
        "doc_id",
        F.length("text").cast("long").alias("n_kept_chars"),
        F.md5(F.col("text")).alias("text_md5"),
    )


def sql_line_dedup_kept() -> str:
    return (
        f"WITH {_linededup_ctes()} "
        "SELECT doc_id, "
        "length(string_agg(line, chr(10) ORDER BY line_no))::BIGINT "
        "AS n_kept_chars, "
        "md5(string_agg(line, chr(10) ORDER BY line_no)) AS text_md5 "
        "FROM ln WHERE trim(line) <> '' "
        "AND line NOT IN (SELECT line FROM shared) GROUP BY doc_id"
    )


# ------------------------------------------------------- bigram LM score
LM_K = 0.5


def q_lm_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: add-k bigram model trained on
    the corpus, every doc scored by mean bigram log-prob + perplexity
    (``operators/lm.py``), replayed count-for-count by the oracle."""
    from text_indexer_spark.operators.lm import lm_self_score
    from text_indexer_spark.unicode_fixture import docs_with_fixture

    return lm_self_score(
        docs_with_fixture(load_table(spark, sf_dir, "documents")), k=LM_K
    )


def sql_lm_ppl() -> str:
    toks = f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"
    k = LM_K
    return f"""
WITH lt AS (SELECT doc_id, {toks} AS toks FROM documents),
b AS (SELECT doc_id, s['w1'] AS w1, s['w2'] AS w2 FROM (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS s
  FROM lt WHERE len(toks) >= 2)),
c2 AS (SELECT w1, w2, count(*)::DOUBLE AS c12 FROM b GROUP BY w1, w2),
u AS (SELECT unnest(toks) AS w1 FROM lt),
c1 AS (SELECT w1, count(*)::DOUBLE AS c1 FROM u GROUP BY w1),
v AS (SELECT count(*)::DOUBLE AS v FROM c1),
sc AS (SELECT doc_id,
         round(ln((c2.c12 + {k}) / (c1.c1 + {k} * (SELECT v FROM v)))
               * 10000000.0)::BIGINT AS ilogp
       FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round((sum(ilogp)::DOUBLE / count(*)) / 10000000.0, 5) AS avg_logp,
       round(exp(-round((sum(ilogp)::DOUBLE / count(*)) / 10000000.0, 5)), 3)
       AS ppl
FROM sc GROUP BY doc_id
"""


# ---------------------------------------------------------- lang routing
def q_tokenize_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer dispatch inside one mapInPandas pass:
    zh docs segment as character bigrams, everything else uses the
    delimiter tokenizer.  Runs over documents ∪ the multi-byte fixture
    (unicode_fixture.py) so the zh route is driver-exercised on REAL
    CJK text (the testdata zh rows are ASCII), and the default route on
    accented/Cyrillic/Greek/emoji text."""
    from text_indexer_spark.operators.langroute import (
        tokenize_postings_by_lang,
    )
    from text_indexer_spark.unicode_fixture import docs_with_fixture

    return tokenize_postings_by_lang(
        docs_with_fixture(load_table(spark, sf_dir, "documents"))
    )


def sql_tokenize_by_lang() -> str:
    toks = f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"
    return f"""
WITH zh_base AS (
  SELECT doc_id, unnest({toks}) AS tok FROM documents WHERE lang = 'zh'
),
zh AS (
  SELECT doc_id, unnest(
    CASE WHEN length(tok) < 2 THEN [tok]
         ELSE list_transform(range(1, length(tok)), i -> substr(tok, i, 2))
    END) AS term
  FROM zh_base
),
std AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
  WHERE lang IS DISTINCT FROM 'zh'
),
allt AS (SELECT * FROM zh UNION ALL SELECT * FROM std)
SELECT doc_id, term, count(*)::BIGINT AS tf
FROM allt GROUP BY doc_id, term
"""


# ------------------------------------------------------------- PII scrub
# the synthetic corpus carries no PII, so the gate PLANTS a deterministic
# contact block on every 7th doc — the redaction is then genuinely
# exercised and hash-compared (counts on original, md5 on scrubbed)
PII_SUFFIX = " contact bob@example.com via https://ex.org/x?a=1 from 10.1.2.3"


def q_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text_indexer_spark.operators.redact import pii_stats

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(PII_SUFFIX)).otherwise(
                F.lit("")
            ),
        ),
    )
    return pii_stats(docs)


def sql_pii_stats() -> str:
    from text_indexer_spark.operators.redact import PII_PATTERNS

    t = (
        "coalesce(text, '') || CASE WHEN doc_id % 7 = 0 "
        f"THEN '{PII_SUFFIX}' ELSE '' END"
    )
    counts = ", ".join(
        f"length(regexp_extract_all({t}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = t
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return (
        f"SELECT doc_id, {counts}, md5({red}) AS redacted_md5 FROM documents"
    )


# ----------------------------------------------------------------- fuzzy
def q_fuzzy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy.fuzzy_terms(fuzzy.vocabulary(docs), FUZZY_TERM)


def sql_fuzzy_terms() -> str:
    return (
        f"SELECT term, levenshtein(term, '{FUZZY_TERM}')::INT AS dist "
        f"FROM {_vocab_sql()} v "
        f"WHERE levenshtein(term, '{FUZZY_TERM}') <= 1"
    )


FUZZY2_TERM = "strm"  # d1 matches NOTHING; d2 matches {sort, stream}


def q_fuzzy_terms2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell delete-2 neighborhood + banded-levenshtein verify: the
    d=2 radius must add terms the d=1 gate cannot see (the gate term
    has zero distance-1 matches in the corpus vocabulary)."""
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy.fuzzy_terms(fuzzy.vocabulary(docs), FUZZY2_TERM, max_edits=2)


def sql_fuzzy_terms2() -> str:
    return (
        f"SELECT term, levenshtein(term, '{FUZZY2_TERM}')::INT AS dist "
        f"FROM {_vocab_sql()} v "
        f"WHERE levenshtein(term, '{FUZZY2_TERM}') <= 2"
    )


# ------------------------------------------------ span (substring) dedup
# Exact repeated-substring removal (Lee et al. 2021, ExactSubstr) at
# SPAN_N tokens.  The testdata word soup already repeats short n-grams;
# a known boilerplate tail appended to every 3rd doc guarantees long
# cross-doc spans exist at every sf, so the gate exercises both natural
# and injected duplication.  The oracle replays the full rule in SQL:
# window → count ≥ 2 → covered-position union → anti-join → reassemble.
SPAN_N = 8
SPAN_BOILER = (
    "all rights reserved contact us for more information "
    "subscribe to our newsletter today"
)


def _span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat_ws(" ", base, F.lit(SPAN_BOILER)),
        ).otherwise(base).alias("text"),
    )


def q_span_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text_indexer_spark.operators import spandedup

    docs = _span_docs(spark, sf_dir)
    stats = spandedup.span_dedup_stats(docs, n=SPAN_N)
    kept = spandedup.dedup_spans(docs, n=SPAN_N)
    return stats.join(kept, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("text").alias("kept_md5"),
    )


def sql_span_dedup_kept() -> str:
    n = SPAN_N
    toks = f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"
    return (
        "WITH src AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN "
        f"coalesce(text, '') || ' {SPAN_BOILER}' ELSE coalesce(text, '') "
        "END AS text FROM documents), "
        f"tk AS (SELECT doc_id, {toks} AS t FROM src), "
        f"sh0 AS (SELECT doc_id, t, unnest(CASE WHEN len(t) >= {n} THEN "
        f"range(1, len(t) - {n} + 2) ELSE []::BIGINT[] END) AS s FROM tk), "
        "sh AS (SELECT doc_id, s, array_to_string("
        f"list_slice(t, s, s + {n - 1}), ' ') AS gram FROM sh0), "
        "dup AS (SELECT gram FROM sh GROUP BY gram "
        "HAVING count(*) >= 2), "
        "cov AS (SELECT DISTINCT doc_id, s + o AS pos FROM "
        f"(SELECT doc_id, s, unnest(range(0, {n})) AS o FROM sh "
        "WHERE gram IN (SELECT gram FROM dup))), "
        "tp AS (SELECT doc_id, unnest(t) AS tok, "
        "unnest(range(1, len(t) + 1)) AS pos FROM tk), "
        "kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tp "
        "LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos "
        "WHERE cov.pos IS NULL), "
        "ka AS (SELECT doc_id, count(*)::BIGINT AS n_kept, "
        "md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_md5 "
        "FROM kept GROUP BY doc_id), "
        "tot AS (SELECT doc_id, len(t)::BIGINT AS n_tokens FROM tk "
        "WHERE len(t) > 0) "
        "SELECT tot.doc_id, tot.n_tokens, "
        "(tot.n_tokens - ka.n_kept)::BIGINT AS n_removed, ka.kept_md5 "
        "FROM tot JOIN ka ON tot.doc_id = ka.doc_id"
    )


# ------------------------------------------------------------------ DSIR
# model-based data selection (Xie et al. 2023): target = every 29th doc
# (~17 at sf0.01 — a "domain sample"), raw = the whole corpus; hashed
# unigram+bigram multinomials, ×10⁷ integer λ sums, Gumbel top-k pick.
# The oracle replays train AND score AND selection in SQL (portable md5
# bucket hash, same smoothing, same fixed-point discipline as lm_ppl).
DSIR_B = 512
DSIR_K = 0.5
DSIR_MOD = 29
DSIR_N = 100


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text_indexer_spark.operators import dsir

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % DSIR_MOD == 0)
    return dsir.dsir_scores(docs, target, n_buckets=DSIR_B, k=DSIR_K)


def _dsir_ctes() -> str:
    toks = f"list_filter({duckdb_tokens_sql('text')}, x -> x <> '')"
    big = duckdb_word_ngrams_sql("coalesce(text, '')", 2)
    b, k = DSIR_B, DSIR_K
    kb = k * b
    return (
        f"g AS (SELECT doc_id, unnest({toks}) AS gram FROM documents "
        f"UNION ALL SELECT doc_id, unnest({big}) AS gram FROM documents), "
        f"feats AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 8))::BIGINT "
        f"% {b} AS bucket, count(*) AS c FROM g GROUP BY doc_id, bucket), "
        "rc AS (SELECT bucket, sum(c) AS c FROM feats GROUP BY bucket), "
        f"tc AS (SELECT bucket, sum(c) AS c FROM feats "
        f"WHERE doc_id % {DSIR_MOD} = 0 GROUP BY bucket), "
        "tot AS (SELECT (SELECT sum(c) FROM tc)::DOUBLE AS nt, "
        "(SELECT sum(c) FROM rc)::DOUBLE AS nr), "
        f"spine AS (SELECT unnest(range(0, {b})) AS bucket), "
        "lam AS (SELECT bucket, round((ln((coalesce(tc.c, 0) + "
        f"{k}) / (nt + {kb})) - ln((coalesce(rc.c, 0) + {k}) / "
        f"(nr + {kb}))) * 10000000.0)::BIGINT AS ilam "
        "FROM spine LEFT JOIN tc USING (bucket) "
        "LEFT JOIN rc USING (bucket) CROSS JOIN tot), "
        "sc AS (SELECT doc_id, sum(c)::BIGINT AS n_feats, "
        "sum(c * ilam)::DOUBLE / 10000000.0 AS logw "
        "FROM feats JOIN lam USING (bucket) GROUP BY doc_id)"
    )


def sql_dsir_scores() -> str:
    return f"WITH {_dsir_ctes()} SELECT doc_id, n_feats, logw FROM sc"


def q_dsir_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text_indexer_spark.operators import dsir

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % DSIR_MOD == 0)
    return dsir.dsir_resample(
        docs, target, n=DSIR_N, n_buckets=DSIR_B, k=DSIR_K
    )


def sql_dsir_selected() -> str:
    u = (
        "(('0x' || substr(md5(doc_id::VARCHAR || '|dsir1'), 1, 8))::BIGINT"
        " + 0.5) / 4294967296.0"
    )
    return (
        f"WITH {_dsir_ctes()}, "
        f"keyed AS (SELECT doc_id, logw, round(logw - ln(-ln({u})), 5) "
        "AS key FROM sc) "
        "SELECT doc_id, logw, key FROM keyed "
        f"ORDER BY key DESC, doc_id ASC LIMIT {DSIR_N}"
    )


def q_search_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy.fuzzy_conjunctive_match(docs, FUZZY_QUERY)


def sql_search_fuzzy() -> str:
    toks = sorted(set(FUZZY_QUERY.split()))
    branches = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS qidx FROM pairs "
        f"WHERE levenshtein(term, '{t}') <= 1"
        for i, t in enumerate(toks)
    )
    return (
        f"WITH pairs AS (SELECT * FROM {_pairs_sql()} p), m AS ({branches}) "
        f"SELECT doc_id FROM m GROUP BY doc_id "
        f"HAVING count(DISTINCT qidx) = {len(toks)}"
    )


def queries():
    return {
        "decontam_hits": q_decontam_hits,
        "decontam_kept_corpus": q_decontam_kept,
        "decontam_bloom_kept": q_decontam_bloom,
        "line_dedup_stats": q_line_dedup_stats,
        "line_dedup_kept": q_line_dedup_kept,
        "span_dedup_kept": q_span_dedup_kept,
        "lm_ppl": q_lm_ppl,
        "repetition_stats": q_repetition,
        "repetition_kept_corpus": q_repetition_kept,
        "fuzzy_terms": q_fuzzy_terms,
        "fuzzy_terms2": q_fuzzy_terms2,
        "search_fuzzy": q_search_fuzzy,
        "tokenize_by_lang": q_tokenize_by_lang,
        "pii_stats": q_pii_stats,
        "dsir_scores": q_dsir_scores,
        "dsir_selected": q_dsir_selected,
    }


def oracle_sql():
    return {
        "decontam_hits": sql_decontam_hits(),
        "decontam_kept_corpus": sql_decontam_kept(),
        "decontam_bloom_kept": sql_decontam_kept(),
        "line_dedup_stats": sql_line_dedup_stats(),
        "line_dedup_kept": sql_line_dedup_kept(),
        "span_dedup_kept": sql_span_dedup_kept(),
        "lm_ppl": _ufix(sql_lm_ppl()),
        "repetition_stats": sql_repetition(),
        "repetition_kept_corpus": sql_repetition_kept(),
        "fuzzy_terms": sql_fuzzy_terms(),
        "fuzzy_terms2": sql_fuzzy_terms2(),
        "search_fuzzy": sql_search_fuzzy(),
        "tokenize_by_lang": _ufix(sql_tokenize_by_lang()),
        "pii_stats": sql_pii_stats(),
        "dsir_scores": sql_dsir_scores(),
        "dsir_selected": sql_dsir_selected(),
    }

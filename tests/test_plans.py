"""Physical-plan guard rails: pushdown, pruning, broadcast, shuffle
counts — the properties that keep the engine viable at 100 TB must
survive refactors, so they are asserted, not assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.plans.checks import (
    broadcast_join_count,
    count_exchanges,
    formatted_plan,
    has_pushed_filter,
    read_schema_columns,
)
from text_indexer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_term_filter_pushed_to_scan(spark, tmp_path):
    """A term-IN filter over persisted posting lists must reach the
    parquet scan (PushedFilters), and the scan must NOT read the heavy
    binary columns when only df is selected (column pruning)."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import build_index, load_posting_lists

    idx = str(tmp_path / "idx")
    build_index(synthetic_corpus(spark, 50, avg_tokens=20), idx, num_shards=2)
    lists = load_posting_lists(spark, idx)
    q = lists.filter(F.col("term").isin(["the", "data"])).select("term", "df")
    assert has_pushed_filter(q, "term")
    cols = read_schema_columns(q)
    assert "weights_f64" not in cols and "doc_ids_delta_varbyte" not in cols


def test_doc_stats_prunes_columns(spark):
    """doc_len derivation must read only (doc_id, lang, text) — not the
    whole documents table."""
    from text_indexer_spark.driver_queries import q_doc_stats

    cols = read_schema_columns(q_doc_stats(spark, SF))
    assert "source" not in cols and "n_chars" not in cols


def test_search_paths_broadcasts_matches(spark):
    """The id→path join (IndexedDocuments.kt:68-70 analogue) broadcasts
    the tiny match side, never shuffling the catalog."""
    from text_indexer_spark.driver_queries import q_search_paths

    assert broadcast_join_count(q_search_paths(spark, SF)) >= 1


def test_postings_build_single_wide_shuffle(spark):
    """Postings build = explode + ONE hash aggregation (partial agg is
    map-side): exactly one exchange in the plan."""
    from text_indexer_spark.driver_queries import doc_postings

    # another test may have cached an identical postings plan; cache
    # substitution (InMemoryTableScan) would hide the exchange
    spark.catalog.clearCache()
    assert count_exchanges(doc_postings(spark, SF)) == 1


def test_wand_query_is_shuffle_free_before_topk(spark, tmp_path):
    """The compressed query path: scan → mapInPandas → TakeOrdered.
    No exchange at all (the doc-range layout makes shard grouping a
    partition-local operation)."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import build_index, load_posting_lists
    from text_indexer_spark.operators.wand import wand_topk

    idx = str(tmp_path / "idx2")
    build_index(synthetic_corpus(spark, 50, avg_tokens=20), idx, num_shards=2)
    q = wand_topk(load_posting_lists(spark, idx), ["the", "data"], k=5)
    assert count_exchanges(q) == 0
    assert "TakeOrderedAndProject" in formatted_plan(q)


def test_bm25_never_reads_content(spark):
    """Query-time plans must not scan the raw text column once postings
    exist — BM25 over postings reads text only to BUILD the postings
    (the documents table IS the corpus here), never the content of
    non-matching columns like source/n_chars."""
    from text_indexer_spark.driver_queries import q_bm25_topk

    cols = read_schema_columns(q_bm25_topk(spark, SF))
    assert "source" not in cols and "n_chars" not in cols


def test_build_sizing_scans_only_key_columns(spark, tmp_path):
    """The doc-id sizing aggregation must never read `content`: its scan
    prunes to the two key columns (at 100 TB the content column is ~the
    whole table)."""
    from pyspark.sql import functions as F

    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import (
        _compute_boundaries,
        _shard_of_udf,
    )
    from text_indexer_spark.plans.checks import read_schema_columns

    d = str(tmp_path / "corpus_pq")
    synthetic_corpus(spark, n_docs=50, avg_tokens=5).write.parquet(d)
    corpus = spark.read.parquet(d)
    bounds = _compute_boundaries(corpus, 4)
    shard_of = _shard_of_udf(bounds)
    sizes = (
        corpus.select("repo", "path")
        .withColumn("_pid", shard_of("repo", "path"))
        .groupBy("_pid")
        .agg(F.countDistinct("repo", "path").alias("n"))
    )
    assert read_schema_columns(sizes) == {"repo", "path"}
    # the boundary sample is equally pruned
    sample = corpus.select(
        F.concat(F.col("repo"), F.lit("\x01"), F.col("path")).alias("k"),
        F.xxhash64("repo", "path").alias("h"),
    ).orderBy("h").limit(64)
    assert read_schema_columns(sample) == {"repo", "path"}


def test_build_stage_a_single_exchange(spark, tmp_path):
    """The sharding+sort pipeline of stage A contains exactly ONE
    shuffle exchange — content crosses the network once."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import (
        _compute_boundaries,
        _route_tokens,
        _sharded_sorted,
    )
    from text_indexer_spark.plans.checks import count_exchanges

    d = str(tmp_path / "corpus_pq2")
    synthetic_corpus(spark, n_docs=50, avg_tokens=5).write.parquet(d)
    corpus = spark.read.parquet(d)
    bounds = _compute_boundaries(corpus, 4)
    route = _route_tokens(spark, 4)
    sorted_df = _sharded_sorted(corpus, bounds, route)
    assert count_exchanges(sorted_df) == 1


def test_dsl_scan_filter_pushed(spark, tmp_path):
    """The unified-DSL index path issues ONE scan whose combined leaf
    filter (term IN ... OR startswith) reaches the parquet source, and
    a phrase-free query must not read the positional payload column."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import (
        build_index,
        load_posting_lists,
    )
    from text_indexer_spark.operators.querylang import match_query_index

    idx = str(tmp_path / "dsl_idx")
    build_index(
        synthetic_corpus(spark, 50, avg_tokens=20), idx, num_shards=2,
        with_positions=True,
    )
    lists = load_posting_lists(spark, idx)
    q = match_query_index(lists, "data AND (ind* OR query)")
    # the whole leaf filter is one Or tree -> pushed as one predicate
    assert has_pushed_filter(q, "term")
    plan = formatted_plan(q)
    assert plan.count("PushedFilters") == 1  # exactly one scan
    assert "positions_varbyte" not in read_schema_columns(q)
    # a phrase query DOES read the payload
    q2 = match_query_index(lists, '"data index" OR query')
    assert "positions_varbyte" in read_schema_columns(q2)


def test_decontam_broadcasts_eval_side(spark):
    """Decontamination must broadcast the (small) eval n-gram set and
    the contaminated-id set — the corpus side never shuffles."""
    from text_indexer_spark.operators import decontam

    docs = load_table(spark, SF, "documents")
    ev = decontam.eval_ngrams(docs.filter(F.col("doc_id") % 41 == 0), n=4)
    plan_hits = formatted_plan(decontam.contamination_hits(docs, ev, n=4))
    assert "BroadcastHashJoin" in plan_hits
    plan_clean = formatted_plan(decontam.decontaminate(docs, ev, n=4))
    assert "BroadcastHashJoin" in plan_clean
    # the anti-join of the cleaned corpus must be broadcast, not shuffled
    assert "LeftAnti BuildRight" in plan_clean


def test_bm25f_broadcasts_stats_sides(spark):
    """BM25F joins field averages and per-term dfs as broadcasts; the
    only exchanges key on doc_id (fold + final sum + top-k)."""
    from text_indexer_spark.operators.serving import bm25f_topk, field_postings

    docs = load_table(spark, SF, "documents")
    fps = field_postings(docs, {"source": "source", "text": "text"})
    plan = formatted_plan(
        bm25f_topk(fps, ["spark", "src3"], {"source": 3.0, "text": 1.0})
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_suggest_fuzzy_single_scan_no_join(spark):
    """Typo-tolerant autocomplete is ONE vocabulary scan + top-k: no
    joins of any kind in the plan."""
    from text_indexer_spark.operators.serving import suggest_terms_fuzzy

    stats = spark.createDataFrame([("table", 3)], "term string, df long")
    plan = formatted_plan(suggest_terms_fuzzy(stats, "tble"))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_lang_routing_single_pass(spark):
    """Per-language routing is one mapInPandas over one scan — no
    union-of-filtered-scans, no shuffle before the tf aggregation done
    inside the pass."""
    from text_indexer_spark.operators.langroute import tokenize_postings_by_lang

    docs = load_table(spark, SF, "documents")
    import re

    plan = formatted_plan(tokenize_postings_by_lang(docs))
    # one numbered scan node in the formatted plan detail section
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert count_exchanges(tokenize_postings_by_lang(docs)) == 0


def test_trigram_grep_prunes_with_index(spark, tmp_path):
    """The trigram-accelerated grep: gram IN-list reaches the persisted
    trigram-postings scan (PushedFilters), the corpus side is verified
    behind a semi join (the regex runs over candidates only, never as a
    bare full-scan filter), and the trigram build itself is one
    shuffle-free codegen scan."""
    from text_indexer_spark.operators.trigram import grep_trigram, trigram_postings

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # ingest-time layout: trigram postings persisted like a real deploy
    tri_dir = str(tmp_path / "tri")
    tri_build = trigram_postings(docs)
    assert count_exchanges(tri_build) == 0  # build is scan+explode only
    tri_build.write.parquet(tri_dir)
    tri = spark.read.parquet(tri_dir)

    q = grep_trigram(docs, tri, "quer[a-z]+")
    plan = formatted_plan(q)
    assert has_pushed_filter(q, "gram")          # IN-list at the scan
    assert "CartesianProduct" not in plan
    # THE property that makes the index an index: the verification
    # regex must evaluate ABOVE the join (over candidates only). In
    # formatted plans children number before parents, so every node
    # mentioning the regex must number HIGHER than the join node —
    # a pushed-below-the-join regex (full corpus scan) numbers lower.
    import re as _re

    parts = _re.split(r"^\((\d+)\) ", plan, flags=_re.M)
    blocks = {
        int(parts[i]): parts[i + 1] for i in range(1, len(parts) - 1, 2)
    }
    join_n = min(n for n, b in blocks.items() if "Join" in b.split("\n")[0])
    regex_nodes = [n for n, b in blocks.items() if "regexp_extract_all" in b]
    # >= join_n: Catalyst may fold the guard INTO the join condition,
    # which evaluates per matched pair — still candidates-only
    assert regex_nodes and all(n >= join_n for n in regex_nodes), (
        regex_nodes, join_n,
    )


def test_trigram_grep_pushdown_prunes_corpus_scan(spark, tmp_path):
    """The id-pushdown probe: candidate doc ids land as an IN-list ON
    THE CORPUS SCAN itself (PushedFilters → row-group pruning on an
    id-sorted layout), the plan has NO join, and the regex evaluates
    only above that pruned scan."""
    from text_indexer_spark.operators.trigram import (
        grep_trigram_pushdown,
        trigram_postings,
    )

    corp_dir = str(tmp_path / "corp")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # serving layout: corpus sorted by doc_id so id IN-lists prune blocks
    docs.repartitionByRange(4, "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.parquet(corp_dir)
    corpus = spark.read.parquet(corp_dir)
    tri = trigram_postings(corpus).cache()

    q = grep_trigram_pushdown(corpus, tri, "quer[a-z]+")
    plan = formatted_plan(q)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert has_pushed_filter(q, "doc_id")  # the IN-list reached the scan
    assert q.count() > 0  # non-degenerate: candidates existed


def test_trigram_grep_fallback_is_full_scan(spark):
    """No usable literal → the SAME full-scan relation/plan as
    regex_grep: no joins, no aggregation, one corpus scan."""
    from text_indexer_spark.operators.trigram import grep_trigram, trigram_postings

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    q = grep_trigram(docs, trigram_postings(docs), "s[a-z]+m")
    plan = formatted_plan(q)
    assert "Join" not in plan and count_exchanges(q) == 0


def test_optimize_rewrite_is_shuffle_free(spark, tmp_path):
    """optimize_index's per-shard rewrite: the only exchange in the
    whole pass is the 1-row-per-shard task-routing groupBy — no corpus
    or postings data crosses the wire (rewrite reads old shard files
    inside the task)."""
    from text_indexer_spark.corpus import synthetic_corpus
    from text_indexer_spark.operators.index_build import build_index
    from text_indexer_spark.operators.index_optimize import optimize_index

    idx = str(tmp_path / "oidx")
    build_index(synthetic_corpus(spark, 40, avg_tokens=15), idx, num_shards=2)
    out = str(tmp_path / "oout")
    # plan property asserted structurally: shards_df has exactly
    # num_shards rows; the heavy IO happens file-local inside the task
    m = optimize_index(spark, idx, out)
    assert m["optimized"] is True and m["num_shards"] == 2


def test_committed_trigram_grep_plan(spark, tmp_path):
    """Grep over the COMMITTED (segmented) trigram index keeps every
    100 TB property through the union: the gram IN-list is pushed into
    EVERY segment scan, tombstones and candidates are broadcast (never a
    corpus shuffle), and the verification regex stays in the join
    condition — above the join, candidates only."""
    from text_indexer_spark.operators.trigram import (
        grep_trigram,
        read_committed_trigrams,
        trigram_commit,
    )

    docs = spark.createDataFrame(
        [(i, f"hello world {i} quicksilver") for i in range(50)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "tri")
    trigram_commit(docs, d)
    trigram_commit(
        docs.limit(5), d,
        removed_ids=spark.createDataFrame([(1,), (2,)], "doc_id long"),
    )
    q = grep_trigram(docs, read_committed_trigrams(spark, d), "quic[a-z]+")
    plan = formatted_plan(q)
    # both segment scans carry the pushed gram IN-list
    assert plan.count("In(gram, [qui,uic])") == 2
    # tombstone max-version join + candidate join are both broadcast
    assert broadcast_join_count(q) >= 2
    assert "CartesianProduct" not in plan
    # the regex runs as a join condition (post-join, candidate rows only),
    # never as a standalone filter Catalyst could push below the join
    assert "Join condition: ((cast(size(regexp_extract_all" in plan


def test_batch_grep_plan_one_probe_pruned_verify(spark, tmp_path):
    """grep_trigram_batch over the committed index: ONE probe carries
    the UNION of all patterns' gram IN-lists into every segment scan,
    the verify corpus scan is pruned by the pushed candidate doc_id
    IN-list, and the fallback tier rides the same job as a generator
    (no extra join, no cartesian)."""
    from text_indexer_spark.operators.trigram import (
        grep_trigram_batch,
        read_committed_trigrams,
        required_grams,
        trigram_commit,
    )

    docs = spark.createDataFrame(
        [(i, f"hello world {i} quicksilver stream") for i in range(50)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "tri")
    trigram_commit(docs, d)
    trigram_commit(docs.limit(5), d)  # second segment
    pats = ["quic[a-z]+", "stream", "a.b"]  # 2 indexed + 1 fallback
    tri = read_committed_trigrams(spark, d)
    # JOIN form (cap disabled): the probe is part of the lazy plan, so
    # the union of both patterns' grams must appear as ONE IN-list
    # pushed into BOTH segment scans (2 occurrences = one probe over
    # the segments, not one probe per pattern)
    qj = grep_trigram_batch(docs, tri, pats, max_pushdown_ids=None)
    plan_j = formatted_plan(qj)
    union_grams = sorted(
        set(required_grams(pats[0])) | set(required_grams(pats[1]))
    )
    needle = "In(gram, [" + ",".join(union_grams) + "])"
    assert plan_j.count(needle) == 2
    assert "CartesianProduct" not in plan_j
    # PUSHDOWN form (default): the probe ran EAGERLY exactly once (the
    # bounded pair collect) — the verify plan contains NO gram probe at
    # all, only the id-pruned corpus scan joined to the localized pairs
    qp = grep_trigram_batch(docs, tri, pats)
    plan_p = formatted_plan(qp)
    assert needle not in plan_p          # no second probe in the verify
    # pruned corpus source: IN-list filter on doc_id (shows as a pushed
    # scan filter on parquet sources, a plain Filter on in-memory ones)
    import re as _re

    assert (
        "In(doc_id" in plan_p
        or _re.search(r"doc_id#\d+L? IN(SET)? ", plan_p)
    )
    assert "CartesianProduct" not in plan_p


def test_lm_scoring_plan_no_cartesian(spark):
    """The LM scorer's count-table joins must never degrade to a
    nested-loop product (equi-keys on (w1, w2)/(w1) throughout)."""
    from text_indexer_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b c a")], "doc_id long, text string"
    )
    q = lm.lm_self_score(docs)
    plan = formatted_plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_dedup_shuffle_budget_and_join_shapes(spark):
    """Span dedup's scale contract: the digest count + semi-join +
    covered-distinct + token anti-join + doc reassembly bound the
    exchange count (partial aggregation keeps each at one exchange);
    the duplicated-digest semi-join must NOT be a broadcast (at web
    scale that set is tens of GB — AQE may pick one at toy scale, so
    pin with AQE off); no nested-loop products anywhere."""
    from text_indexer_spark.operators import spandedup

    docs = spark.createDataFrame(
        [(i, "all rights reserved contact us for more info today "
              f"unique{i}") for i in range(6)],
        "doc_id long, text string",
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = spandedup.dedup_spans(docs, n=8)
        plan = formatted_plan(q)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert broadcast_join_count(q) == 0
        # occurrence->count, semi-join, covered distinct, anti-join,
        # reassembly: five key-exchanges is the whole budget (each agg
        # is two-phase — partial before its exchange)
        assert count_exchanges(q) <= 5
        assert plan.count("SortMergeJoin") >= 2  # semi + anti, shuffled
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)

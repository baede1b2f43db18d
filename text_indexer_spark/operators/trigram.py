"""Trigram content index: substring / regex search without a full scan.

The inverted token index cannot serve patterns that cross token
boundaries; ``highlight.regex_grep`` covers them with a full content
scan — correct, but a full scan of a 100 TB corpus per grep is the one
access path that does not amortize. The standard fix for code search
(Google Code Search, Zoekt — R. Cox, "Regular Expression Matching with
a Trigram Index", public design) is a character-trigram index:

* ingest: each document contributes its DISTINCT lowercased character
  trigrams → a (gram, doc_id) postings relation. One codegen'd scan —
  ``transform(sequence(...))`` + ``array_distinct`` + ``explode`` — no
  Python workers;
* query: a conservative analyzer extracts literal substrings that EVERY
  match of the pattern must contain; their trigrams become a
  conjunctive filter over the gram postings (IN-pushdown scan → one
  aggregation → candidate doc ids);
* verify: the true regex runs ONLY over the candidate semi-join — the
  expensive scan tier touches a sliver of the corpus.

Correctness does not depend on the analyzer being smart, only on it
being SOUND (every extracted literal really is required): candidates
are a superset of matches and the verification regex is the final
word. Patterns with no usable literal (≥3 chars) fall back to the full
scan, same results.

Lowercasing makes the index case-insensitive (one index serves
case-sensitive and -insensitive queries); required grams are lowercased
to match, which only widens the candidate set — still sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from text_indexer_spark.operators.highlight import regex_grep

N = 3  # gram width; 3 is the published sweet spot for code corpora


def trigram_postings(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram) — the distinct lowercased char trigrams per document.

    Pure JVM expressions in one whole-stage-codegen scan; the explode is
    the only row amplification (bounded by content length) and there is
    NO shuffle — the relation lands partitioned exactly like the corpus,
    ready to be persisted bucketed by ``gram`` for IN-list pruned probes
    at serving time.

    The text is split ONCE into a codepoint array and each gram is three
    O(1) ``element_at`` lookups — O(len) per document. The naive form
    (one ``substr(text, i, N)`` per position) is O(len²): SQL substr
    walks the string from char 1 to locate codepoint ``i``, which is
    invisible on 300-char rows but cost ~40 M char-steps per 9 KB code
    file (measured: 2 k such docs took 50 s — real repos are 10 KB
    files, so that was the scale bug; this form ingests the same docs
    ~25× faster). ``split('')`` is codepoint-correct, matching substr
    semantics for non-BMP chars (verified in tests on emoji/CJK)."""
    chars_col = F.split(F.lower(F.col(text_col)), "")
    with_chars = corpus.select(F.col(id_col), chars_col.alias("_chars"))
    ch = F.col("_chars")
    # sequence(1, 0) would count DOWN — guard short docs explicitly
    grams = F.when(
        F.size(ch) >= N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ch) - F.lit(N - 1)),
                lambda i: F.concat(
                    *[F.element_at(ch, i + F.lit(k)) for k in range(N)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_chars.select(F.col(id_col), F.explode(grams).alias("gram"))


def _skip_class(pattern: str, i: int) -> int:
    """index just past a [...] character class starting at ``i``."""
    i += 1
    if i < len(pattern) and pattern[i] == "^":
        i += 1
    if i < len(pattern) and pattern[i] == "]":  # literal ] first
        i += 1
    while i < len(pattern) and pattern[i] != "]":
        if pattern[i] == "\\":
            i += 1
        i += 1
    return i + 1  # past ']'


def _skip_group(pattern: str, i: int) -> int:
    """index just past a (...) group starting at ``i`` (nesting +
    classes + escapes respected)."""
    depth = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "[":
            i = _skip_class(pattern, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return i


def literals_from_regex(pattern: str) -> list[str]:
    """Literal substrings REQUIRED by the pattern — every string the
    regex matches contains every returned literal.

    Conservative by construction (soundness is hypothesis-tested against
    Python ``re`` in tests/test_trigram.py):

    * any top-level alternation → give up entirely (return []);
    * groups are skipped wholesale (their contents may be optional);
      a quantifier after a group/class applies to the skipped part;
    * ``x?`` / ``x*`` / ``x{0,..}`` drop x from the current run;
    * ``x+`` / ``x{1,..}`` guarantee "…x" and "x…": the run up to x is
      flushed and a new run restarts at x (repetition may split the
      neighborhood but both sides stay required);
    * ``.``, anchors, and class shorthands (\\d, \\w, …) break the run;
      escaped punctuation (\\., \\+) is a literal character.
    """
    # alternation anywhere outside a class defeats required-ness of
    # everything (a|b requires neither) — scan for it first
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "[":
            i = _skip_class(pattern, i)
            continue
        if c == "|":
            return []
        i += 1

    literals: list[str] = []
    run: list[str] = []

    def flush() -> None:
        if run:
            literals.append("".join(run))
            run.clear()

    i = 0
    while i < n:
        c = pattern[i]
        if c == "\\":
            nxt = pattern[i + 1] if i + 1 < n else ""
            if nxt and not nxt.isalnum():
                run.append(nxt)  # escaped metachar = literal
            else:
                flush()  # \d \w \b \1 … = wildcard-ish
            i += 2
            continue
        if c == "[":
            flush()
            i = _skip_class(pattern, i)
            # a quantifier after the class applies to the class — the
            # run is already broken, nothing to trim
            if i < n and pattern[i] in "?*+":
                i += 1
            elif i < n and pattern[i] == "{":
                i = pattern.index("}", i) + 1 if "}" in pattern[i:] else n
            continue
        if c == "(":
            flush()
            i = _skip_group(pattern, i)
            if i < n and pattern[i] in "?*+":
                i += 1
            elif i < n and pattern[i] == "{":
                i = pattern.index("}", i) + 1 if "}" in pattern[i:] else n
            continue
        if c in ".^$":
            flush()
            i += 1
            continue
        if c in "?*":
            if run:
                run.pop()  # previous char now optional…
            flush()  # …and it may sit BETWEEN neighbors: break the run
            # ("ab?c" requires "a" and "c", never "ac")
            i += 1
            continue
        if c == "+":
            if run:
                last = run[-1]
                flush()
                run.append(last)  # "x…" side stays required
            i += 1
            continue
        if c == "{":
            end = pattern.find("}", i)
            if end < 0:
                run.append(c)  # not a quantifier — literal brace
                i += 1
                continue
            body = pattern[i + 1:end]
            min_rep = body.split(",")[0].strip()
            if run:
                if min_rep in ("", "0"):
                    run.pop()
                    flush()  # same run break as ?/* (char may be absent
                    # in some matches, present between neighbors in others)
                else:
                    last = run[-1]
                    flush()
                    run.append(last)
            i = end + 1
            continue
        run.append(c)
        i += 1
    flush()
    return [l for l in literals if l]


def required_grams(pattern: str, min_literal: int = N) -> list[str]:
    """The conjunctive trigram filter for ``pattern``, or [] when no
    literal is long enough to prune with (callers fall back to the full
    scan)."""
    grams: list[str] = []
    for lit in literals_from_regex(pattern):
        lit = lit.lower()
        if len(lit) >= min_literal:
            grams.extend(lit[i:i + N] for i in range(len(lit) - N + 1))
    # dedup, deterministic order
    return sorted(set(grams))


def candidate_ids(
    trigrams: DataFrame, pattern: str, id_col: str = "doc_id"
) -> DataFrame | None:
    """The superset of doc ids that can possibly match ``pattern``:
    IN-pruned gram scan → per-doc distinct-gram count == all required
    grams (conjunctive containment). ``None`` when the pattern yields no
    usable literal (callers must full-scan). Carries the ``_g`` count
    column so callers can build cross-side predicates (see
    ``grep_trigram``)."""
    grams = required_grams(pattern)
    if not grams:
        return None
    return (
        trigrams.filter(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("_g"))
        .filter(F.col("_g") == len(grams))
    )


def grep_trigram(
    corpus: DataFrame,
    trigrams: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Index-accelerated ``regex_grep``: same relation, sliver-scan cost.

    Plan shape at 100 TB: the gram postings scan gets the IN-list pushed
    down (probe cost ∝ the few grams' lists, not the index), one
    aggregation narrows to candidate ids, and the corpus scan runs the
    real regex behind a semi-join — only candidate documents are read.
    No usable literal → identical full-scan fallback."""
    cand = candidate_ids(trigrams, pattern, id_col=id_col)
    if cand is None:
        return regex_grep(corpus, pattern, text_col=text_col, id_col=id_col)
    return (
        corpus.join(cand, id_col, "inner")
        .withColumn(
            "n_matches", F.regexp_count(F.col(text_col), F.lit(pattern))
        )
        # single predicate referencing BOTH join sides: a bare
        # "n_matches > 0" is deterministic and one-sided, so Catalyst's
        # PushDownPredicate sinks it below the join — re-running the
        # regex over the ENTIRE corpus scan, silently undoing the
        # index. _g is always positive (the HAVING above pins it to
        # len(grams) ≥ 1), so (n_matches * _g) > 0 ⟺ n_matches > 0,
        # but the optimizer can neither split nor push it: the regex
        # provably evaluates over candidates only (plan-asserted in
        # tests/test_plans.py).
        .filter((F.col("n_matches") * F.col("_g")) > 0)
        .select(id_col, "n_matches")
    )


def grep_trigram_pushdown(
    corpus: DataFrame,
    trigrams: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_pushdown_ids: int = 10_000,
) -> DataFrame:
    """``grep_trigram`` with the candidate ids PUSHED INTO the corpus
    scan instead of joined against it.

    The join form is shuffle-free but still *reads* every corpus row's
    content column to probe the hash table — at 100 TB the scan IO, not
    the regex, is the bill. For selective patterns the candidate set is
    small and bounded, so the scale-correct move is the one every
    warehouse engine calls dynamic file/row-group pruning: materialize
    the candidate ids (one bounded collect — capped at
    ``max_pushdown_ids``), push them as an IN-list predicate into the
    corpus scan, and let parquet row-group stats skip everything else.
    On a corpus laid out sorted/partitioned by ``id_col`` the probe then
    reads only the candidate docs' blocks — the Zoekt/Code Search shape,
    where the index names the few files the regex must actually open.
    Block skipping bites when selectivity beats docs-per-row-group
    (true at 100 TB layouts; at bench scale ~2k-doc row groups each
    hold a candidate, so the measured win there is regex-work
    avoidance — verified by an inFilterThreshold A/B, identical times);
    the regex saving alone already measures 3.3× on backtracking
    patterns (BENCH/BASELINE.md big-docs segment).

    Falls back to the join form when the pattern has no usable literal
    or the candidate set exceeds the cap (non-selective pattern: the
    distributed join is the right plan there, and a driver-side IN-list
    that size would be the anti-pattern)."""
    cand = candidate_ids(trigrams, pattern, id_col=id_col)
    if cand is None:
        return regex_grep(corpus, pattern, text_col=text_col, id_col=id_col)
    ids = [
        r[0]
        for r in cand.select(id_col).limit(max_pushdown_ids + 1).collect()
    ]
    if len(ids) > max_pushdown_ids:
        return grep_trigram(
            corpus, trigrams, pattern, text_col=text_col, id_col=id_col
        )
    if not ids:
        return (
            corpus.select(
                F.col(id_col), F.lit(0).alias("n_matches")
            ).filter(F.lit(False))
        )
    return (
        corpus.filter(F.col(id_col).isin(ids))
        .select(
            F.col(id_col),
            F.regexp_count(F.col(text_col), F.lit(pattern)).alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


def grep_trigram_batch(
    corpus: DataFrame,
    trigrams: DataFrame | None,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_pushdown_ids: int | None = 10_000,
) -> DataFrame:
    """Multi-pattern grep in ONE index probe + ONE verify pass:
    ``(pattern, doc_id, n_matches)`` for every pattern, identical to
    running ``grep_trigram`` per pattern and unioning.

    The round-4 crossover measurements (BENCH/BASELINE.md big-docs
    segment) put numbers on what kills single-pattern index grep at
    bench scale: the FIXED per-job cost (~0.165 s/job on this VM) and
    the per-probe index scan, which a full corpus scan pays once no
    matter how many regexes it evaluates.  Batching restores the
    index's advantage arithmetic: the gram IN-list of the whole batch
    is pushed into ONE postings scan (row-group pruning intact — the
    union of a few patterns' grams is still a sliver), candidates come
    back per (pattern, doc) from ONE aggregation, and the verify tier
    runs each pattern's regex only over ITS candidate docs, all inside
    one job.  Patterns with no usable literal share ONE full-scan
    fallback pass (a generator-exploded pattern column — no join, the
    multi-regex scan every grep service runs for such patterns), so a
    mixed batch costs one probe + one scan instead of 2×|patterns|
    jobs.

    Mechanics per pattern: conjunctive containment is checked with a
    per-(pattern, doc) distinct-gram count against the pattern's
    required-gram count (the batched form of ``candidate_ids``); the
    verify ``regexp_count`` takes the PATTERN COLUMN, so the expression
    references both join sides and Catalyst cannot push it below the
    join into the corpus scan (the hazard ``grep_trigram`` defuses
    with its cross-side predicate — structurally impossible here).
    Duplicate patterns are deduped; order of the output is undefined
    (relation semantics, like every grep in this module).  With
    ``trigrams=None`` (no index available) every pattern rides the
    shared fallback scan — still one corpus pass for the whole batch.

    ``max_pushdown_ids`` applies the same dynamic row-group pruning as
    ``grep_trigram_pushdown`` to the batch: the (pattern, doc_id)
    candidate pairs are collected in ONE bounded pass (≤ |patterns| ×
    cap rows — above that the collect aborts and the plan stays a
    distributed join), the union id-list is pushed as an IN-list into
    the corpus scan, and the verify joins the LOCALIZED pair relation —
    so the gram-postings probe executes exactly once (a lazy ``cand``
    reused under the join would re-run the probe scan + aggregation a
    second time; observed and fixed).  ``None`` (or a blown cap) keeps
    the pure distributed-join verify."""
    pats = list(dict.fromkeys(patterns))
    if not pats:
        raise ValueError("patterns must be non-empty")
    spark = corpus.sparkSession
    indexed: list[tuple[str, list[str]]] = []
    fallback: list[str] = []
    for p in pats:
        grams = required_grams(p) if trigrams is not None else []
        (indexed if grams else fallback).append((p, grams) if grams else p)

    parts: list[DataFrame] = []
    if indexed:
        pat_rows = spark.createDataFrame(
            [(p, len(g)) for p, g in indexed], "pattern string, _need int"
        )
        gram_rows = spark.createDataFrame(
            sorted({(g, p) for p, gs in indexed for g in gs}),
            "gram string, pattern string",
        )
        all_grams = sorted({g for p, gs in indexed for g in gs})
        cand = (
            trigrams.filter(F.col("gram").isin(all_grams))
            .join(F.broadcast(gram_rows), "gram")
            .groupBy("pattern", id_col)
            .agg(F.count_distinct("gram").alias("_g"))
            .join(F.broadcast(pat_rows), "pattern")
            .filter(F.col("_g") == F.col("_need"))
            .select("pattern", id_col)
        )
        ver_src, cand_join = corpus, cand
        if max_pushdown_ids is not None:
            pair_cap = len(indexed) * max_pushdown_ids
            pairs = cand.limit(pair_cap + 1).collect()
            if len(pairs) <= pair_cap:
                ids = sorted({r[1] for r in pairs})
                # localize: the probe ran once (the collect above); the
                # verify joins these rows, never the lazy plan — even
                # when the id-list is too big to push into the scan
                # (re-joining the lazy ``cand`` would re-run the probe).
                # The id field keeps the corpus's own type: string /
                # int ids must round-trip, not crash on a long cast.
                id_type = corpus.schema[id_col].dataType
                cand_join = F.broadcast(
                    spark.createDataFrame(
                        [(r[0], r[1]) for r in pairs],
                        T.StructType(
                            [
                                T.StructField("pattern", T.StringType()),
                                T.StructField(id_col, id_type),
                            ]
                        ),
                    )
                )
                if not ids:
                    ver_src = corpus.filter(F.lit(False))
                elif len(ids) <= max_pushdown_ids:
                    ver_src = corpus.filter(F.col(id_col).isin(ids))
                # else: keep the full corpus side — the IN-list would
                # blow the pushdown budget, but the localized pairs
                # still guarantee a single probe execution
        parts.append(
            ver_src.join(cand_join, id_col)
            .withColumn(
                "n_matches",
                F.regexp_count(F.col(text_col), F.col("pattern")),
            )
            .filter(F.col("n_matches") > 0)
            .select("pattern", id_col, "n_matches")
        )
    if fallback:
        pat_arr = F.array(
            *[F.struct(F.lit(p).alias("pattern")) for p in fallback]
        )
        parts.append(
            corpus.select(
                F.col(id_col), F.col(text_col), F.explode(pat_arr).alias("_p")
            )
            .select(
                F.col("_p.pattern").alias("pattern"),
                F.col(id_col),
                F.regexp_count(F.col(text_col), F.col("_p.pattern")).alias(
                    "n_matches"
                ),
            )
            .filter(F.col("n_matches") > 0)
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def trigram_ingest(
    corpus: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> None:
    """Persist the trigram postings RANGE-PARTITIONED AND SORTED by
    ``gram`` — the ingest-time layout that makes probes cheap: every
    parquet row group's min/max then brackets a narrow gram range, so
    the pushed IN-list skips all but the few row groups holding the
    query's grams (runtime row-group pruning; at 100 TB this is the
    difference between scanning the whole gram index per grep and
    reading a handful of blocks). One extra shuffle at ingest, paid
    once.

    The range key is (gram, doc_id), not gram alone: stop-word-like hot
    grams (`" th"`, `"the"`) have corpus-sized posting lists, and a
    gram-only range partitioner must put all copies of one value in ONE
    partition — the exact skew the build's salted merge avoids for hot
    terms. The secondary key lets the range sampler split a hot gram at
    doc-id boundaries across many partitions; every partition stays
    bounded, and gram row-group min/max stats stay exactly as tight."""
    tri = trigram_postings(corpus, text_col=text_col, id_col=id_col)
    if num_partitions:
        tri = tri.repartitionByRange(num_partitions, "gram", id_col)
    else:
        tri = tri.repartitionByRange("gram", id_col)
    tri.sortWithinPartitions("gram", id_col).write.mode("overwrite").parquet(
        out_dir
    )


def substring_candidates(
    trigrams: DataFrame, needle: str, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate ids for a plain substring query (LIKE '%needle%',
    case-insensitive) — the degenerate one-literal case."""
    needle = needle.lower()
    grams = sorted({needle[i:i + N] for i in range(len(needle) - N + 1)})
    if not grams:
        raise ValueError(f"substring shorter than {N} chars cannot prune")
    return (
        trigrams.filter(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("_g"))
        .filter(F.col("_g") == len(grams))
        .select(id_col)
    )


def substring_search(
    corpus: DataFrame,
    trigrams: DataFrame,
    needle: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Case-insensitive substring match (``LIKE '%needle%'``) served
    from the trigram index: candidates from the conjunctive gram filter,
    ``contains`` verification held ABOVE the candidate join via the
    cross-side predicate (same reasoning as ``grep_trigram`` — a bare
    one-sided filter would be pushed below the join and re-scan the
    whole corpus). Needles shorter than one gram fall back to the full
    scan, same relation."""
    lneedle = needle.lower()
    if len(lneedle) < N:
        return corpus.filter(
            F.contains(F.lower(F.col(text_col)), F.lit(lneedle))
        ).select(id_col)
    cand = (
        trigrams.filter(
            F.col("gram").isin(
                sorted({lneedle[i:i + N] for i in range(len(lneedle) - N + 1)})
            )
        )
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("_g"))
        .filter(
            F.col("_g")
            == len({lneedle[i:i + N] for i in range(len(lneedle) - N + 1)})
        )
    )
    return (
        corpus.join(cand, id_col, "inner")
        .filter(
            (
                F.when(
                    F.contains(F.lower(F.col(text_col)), F.lit(lneedle)),
                    F.lit(1),
                ).otherwise(F.lit(0))
                * F.col("_g")
            )
            > 0
        )
        .select(id_col)
    )

# ---------------------------------------------------------------------------
# Committed trigram index: LSM-style segments + tombstones
# ---------------------------------------------------------------------------
# The persisted, incrementally-maintained form of the gram index — the
# same durability contract as the committed posting-list index
# (index_sync.py) and the registry state (registry.py): immutable
# parquet segments, a versioned JSON manifest, and an atomically swapped
# LATEST pointer, so a crash mid-sync never publishes a torn index.
#
# Layout under ``tri_dir``:
#     LATEST                    -> committed version number
#     manifest_v{V}.json        -> {"segments": [..], "tombstones": {seg: V}}
#     seg_{V}/                  gram-sorted parquet (id, gram), immutable
#     ts_{V}/                   parquet (id,) — docs dead as of version V
#
# Read view: a tombstone of version V kills a doc's rows in segments
# STRICTLY OLDER than V — a reindex commits the doc's new rows and its
# tombstone under the same version, and the new rows must survive their
# own commit (replace-on-reindex); remove-then-re-add also works (the
# re-added rows live in a newer segment). This is the standard
# segment/tombstone merge rule (Lucene deletes, LSM trees) and is
# exactly SQL: union segments (each tagged with its version), left join
# the per-doc max tombstone version, keep seg_ver >= ts_ver.
#
# At 100 TB: syncs touch only the delta (one small sorted segment + one
# tombstone list, no rewrite of the base); probes push the gram IN-list
# into EVERY segment scan (row-group pruned, segments are gram-sorted);
# tombstones are sync-sized, broadcast by AQE. Compaction folds the
# view back into one sorted base segment when the tail grows — same
# role as ``index_optimize`` for the token index.


def _tri_manifest(tri_dir: str) -> tuple[int, dict]:
    from text_indexer_spark import storage

    ptr = storage.read_bytes(storage.join(tri_dir, "LATEST"))
    if ptr is None:
        return 0, {"segments": [], "tombstones": {}}
    v = int(ptr.decode().strip())
    m = storage.read_json(storage.join(tri_dir, f"manifest_v{v:06d}.json"))
    return v, m


def _tri_commit(tri_dir: str, version: int, manifest: dict) -> None:
    from text_indexer_spark import storage

    storage.write_json_atomic(
        storage.join(tri_dir, f"manifest_v{version:06d}.json"), manifest
    )
    # guarded pointer swap: fails (ConcurrentCommitError) instead of
    # silently dropping a concurrent writer's commit — see
    # storage.swap_latest for the single-writer contract
    storage.swap_latest(tri_dir, version - 1, version)


def _write_segment(
    tri: DataFrame, seg_dir: str, num_partitions: int | None,
    id_col: str = "doc_id",
) -> None:
    # (gram, id) range key — hot grams split across partitions, see
    # trigram_ingest
    if num_partitions:
        tri = tri.repartitionByRange(num_partitions, "gram", id_col)
    else:
        tri = tri.repartitionByRange("gram", id_col)
    tri.sortWithinPartitions("gram", id_col).write.mode("overwrite").parquet(
        seg_dir
    )


def trigram_commit(
    corpus: DataFrame,
    tri_dir: str,
    removed_ids: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> int:
    """Commit one sync against the trigram index at ``tri_dir``.

    ``corpus`` holds the ADDED or REINDEXED documents (their grams form
    the new segment); ``removed_ids`` the doc ids whose old rows must
    die — pass reindexed ids here too (replace-on-reindex, same rule as
    ``sync.apply_diff_to_postings``). First call on an empty dir is the
    initial ingest. Returns the committed version."""
    from text_indexer_spark import storage

    cur, manifest = _tri_manifest(tri_dir)
    version = cur + 1
    seg = f"seg_{version:06d}"
    tri = trigram_postings(corpus, text_col=text_col, id_col=id_col)
    _write_segment(tri, storage.join(tri_dir, seg), num_partitions, id_col)
    manifest["segments"] = manifest["segments"] + [seg]
    if removed_ids is not None:
        ts = f"ts_{version:06d}"
        removed_ids.select(F.col(id_col)).write.mode("overwrite").parquet(
            storage.join(tri_dir, ts)
        )
        manifest["tombstones"] = {**manifest["tombstones"], ts: version}
    _tri_commit(tri_dir, version, manifest)
    return version


def read_committed_trigrams(
    spark, tri_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """The live (id, gram) view of a committed trigram index: segments
    unioned (each tagged with its commit version), rows killed by any
    STRICTLY-newer tombstone naming their doc (same-version rows survive:
    that's a reindex's own commit). Gram IN-lists still push into every
    segment scan."""
    from text_indexer_spark import storage

    _, manifest = _tri_manifest(tri_dir)
    if not manifest["segments"]:
        raise FileNotFoundError(f"no committed trigram index at {tri_dir}")
    parts = []
    for seg in manifest["segments"]:
        ver = int(seg.rsplit("_", 1)[1])
        parts.append(
            spark.read.parquet(storage.join(tri_dir, seg)).withColumn(
                "_seg_ver", F.lit(ver)
            )
        )
    view = parts[0]
    for p in parts[1:]:
        view = view.unionByName(p)
    if manifest["tombstones"]:
        ts_parts = [
            spark.read.parquet(storage.join(tri_dir, ts)).withColumn(
                "_ts_ver", F.lit(ver)
            )
            for ts, ver in manifest["tombstones"].items()
        ]
        tomb = ts_parts[0]
        for p in ts_parts[1:]:
            tomb = tomb.unionByName(p)
        tomb = tomb.groupBy(id_col).agg(F.max("_ts_ver").alias("_ts_ver"))
        view = (
            view.join(tomb, id_col, "left")
            .filter(F.col("_ts_ver").isNull() | (F.col("_seg_ver") >= F.col("_ts_ver")))
        )
    return view.select(id_col, "gram")


def trigram_compact(
    spark, tri_dir: str, id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> int:
    """Fold the live view into ONE fresh gram-sorted segment and commit
    a manifest with no tombstones — the ``index_optimize`` analogue.
    Old segments stay on disk until vacuumed (readers of older versions
    keep working; the LATEST swap is atomic)."""
    from text_indexer_spark import storage

    cur, _ = _tri_manifest(tri_dir)
    view = read_committed_trigrams(spark, tri_dir, id_col=id_col)
    version = cur + 1
    seg = f"seg_{version:06d}"
    _write_segment(view, storage.join(tri_dir, seg), num_partitions, id_col)
    _tri_commit(tri_dir, version, {"segments": [seg], "tombstones": {}})
    return version


def trigram_vacuum(tri_dir: str, keep_versions: int = 1) -> list[str]:
    """Delete segments, tombstones and manifests no version in the
    newest ``keep_versions`` window references — the retention half
    :func:`trigram_compact` defers ("old segments stay on disk until
    vacuumed").

    Reachability, not age, decides: a segment written at version 3 and
    still referenced by the LATEST manifest survives any vacuum; a
    segment compaction dropped from the manifest is deleted once every
    kept manifest stopped referencing it.  Files whose encoded version
    is ABOVE the LATEST pointer are never touched — they belong to an
    in-flight commit (`_tri_commit` writes the segment before the
    pointer swap); deleting them would corrupt it.  Idempotent.
    Returns removed base names, sorted."""
    from text_indexer_spark import storage

    cur, _ = _tri_manifest(tri_dir)
    if cur == 0:
        return []
    floor = max(1, cur - max(keep_versions, 1) + 1)
    keep: set[str] = set()
    for v in range(floor, cur + 1):
        m = storage.read_json(
            storage.join(tri_dir, f"manifest_v{v:06d}.json")
        )
        if m:
            keep.update(m.get("segments", []))
            keep.update(m.get("tombstones", {}))
    removed: list[str] = []
    for name in storage.listdir(tri_dir):
        if name.startswith(("seg_", "ts_")):
            v = int(name.split("_", 1)[1])
            if v > cur or name in keep:
                continue
            storage.rmtree(storage.join(tri_dir, name))
            removed.append(name)
        elif name.startswith("manifest_v") and name.endswith(".json"):
            v = int(name[len("manifest_v") : -len(".json")])
            if v >= floor:  # kept window + above-pointer orphans
                continue
            storage.remove_file(storage.join(tri_dir, name))
            removed.append(name)
    return sorted(removed)

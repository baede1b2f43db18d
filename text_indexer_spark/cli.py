"""spark-submit entry point.

    spark-submit --py-files text_indexer_spark.zip -m ... cli.py build \
        --corpus /path/to/corpus_parquet --index /path/to/index --shards 256
    ... cli.py query  --index /path/to/index --query "merge vector stream" -k 10
    ... cli.py sync   --index-catalog ... --postings ... --source ...
    ... cli.py merge  --index /path/to/index --out /path/to/term_major

(also runnable as ``python -m text_indexer_spark.cli`` locally — the
session factory picks local[$SPARK_GRAFT_CPUS]).

Each subcommand is a thin wrapper over the operator modules; all heavy
lifting stays declarative so the SAME code runs on a 1000-executor
cluster: only ``--master``/deploy mode change.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from text_indexer_spark.session import get_spark

    return get_spark("text-indexer-cli", master=args.master)


def cmd_build(args) -> int:
    from text_indexer_spark.operators.index_build import build_index

    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    manifest = build_index(
        corpus,
        args.index,
        num_shards=args.shards,
        verify_sha=None if not args.no_verify_sha else False,
        resume=not args.no_resume,
        with_positions=args.positions,
    )
    print(json.dumps(manifest))
    return 0


def cmd_query(args) -> int:
    from text_indexer_spark.operators.index_build import load_catalog, load_posting_lists
    from text_indexer_spark.operators.wand import wand_topk
    from text_indexer_spark.tokenizer import tokenize_text

    spark = _spark(args)
    terms = tokenize_text(args.query)
    lists = load_posting_lists(spark, args.index)
    top = wand_topk(lists, terms, k=args.k, round_to=4)
    cat = load_catalog(spark, args.index).select("doc_id", "repo", "path")
    rows = (
        top.join(cat, "doc_id", "left")
        .select("doc_id", "repo", "path", "score")
        .orderBy("score", ascending=False)
        .collect()
    )
    for r in rows:
        print(json.dumps({c: r[c] for c in ("doc_id", "repo", "path", "score")}))
    return 0


def cmd_search(args) -> int:
    """Full query-DSL search over a committed index: quoted phrases
    (positional build required), ``pre*`` prefixes, wildcards and
    AND/OR/NOT — ranked by the stored BM25 weights when the query has
    positively-used terms, else an unranked path listing (the
    reference's own result shape)."""
    from text_indexer_spark.operators.index_build import (
        load_catalog,
        load_posting_lists,
    )
    from text_indexer_spark.operators.querylang import (
        dsl_bm25_topk_index,
        match_query_index,
        parse_dsl,
        positive_score_terms,
    )

    spark = _spark(args)
    node = parse_dsl(args.query)
    lists = load_posting_lists(spark, args.index)
    cat = load_catalog(spark, args.index).select("doc_id", "repo", "path")
    if args.unranked or not positive_score_terms(node):
        rows = (
            match_query_index(lists, node)
            .join(cat, "doc_id", "left")
            .orderBy("repo", "path")
            .limit(args.k)
            .collect()
        )
        for r in rows:
            print(json.dumps({c: r[c] for c in ("doc_id", "repo", "path")}))
    else:
        rows = (
            dsl_bm25_topk_index(lists, node, k=args.k, round_to=4)
            .join(cat, "doc_id", "left")
            .orderBy("score", ascending=False)
            .collect()
        )
        for r in rows:
            print(json.dumps(
                {c: r[c] for c in ("doc_id", "repo", "path", "score")}
            ))
    return 0


def cmd_sync(args) -> int:
    from text_indexer_spark.operators.sync import sync_index

    spark = _spark(args)
    catalog = spark.read.parquet(args.catalog)
    postings = spark.read.parquet(args.postings)
    source = spark.read.parquet(args.source)
    cat2, post2, diff = sync_index(catalog, postings, source)
    counts = {r["change"]: r["n"] for r in
              diff.groupBy("change").count().withColumnRenamed("count", "n").collect()}
    cat2.write.mode("overwrite").parquet(args.out_catalog)
    post2.write.mode("overwrite").parquet(args.out_postings)
    print(json.dumps({"diff": counts}))
    return 0


def cmd_sync_index(args) -> int:
    from text_indexer_spark.operators.index_sync import sync_index_dir

    spark = _spark(args)
    source = spark.read.parquet(args.source)
    manifest = sync_index_dir(spark, args.index, source, args.out)
    print(json.dumps({
        "version": manifest["version"],
        "n_docs": manifest["n_docs"],
        "synced": manifest["synced"],
    }))
    return 0


def cmd_optimize(args) -> int:
    """Compaction: restore the build's doc-id layout after incremental
    syncs (contiguous scoped serving, tight delta gaps) — no re-tokenize,
    no shuffle; the result equals a from-scratch rebuild byte for byte."""
    from text_indexer_spark.operators.index_optimize import optimize_index

    spark = _spark(args)
    manifest = optimize_index(spark, args.index, args.out)
    print(json.dumps({
        "version": manifest["version"],
        "n_docs": manifest["n_docs"],
        "optimized": manifest["optimized"],
        "built_sec": round(manifest["built_sec"], 3),
    }))
    return 0


def cmd_merge(args) -> int:
    from text_indexer_spark.operators.index_build import load_posting_lists
    from text_indexer_spark.operators.merge import merge_term_major

    spark = _spark(args)
    merged = merge_term_major(load_posting_lists(spark, args.index))
    merged.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"terms": merged.count()}))
    return 0


def cmd_dedup(args) -> int:
    """Exact + MinHash/LSH near-dup detection → connected-component
    clusters → cleaned corpus written out (min-id canonical kept)."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators import cluster, dedup

    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    id_corpus = corpus.withColumn(
        "doc_id", F.xxhash64(F.coalesce(F.col("repo"), F.lit("")), F.coalesce(F.col("path"), F.lit("")))
    ) if "doc_id" not in corpus.columns else corpus
    text_col = "content" if "content" in id_corpus.columns else "text"
    edges = (
        dedup.exact_dedup(id_corpus, text_col=text_col)
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select(F.col("canonical_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    if not args.exact_only:
        sigs = dedup.minhash_signatures(
            id_corpus, num_hashes=args.minhashes, n=args.shingle_n, text_col=text_col
        )
        edges = edges.unionByName(
            dedup.lsh_candidate_pairs(sigs, num_hashes=args.minhashes, bands=args.bands)
        )
    clusters = cluster.dedup_clusters(edges)
    kept = cluster.materialize_deduped(id_corpus, clusters)
    kept.write.mode("overwrite").parquet(args.out)
    n_in, n_out = id_corpus.count(), kept.count()
    print(json.dumps({"rows_in": n_in, "rows_kept": n_out, "rows_dropped": n_in - n_out}))
    return 0


def cmd_clean(args) -> int:
    """The full pre-training hygiene pipeline in one pass order:
    quality filter → repetition filter → (optional) benchmark
    decontamination → cleaned corpus written out. The two filters are
    row-local (fuse into the scan); decontamination adds one broadcast
    of the eval n-gram set. Dedup is its own command (`dedup`) because
    its cluster step is iterative."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators import decontam, textstats

    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    text_col = "content" if "content" in corpus.columns else "text"
    if args.normalize:
        # canonicalize BEFORE any filter/hash tier sees the text:
        # ws = codegen whitespace/control tier only; nfc/nfkc add the
        # Unicode normal form (operators/normalize.py)
        from text_indexer_spark.operators import normalize as norm_op

        form = None if args.normalize == "ws" else args.normalize.upper()
        corpus = norm_op.normalize_text(corpus, text_col=text_col, form=form)
    n_in = corpus.count()
    kept = corpus
    if args.block_domains or args.block_words:
        # C4 blocklist cuts run first: cheapest row-local/semi-join
        # filters, and nothing downstream should ever see blocked docs
        from text_indexer_spark.operators import urlfilter

        id_col = "doc_id" if "doc_id" in kept.columns else None
        if id_col is None:
            parts = [
                F.coalesce(F.col(c).cast("string"), F.lit(""))
                for c in ("repo", "path")
                if c in kept.columns
            ]
            parts.append(F.coalesce(F.col(text_col), F.lit("")))
            kept = kept.withColumn("doc_id", F.xxhash64(*parts))
        if args.block_domains:
            bl = spark.read.parquet(args.block_domains)
            kept = urlfilter.filter_blocked_domains(
                kept, bl, text_col=text_col
            )
        if args.block_words:
            kept = urlfilter.filter_blocked_words(
                kept,
                [w for w in args.block_words.split(",") if w.strip()],
                text_col=text_col,
            )
        if id_col is None:
            kept = kept.drop("doc_id")
    kept = textstats.filter_by_quality(
        kept, min_quality=args.min_quality, text_col=text_col
    )
    kept = textstats.filter_by_repetition(
        kept,
        max_dup_line_frac=args.max_dup_line_frac,
        max_top_2gram_frac=args.max_top_2gram_frac,
        text_col=text_col,
    )
    if args.max_ppl is not None:
        # CCNet-style LM cut: train the add-k bigram model on the
        # post-filter corpus, keep docs whose perplexity clears the
        # threshold (docs too short for bigrams carry no LM evidence
        # and are kept — the length cuts above already own them)
        from text_indexer_spark.operators import lm

        id_for_lm = "doc_id" if "doc_id" in kept.columns else None
        if id_for_lm is None:
            parts = [
                F.coalesce(F.col(c).cast("string"), F.lit(""))
                for c in ("repo", "path")
                if c in kept.columns
            ]
            parts.append(F.coalesce(F.col(text_col), F.lit("")))
            kept = kept.withColumn("doc_id", F.xxhash64(*parts))
        high = (
            lm.lm_self_score(kept, text_col=text_col)
            .filter(F.col("ppl") > args.max_ppl)
            .select("doc_id")
        )
        # no forced broadcast: unlike decontam hits (rare by contract),
        # a tight --max-ppl can flag an unbounded fraction of the corpus
        # — let AQE size the anti-join side
        kept = kept.join(high, "doc_id", "left_anti")
        if id_for_lm is None:
            kept = kept.drop("doc_id")
    n_contaminated = 0
    if args.evalset:
        ev_df = spark.read.parquet(args.evalset)
        ev_text = "content" if "content" in ev_df.columns else "text"
        ev = decontam.eval_ngrams(ev_df, n=args.decontam_n, text_col=ev_text)
        id_col = "doc_id" if "doc_id" in kept.columns else None
        if id_col is None:
            # Fallback id for arbitrary corpora: hash whatever identity
            # columns exist PLUS the text itself, so two distinct docs
            # can only collide if they are byte-identical (in which case
            # dropping both on contamination is the right outcome).
            parts = [
                F.coalesce(F.col(c).cast("string"), F.lit(""))
                for c in ("repo", "path")
                if c in kept.columns
            ]
            parts.append(F.coalesce(F.col(text_col), F.lit("")))
            kept = kept.withColumn("doc_id", F.xxhash64(*parts))
        flag_src = kept
        # --decontam-bloom forces the scale tier; otherwise a capped
        # count of the eval-gram set routes automatically, so a huge
        # eval suite can never be broadcast as raw strings by accident
        use_bloom = args.decontam_bloom or decontam.choose_tier(ev) == "bloom"
        if use_bloom:
            # scale path: bloom-prefilter the corpus so the exact gram
            # join (and the hit count) only touch bloom-positive docs;
            # superset guarantee keeps the count and output exact
            bloom = decontam.bloom_build(ev)
            flag_src = decontam.bloom_candidates(
                kept, bloom, n=args.decontam_n, text_col=text_col
            )
        hits = decontam.contamination_hits(
            flag_src, ev, n=args.decontam_n, text_col=text_col
        )
        n_contaminated = hits.count()
        kept = kept.join(
            F.broadcast(hits.select("doc_id")), "doc_id", "left_anti"
        )
        if id_col is None:
            kept = kept.drop("doc_id")
    kept.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "rows_in": n_in,
                "rows_kept": n_out,
                "rows_dropped": n_in - n_out,
                "contaminated": n_contaminated,
            }
        )
    )
    return 0


def cmd_ann_ingest(args) -> int:
    """Persist the IVF layout for an embeddings table: nearest-centroid
    assignment once, vectors partitioned by list (``cid``), centroids
    committed beside them; ``--quantize`` additionally stores int8
    codes + scale (IVF + SQ8 — ``ivf_topk_indexed_int8`` then serves
    with ¼ the probe IO and zero recall loss)."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.similarity import ivf_ingest

    spark = _spark(args)
    emb = spark.read.parquet(args.embeddings)
    first = (
        emb.filter(F.col("embedding").isNotNull())
        .select("embedding")
        .first()
    )
    if first is None:
        raise SystemExit("ann-ingest: embeddings table is empty (or all NULL)")
    dim = len(first["embedding"])
    ivf_ingest(
        emb, args.index, dim, n_centroids=args.centroids,
        quantize=args.quantize,
    )
    print(json.dumps({
        "index": args.index, "dim": dim, "centroids": args.centroids,
        "quantized": bool(args.quantize), "n_vectors": emb.count(),
    }))
    return 0


def cmd_ann_query(args) -> int:
    """Cosine top-k over a persisted IVF index. Queries come from a
    parquet of (query_id, query_vec) — or ``--query-ids`` picks vectors
    out of the index itself (query-by-example). Serves the int8 bound
    path automatically when the index was ingested with --quantize."""
    from text_indexer_spark import storage
    from text_indexer_spark.operators.similarity import (
        ivf_topk_indexed,
        ivf_topk_indexed_int8,
    )
    from pyspark.sql import functions as F

    spark = _spark(args)
    if bool(args.queries) == bool(args.query_ids):
        raise SystemExit("ann-query: pass exactly one of --queries / --query-ids")
    if args.queries:
        queries = spark.read.parquet(args.queries)
    else:
        ids = [int(x) for x in args.query_ids.split(",")]
        from text_indexer_spark.operators.vecstore import resolved_vectors

        # the LIVE view, not the base segment — query-by-example must
        # see upserted vectors and must not resurrect deleted ones
        queries = (
            resolved_vectors(spark, args.index)
            .filter(F.col("vec_id").isin(ids))
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
        )
    from text_indexer_spark.operators.vecstore import current_centroids

    meta = current_centroids(args.index)
    serve = ivf_topk_indexed_int8 if meta.get("quantized") else ivf_topk_indexed
    hits = serve(spark, args.index, queries, k=args.k, n_probe=args.n_probe)
    for r in hits.orderBy("query_id", F.desc("cos"), "vec_id").collect():
        print(json.dumps({
            "query_id": r["query_id"], "vec_id": r["vec_id"], "cos": r["cos"],
        }))
    return 0


def cmd_ann_upsert(args) -> int:
    """Commit a change set against a persisted IVF index: replace /
    insert the vectors in ``--embeddings``, remove ``--delete-ids`` —
    one immutable cid-partitioned delta segment plus a tombstone list;
    the base is never rewritten (``operators/vecstore.py``)."""
    from text_indexer_spark.operators.vecstore import ivf_upsert

    spark = _spark(args)
    if not args.embeddings and not args.delete_ids:
        raise SystemExit(
            "ann-upsert: pass --embeddings and/or --delete-ids"
        )
    ups = spark.read.parquet(args.embeddings) if args.embeddings else None
    dels = None
    if args.delete_ids:
        ids = [int(x) for x in args.delete_ids.split(",")]
        dels = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    version = ivf_upsert(spark, args.index, ups, dels)
    print(json.dumps({
        "index": args.index, "version": version,
        "n_upserts": ups.count() if ups is not None else 0,
        "n_deletes": dels.count() if dels is not None else 0,
    }))
    return 0


def cmd_ann_sync(args) -> int:
    """Drain a vector upsert/tombstone drop directory into the
    committed IVF store (one `ivf_upsert` version per micro-batch,
    availableNow trigger — the cron/test mode every other stream
    maintenance exposes); the checkpoint makes re-runs skip already-
    processed files."""
    from text_indexer_spark.streaming.vector_stream import (
        run_stream_vector_maintenance,
    )

    spark = _spark(args)
    q, version = run_stream_vector_maintenance(
        spark, args.drop_dir, args.checkpoint, args.index,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    q.awaitTermination()
    print(json.dumps({
        "index": args.index, "version": version(),
        "drop_dir": args.drop_dir,
    }))
    return 0


def cmd_ann_stats(args) -> int:
    """Store health: chain length, tombstone mass, per-cell live counts
    and imbalance — the numbers that decide when to `ann-compact` (and
    when to also `--retrain`)."""
    from text_indexer_spark.operators.vecstore import ivf_stats

    spark = _spark(args)
    print(json.dumps(ivf_stats(spark, args.index)))
    return 0


def cmd_ann_compact(args) -> int:
    """Fold the IVF segment chain back into one base segment (and with
    ``--retrain`` re-fit the coarse quantizer on the live corpus) —
    the answer to tombstone-chain growth and assignment drift after
    heavy upserting."""
    from text_indexer_spark.operators.vecstore import ivf_compact

    spark = _spark(args)
    version = ivf_compact(spark, args.index, retrain=args.retrain)
    print(json.dumps({
        "index": args.index, "version": version,
        "retrained": bool(args.retrain),
    }))
    return 0


def cmd_dedup_lines(args) -> int:
    """Corpus-wide line dedup (C4/CCNet rule): lines occurring in
    ``--min-docs`` distinct documents are removed from every document,
    text reassembled in order, all-boilerplate docs dropped
    (``operators/linededup.py``)."""
    from text_indexer_spark.operators import linededup

    spark = _spark(args)
    corpus = _grep_docs(spark.read.parquet(args.corpus))
    n_in = corpus.count()
    n_shared = linededup.shared_lines(corpus, min_docs=args.min_docs).count()
    kept = linededup.dedup_lines(corpus, min_docs=args.min_docs)
    kept.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "rows_in": n_in,
                "rows_kept": n_out,
                "rows_dropped": n_in - n_out,
                "shared_lines": n_shared,
            }
        )
    )
    return 0


def cmd_dedup_spans(args) -> int:
    """Exact repeated-substring dedup (Lee et al. 2021 ExactSubstr
    rule): every token covered by an ``--n``-token window occurring
    ``--min-count`` or more times corpus-wide is removed from every
    document; survivors reassemble in order, fully-duplicated docs
    drop (``operators/spandedup.py``).  Output text is the tokenized
    (lowercased, delimiter-collapsed) rendering — span identity lives
    at token grain."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators import spandedup

    spark = _spark(args)
    corpus = _grep_docs(spark.read.parquet(args.corpus))
    n_in = corpus.count()
    kept = spandedup.dedup_spans(
        corpus, n=args.n, min_count=args.min_count
    )
    kept.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    removed = (
        spandedup.span_dedup_stats(
            corpus, n=args.n, min_count=args.min_count
        )
        .agg(
            F.sum("n_tokens").alias("t"), F.sum("n_removed").alias("r")
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "rows_in": n_in,
                "rows_kept": n_out,
                "rows_dropped": n_in - n_out,
                "tokens_total": removed["t"] or 0,
                "tokens_removed": removed["r"] or 0,
            }
        )
    )
    return 0


def cmd_media_resize(args) -> int:
    """Resize every image payload in a media table to ``--width`` ×
    ``--height`` (decode BMP → nearest-neighbor resample → re-encode);
    audio/video/unknown payloads pass through byte-identical
    (``operators/multimodal.py:resize_images``).  ``--lenient`` passes
    undecodable image-magic payloads through unresized instead of
    failing the job (the decode_media degradation contract)."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators import multimodal

    spark = _spark(args)
    media = spark.read.parquet(args.media)
    out = multimodal.resize_images(
        media, args.width, args.height, strict=not args.lenient
    )
    out.write.mode("overwrite").parquet(args.out)
    back = spark.read.parquet(args.out)
    counts = back.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("resized").cast("long")).alias("resized"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "rows": counts["rows"],
                "images_resized": counts["resized"] or 0,
                "passthrough": counts["rows"] - (counts["resized"] or 0),
                "width": args.width,
                "height": args.height,
            }
        )
    )
    return 0


def cmd_mix(args) -> int:
    """Data-mixture sampling: per-source token budgets from mixture
    weights, deterministic content-stable draws
    (``operators/mixing.py``).  ``--weights "en=0.5,fr=0.3"``; sources
    not listed are dropped."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators import mixing

    weights = {}
    for part in args.weights.split(","):
        k, _, v = part.partition("=")
        if not _ or not k.strip():
            raise SystemExit(f"mix: bad --weights entry {part!r}")
        weights[k.strip()] = float(v)
    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    kept = mixing.mixture_sample(
        corpus, weights, args.total_tokens, source_col=args.source_col
    )
    kept.write.mode("overwrite").parquet(args.out)
    rates = {
        r[args.source_col]: {
            "avail_tokens": r["avail_tokens"],
            "target_tokens": round(r["target_tokens"], 1),
            "rate": round(r["rate"], 6),
        }
        for r in mixing.mixture_rates(
            corpus, weights, args.total_tokens, source_col=args.source_col
        ).collect()
    }
    n_out = spark.read.parquet(args.out).count()
    print(json.dumps({"rows_kept": n_out, "sources": rates}))
    return 0


def cmd_dsir_select(args) -> int:
    """Model-based data selection (DSIR, Xie et al. 2023): pick the
    ``--n`` corpus documents whose hashed-n-gram profile most resembles
    the ``--target`` corpus, by deterministic Gumbel top-k over the
    importance weights (``operators/dsir.py``).  Writes the selected
    rows; prints the selection stats."""
    from text_indexer_spark.operators import dsir

    spark = _spark(args)
    corpus = _grep_docs(spark.read.parquet(args.corpus))
    target = _grep_docs(spark.read.parquet(args.target))
    kept = dsir.dsir_select(
        corpus, target, args.n, n_buckets=args.buckets, k=args.k,
        salt=args.salt,
    )
    kept.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "rows_selected": n_out,
                "requested": args.n,
                "buckets": args.buckets,
                "k": args.k,
            }
        )
    )
    return 0


def cmd_semdedup(args) -> int:
    """Semantic deduplication of an embedding corpus (SemDeDup, Abbas
    et al. 2023): cluster-confined cosine pairs, one survivor per
    duplicate group (``operators/semdedup.py``)."""
    from text_indexer_spark.operators import semdedup

    spark = _spark(args)
    emb = spark.read.parquet(args.embeddings)
    centroids = None
    if args.ann_index:
        # reuse the persisted IVF store's committed quantizer — dedup
        # clusters then coincide with the serving store's inverted
        # lists (and no k-means pass runs here)
        from text_indexer_spark.operators.vecstore import current_centroids

        meta = current_centroids(args.ann_index)
        centroids, dim = meta["centroids"], int(meta["dim"])
    else:
        first = emb.select(args.vec_col).first()
        if first is None or first[args.vec_col] is None:
            raise SystemExit(
                "dedup-semantic: the embeddings corpus is empty (or its "
                f"first {args.vec_col!r} is NULL) — nothing to deduplicate"
            )
        dim = len(first[args.vec_col])
    kept = semdedup.semantic_dedup(
        emb, dim, threshold=args.threshold, n_centroids=args.centroids,
        centroids=centroids, keep=args.keep, id_col=args.id_col,
        vec_col=args.vec_col,
    )
    kept.write.mode("overwrite").parquet(args.out)
    n_in, n_out = emb.count(), spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "rows_in": n_in,
                "rows_kept": n_out,
                "rows_dropped": n_in - n_out,
                "threshold": args.threshold,
                "n_centroids": len(centroids) if centroids else args.centroids,
                "quantizer": "ann-index" if args.ann_index else "kmeans",
                "keep": args.keep,
            }
        )
    )
    return 0


def cmd_report(args) -> int:
    """Data-card report for a corpus (``operators/report.py``): docs,
    token/char totals, quality quantiles, exact-duplication rate, PII
    exposure, top domains, language mix — one JSON object."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.report import corpus_report

    spark = _spark(args)
    raw = spark.read.parquet(args.corpus)
    corpus = _grep_docs(raw)
    if "lang" in raw.columns:
        # same normalization as _grep_docs, keeping the lang column
        tcol = "text" if "text" in raw.columns else "content"
        with_id = raw if "doc_id" in raw.columns else raw.withColumn(
            "doc_id", F.xxhash64("repo", "path")
        )
        corpus = with_id.select(
            "doc_id", F.col(tcol).alias("text"), "lang"
        )
    print(json.dumps(corpus_report(corpus, top_domains=args.top_domains)))
    return 0


def cmd_pipeline(args) -> int:
    """Run a declarative cleaning pipeline (``pipeline.py``): the
    stage list comes from a JSON config file (``{"stages": [{"op":
    "quality", ...}, ...]}`` or a bare list), runs in order, and the
    report carries per-stage in/out/dropped counts (``--no-stats``
    skips the counting actions for production runs)."""
    from pyspark.sql import functions as F

    from text_indexer_spark.pipeline import (
        ID_SENSITIVE_STAGES,
        run_pipeline,
        validate_stages,
    )

    with open(args.config) as f:
        cfg = json.load(f)
    stages = cfg["stages"] if isinstance(cfg, dict) else cfg
    validate_stages(stages)
    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    text_col = "content" if "content" in corpus.columns else "text"
    synth_id = "doc_id" not in corpus.columns
    if synth_id:
        # content-hash ids collide EXACTLY on duplicate rows, which
        # would turn the dedup stages into silent no-ops (and merge
        # distinct rows inside line/span reassembly) — those stages
        # demand a real unique id column
        id_needed = ID_SENSITIVE_STAGES & {s["op"] for s in stages}
        if id_needed:
            raise SystemExit(
                "pipeline: the corpus has no doc_id column, but stages "
                f"{sorted(id_needed)} need UNIQUE doc ids (a synthesized "
                "content-hash id collides exactly on the duplicates "
                "those stages exist to find) — add a doc_id column"
            )
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit(""))
            for c in ("repo", "path")
            if c in corpus.columns
        ]
        parts.append(F.coalesce(F.col(text_col), F.lit("")))
        corpus = corpus.withColumn("doc_id", F.xxhash64(*parts))
    out, stats = run_pipeline(
        spark, corpus, stages, text_col=text_col,
        collect_stats=not args.no_stats, work_dir=args.work_dir,
    )
    if synth_id:
        out = out.drop("doc_id")
    out.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "rows_out": n_out,
                "stages": [
                    {
                        "op": s.stage,
                        "docs_in": s.docs_in,
                        "docs_out": s.docs_out,
                        "dropped": s.dropped,
                    }
                    for s in stats
                ],
            }
        )
    )
    return 0


def cmd_hot_items(args) -> int:
    """Exact corpus-wide heavy hitters via the two-pass Misra-Gries
    sketch (``operators/sketch.py``): tokens whose frequency is at
    least ``--min-frac`` of all tokens, with exact counts, computed
    without a full-vocabulary shuffle.  One JSON line per item,
    hottest first."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.sketch import heavy_hitters

    spark = _spark(args)
    corpus = _grep_docs(spark.read.parquet(args.corpus))
    rows = (
        heavy_hitters(corpus, args.min_frac)
        .orderBy(F.col("n").desc(), "item")
        .collect()
    )
    for r in rows:
        print(json.dumps({"item": r["item"], "n": r["n"]}))
    return 0


def _grep_docs(corpus):
    """Normalize a corpus frame to (doc_id, text): accepts the engine's
    native (doc_id, text) shape or the source-table shape (repo, path,
    …, content) the build consumes."""
    from pyspark.sql import functions as F

    cols = set(corpus.columns)
    if "text" not in cols:
        if "content" not in cols:
            raise SystemExit("grep: corpus needs a text or content column")
        corpus = corpus.withColumn("text", F.col("content"))
    if "doc_id" not in cols:
        if not {"repo", "path"} <= cols:
            raise SystemExit("grep: corpus needs doc_id or repo+path columns")
        corpus = corpus.withColumn("doc_id", F.xxhash64("repo", "path"))
    return corpus.select("doc_id", "text")


def cmd_grep(args) -> int:
    """Regex grep over a corpus, trigram-index accelerated when a
    committed gram index exists (``grep-ingest``/``grep-compact``
    maintain it); transparent full-scan fallback otherwise.

    ``-n/--line-numbers`` emits one row per matching LINE
    (doc_id, line_no, line) — the ``grep -n`` shape a code-search UI
    renders. With an index, the per-line explode runs over candidate
    documents only (``candidate_ids`` semi-join ahead of the
    posexplode, the composition highlight.grep_lines documents).

    ``--pushdown`` (with ``--tri-index``) serves the id-pushdown probe:
    candidate ids collected (capped at ``--pushdown-cap``) and pushed
    into the corpus scan — on a doc_id-sorted corpus, row-group pruning
    reads candidate blocks only.

    ``--pattern`` repeats: N patterns run as ONE batch (one index
    probe + one verify pass for the indexed ones, one shared scan for
    the rest — ``trigram.grep_trigram_batch``), amortizing the fixed
    per-job cost; output rows carry their pattern."""
    from text_indexer_spark.operators.highlight import grep_lines, regex_grep
    from text_indexer_spark.operators.trigram import (
        candidate_ids,
        grep_trigram,
        grep_trigram_batch,
        read_committed_trigrams,
    )

    spark = _spark(args)
    corpus = _grep_docs(spark.read.parquet(args.corpus))
    tri = (
        read_committed_trigrams(spark, args.tri_index)
        if args.tri_index
        else None
    )
    if len(args.pattern) > 1:
        if args.line_numbers or args.pushdown:
            raise SystemExit(
                "grep: -n/--pushdown take exactly one --pattern"
            )
        hits = grep_trigram_batch(
            corpus, tri, args.pattern,
            max_pushdown_ids=args.pushdown_cap,
        )
        for r in (
            hits.orderBy("pattern", "doc_id").limit(args.limit).collect()
        ):
            print(json.dumps({
                "pattern": r["pattern"], "doc_id": r["doc_id"],
                "n_matches": r["n_matches"],
            }))
        return 0
    args.pattern = args.pattern[0]
    if args.line_numbers:
        docs = corpus
        if tri is not None:
            cand = candidate_ids(tri, args.pattern)
            if cand is not None:
                docs = corpus.join(
                    cand.select("doc_id"), "doc_id", "left_semi"
                )
        hits = grep_lines(docs, args.pattern)
        for r in hits.orderBy("doc_id", "line_no").limit(args.limit).collect():
            print(json.dumps({
                "doc_id": r["doc_id"], "line_no": r["line_no"],
                "line": r["line"],
            }))
        return 0
    if tri is not None:
        if args.pushdown:
            from text_indexer_spark.operators.trigram import (
                grep_trigram_pushdown,
            )

            # collects the capped candidate-id list and pushes it into
            # the corpus scan (row-group pruning on an id-sorted
            # layout); degrades to the join form past the cap
            hits = grep_trigram_pushdown(
                corpus, tri, args.pattern,
                max_pushdown_ids=args.pushdown_cap,
            )
        else:
            hits = grep_trigram(corpus, tri, args.pattern)
    else:
        hits = regex_grep(corpus, args.pattern)
    for r in hits.orderBy("doc_id").limit(args.limit).collect():
        print(json.dumps({"doc_id": r["doc_id"], "n_matches": r["n_matches"]}))
    return 0


def cmd_grep_ingest(args) -> int:
    """Build (or sync) the committed trigram index for a corpus.

    Single-writer per index dir: run one ingest/compact at a time
    against a given ``--tri-index``; a concurrent commit fails with
    ``ConcurrentCommitError`` (guarded LATEST swap) rather than being
    silently lost — rerun the loser against the new version."""
    from pyspark.sql import functions as F

    from text_indexer_spark.operators.trigram import trigram_commit

    spark = _spark(args)
    corpus = _grep_docs(spark.read.parquet(args.corpus))
    removed = None
    if args.removed_ids:
        removed = spark.read.parquet(args.removed_ids).select(
            F.col("doc_id")
        )
    version = trigram_commit(
        corpus, args.tri_index, removed_ids=removed,
        num_partitions=args.partitions,
    )
    print(json.dumps({"tri_index": args.tri_index, "version": version}))
    return 0


def cmd_grep_compact(args) -> int:
    """Fold the committed trigram index's segment/tombstone tail back
    into one sorted base segment."""
    from text_indexer_spark.operators.trigram import trigram_compact

    spark = _spark(args)
    version = trigram_compact(spark, args.tri_index, num_partitions=args.partitions)
    print(json.dumps({"tri_index": args.tri_index, "version": version}))
    return 0


def cmd_vacuum(args) -> int:
    """Retention over an immutable version chain: drop all but the
    newest N committed versions — the streaming-sync index chain
    (``--versions``) or the line-count store (``--line-counts``,
    which also compacts nothing: seen-id delta compaction is the
    maintenance's own job)."""
    targets = [args.versions, args.line_counts, args.registry_state,
               args.trigram, args.ann_index]
    if not any(targets):
        raise SystemExit(
            "vacuum: pass --versions, --line-counts, --registry-state, "
            "--trigram or --ann-index"
        )
    if args.trigram:
        from text_indexer_spark.operators.trigram import trigram_vacuum

        removed = trigram_vacuum(args.trigram, keep_versions=args.keep_last)
    elif args.ann_index:
        from text_indexer_spark.operators.vecstore import ivf_vacuum

        removed = ivf_vacuum(args.ann_index, keep_versions=args.keep_last)
    elif args.line_counts:
        from text_indexer_spark.streaming.linecount_stream import (
            vacuum_line_counts,
        )

        removed = vacuum_line_counts(
            args.line_counts, keep_last=args.keep_last
        )
    elif args.registry_state:
        from text_indexer_spark.operators.registry import vacuum_state

        removed = vacuum_state(args.registry_state, keep_last=args.keep_last)
    else:
        from text_indexer_spark.operators.index_sync import vacuum_versions

        removed = vacuum_versions(args.versions, keep_last=args.keep_last)
    print(json.dumps({"removed": removed, "kept_last": args.keep_last}))
    return 0


def cmd_bpe_train(args) -> int:
    """Train a BPE subword vocabulary on a corpus and persist it as a
    rank-ordered merge list (``merges.json``) — the artifact
    ``bpe-encode`` (and any external tokenizer consumer) replays.
    Training is the distributed loop in ``operators/bpe.py``: one
    corpus reduction to the distinct-word relation, then one
    pair-count shuffle + 1-row argmax per merge round."""
    from text_indexer_spark import storage
    from text_indexer_spark.operators import bpe

    spark = _spark(args)
    docs = spark.read.parquet(args.corpus)
    merges = bpe.train_bpe(docs, n_merges=args.merges, text_col=args.text_col)
    storage.makedirs(args.vocab)
    storage.write_json_atomic(
        storage.join(args.vocab, "merges.json"),
        {
            "merges": [[a, b] for a, b in merges],
            "n_merges_requested": args.merges,
            "text_col": args.text_col,
        },
    )
    print(json.dumps({
        "vocab": args.vocab, "n_merges_learned": len(merges),
        "n_merges_requested": args.merges,
    }))
    return 0


def cmd_bpe_encode(args) -> int:
    """Encode every document to its BPE piece sequence under a
    persisted vocabulary (``bpe-train`` output) and write the encoded
    parquet ``(doc_id, n_pieces, pieces)``. Encoding folds each
    DISTINCT word once and joins back to occurrences — see
    ``bpe.encode_docs_bpe`` for the scale shape."""
    from text_indexer_spark import storage
    from text_indexer_spark.operators import bpe

    spark = _spark(args)
    meta = storage.read_json(storage.join(args.vocab, "merges.json"))
    if meta is None:
        raise SystemExit(f"bpe-encode: no merges.json under {args.vocab}")
    merges = [(a, b) for a, b in meta["merges"]]
    docs = spark.read.parquet(args.corpus)
    enc = bpe.encode_docs_bpe(
        docs, merges, text_col=args.text_col, id_col=args.id_col
    )
    enc.write.mode("overwrite").parquet(args.out)
    from pyspark.sql import functions as F

    stats = spark.read.parquet(args.out).agg(
        F.count("*").alias("docs"), F.sum("n_pieces").alias("pieces")
    ).collect()[0]
    print(json.dumps({
        "out": args.out, "n_docs": stats["docs"],
        "n_pieces": stats["pieces"], "n_merges": len(merges),
    }))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="text-indexer-spark")
    p.add_argument("--master", default=None, help="Spark master (default: env/local)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="corpus parquet -> persisted index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--shards", type=int, default=None)
    b.add_argument("--no-verify-sha", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument(
        "--positions", action="store_true",
        help="store token positions (enables phrase search)",
    )
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k over a persisted index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.set_defaults(fn=cmd_query)

    se = sub.add_parser(
        "search",
        help='query-DSL search: \'"hash table" AND (qu* OR s?an) AND NOT dup\'',
    )
    se.add_argument("--index", required=True)
    se.add_argument("--query", required=True)
    se.add_argument("-k", type=int, default=10)
    se.add_argument("--unranked", action="store_true")
    se.set_defaults(fn=cmd_search)

    s = sub.add_parser("sync", help="incremental sync against a new source snapshot")
    s.add_argument("--catalog", required=True)
    s.add_argument("--postings", required=True)
    s.add_argument("--source", required=True)
    s.add_argument("--out-catalog", required=True)
    s.add_argument("--out-postings", required=True)
    s.set_defaults(fn=cmd_sync)

    si = sub.add_parser(
        "sync-index",
        help="incremental sync of a COMMITTED index dir -> new index version "
        "(only changed shards rebuilt; unchanged files hard-linked)",
    )
    si.add_argument("--index", required=True)
    si.add_argument("--source", required=True)
    si.add_argument("--out", required=True)
    si.set_defaults(fn=cmd_sync_index)

    o = sub.add_parser(
        "optimize",
        help="compact a synced index: restore the build id layout "
             "(new committed version; ≡ a fresh rebuild, ~0.1% the cost)",
    )
    o.add_argument("--index", required=True)
    o.add_argument("--out", required=True)
    o.set_defaults(fn=cmd_optimize)

    m = sub.add_parser("merge", help="sharded lists -> global term-major lists")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_merge)

    d = sub.add_parser(
        "dedup",
        help="corpus parquet -> cleaned corpus (exact + LSH near-dup "
        "clusters, min-id canonical kept)",
    )
    d.add_argument("--corpus", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--exact-only", action="store_true")
    d.add_argument("--minhashes", type=int, default=16)
    d.add_argument("--bands", type=int, default=4)
    d.add_argument("--shingle-n", type=int, default=3)
    d.set_defaults(fn=cmd_dedup)

    cl = sub.add_parser(
        "clean",
        help="quality + repetition filters (+ optional decontamination) -> cleaned corpus",
    )
    cl.add_argument("--corpus", required=True)
    cl.add_argument("--out", required=True)
    cl.add_argument(
        "--block-domains", default=None,
        help="parquet of blocked domains (first column); docs "
        "mentioning a blocked domain or subdomain drop (C4 rule)",
    )
    cl.add_argument(
        "--block-words", default=None,
        help='comma-separated blocked words; docs containing any '
        "(whole-token, case-folded) drop (C4 bad-words rule)",
    )
    cl.add_argument(
        "--normalize", choices=["ws", "nfc", "nfkc"], default=None,
        help="canonicalize text before filtering: ws = whitespace/"
        "control strip (pure codegen); nfc/nfkc add the Unicode "
        "normal form (Arrow-batched)",
    )
    cl.add_argument("--min-quality", type=float, default=0.4)
    cl.add_argument("--max-dup-line-frac", type=float, default=0.3)
    cl.add_argument("--max-top-2gram-frac", type=float, default=0.2)
    cl.add_argument(
        "--max-ppl", type=float, default=None,
        help="drop docs whose bigram-LM perplexity (self-trained) "
        "exceeds this (CCNet-style outlier cut)",
    )
    cl.add_argument("--evalset", default=None, help="parquet of benchmark docs")
    cl.add_argument("--decontam-n", type=int, default=8)
    cl.add_argument(
        "--decontam-bloom", action="store_true",
        help="bloom-prefilter the corpus before the exact gram join "
        "(same output; broadcast shrinks to packed bits — the large-"
        "evalset path)",
    )
    cl.set_defaults(fn=cmd_clean)

    ai = sub.add_parser(
        "ann-ingest",
        help="persist the IVF vector layout (optionally int8-quantized)",
    )
    ai.add_argument("--embeddings", required=True)
    ai.add_argument("--index", required=True)
    ai.add_argument("--centroids", type=int, default=8)
    ai.add_argument("--quantize", action="store_true")
    ai.set_defaults(fn=cmd_ann_ingest)

    aq = sub.add_parser(
        "ann-query", help="cosine top-k over a persisted IVF index"
    )
    aq.add_argument("--index", required=True)
    aq.add_argument("--queries", default=None, help="parquet (query_id, query_vec)")
    aq.add_argument(
        "--query-ids", default=None,
        help="comma-separated vec_ids to query by example",
    )
    aq.add_argument("-k", type=int, default=10)
    aq.add_argument("--n-probe", type=int, default=2)
    aq.set_defaults(fn=cmd_ann_query)

    au = sub.add_parser(
        "ann-upsert",
        help="commit a change set (replace/insert + delete) against a "
        "persisted IVF index without rewriting the base",
    )
    au.add_argument("--index", required=True)
    au.add_argument(
        "--embeddings", default=None,
        help="parquet (vec_id, embedding) to insert or replace",
    )
    au.add_argument(
        "--delete-ids", default=None,
        help="comma-separated vec_ids to remove",
    )
    au.set_defaults(fn=cmd_ann_upsert)

    asy = sub.add_parser(
        "ann-sync",
        help="drain a vector upsert/tombstone drop dir into the IVF "
        "store (one committed version per micro-batch)",
    )
    asy.add_argument("--index", required=True)
    asy.add_argument("--drop-dir", required=True)
    asy.add_argument("--checkpoint", required=True)
    asy.add_argument("--max-files-per-trigger", type=int, default=16)
    asy.set_defaults(fn=cmd_ann_sync)

    ast = sub.add_parser(
        "ann-stats",
        help="IVF store health: chain length, tombstones, cell "
        "imbalance (the compact/retrain signals)",
    )
    ast.add_argument("--index", required=True)
    ast.set_defaults(fn=cmd_ann_stats)

    ac = sub.add_parser(
        "ann-compact",
        help="fold the IVF segment chain into one base segment "
        "(optionally retrain the coarse quantizer on the live corpus)",
    )
    ac.add_argument("--index", required=True)
    ac.add_argument("--retrain", action="store_true")
    ac.set_defaults(fn=cmd_ann_compact)

    dl = sub.add_parser(
        "dedup-lines",
        help="remove lines shared across >=N docs (C4 boilerplate rule)",
    )
    dl.add_argument("--corpus", required=True)
    dl.add_argument("--out", required=True)
    dl.add_argument("--min-docs", type=int, default=2)
    dl.set_defaults(fn=cmd_dedup_lines)

    ds = sub.add_parser(
        "dedup-spans",
        help="remove token spans repeated >=min-count times corpus-wide "
        "(ExactSubstr rule)",
    )
    ds.add_argument("--corpus", required=True)
    ds.add_argument("--out", required=True)
    ds.add_argument("--n", type=int, default=50, help="span width in tokens")
    ds.add_argument("--min-count", type=int, default=2)
    ds.set_defaults(fn=cmd_dedup_spans)

    mx = sub.add_parser(
        "mix",
        help="mixture-sample a corpus to per-source token budgets "
        "(deterministic data mixing)",
    )
    mx.add_argument("--corpus", required=True)
    mx.add_argument("--out", required=True)
    mx.add_argument("--total-tokens", type=int, required=True)
    mx.add_argument("--weights", required=True,
                    help='e.g. "en=0.5,fr=0.3,de=0.2"')
    mx.add_argument("--source-col", default="lang")
    mx.set_defaults(fn=cmd_mix)

    ds = sub.add_parser(
        "select",
        help="DSIR importance resampling: select the corpus docs that "
        "look most like a target corpus",
    )
    ds.add_argument("--corpus", required=True)
    ds.add_argument("--target", required=True)
    ds.add_argument("--out", required=True)
    ds.add_argument("--n", type=int, required=True)
    ds.add_argument("--buckets", type=int, default=1 << 16)
    ds.add_argument("--k", type=float, default=0.5)
    ds.add_argument("--salt", default="dsir1")
    ds.set_defaults(fn=cmd_dsir_select)

    sd = sub.add_parser(
        "dedup-semantic",
        help="SemDeDup: drop embedding-level semantic duplicates "
        "(cluster-confined cosine groups, one survivor each)",
    )
    sd.add_argument("--embeddings", required=True)
    sd.add_argument("--out", required=True)
    sd.add_argument("--threshold", type=float, default=0.99)
    sd.add_argument("--centroids", type=int, default=8)
    sd.add_argument("--keep", choices=["centroid_far", "min_id"],
                    default="centroid_far")
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--ann-index", default=None,
                    help="reuse this IVF vector store's committed "
                    "quantizer instead of running k-means")
    sd.set_defaults(fn=cmd_semdedup)

    rp = sub.add_parser(
        "report",
        help="data-card report: docs/tokens, quality quantiles, dup "
        "rate, PII exposure, domains, language mix",
    )
    rp.add_argument("--corpus", required=True)
    rp.add_argument("--top-domains", type=int, default=10)
    rp.set_defaults(fn=cmd_report)

    pl = sub.add_parser(
        "pipeline",
        help="run a declarative cleaning pipeline from a JSON stage "
        "config, with per-stage accounting",
    )
    pl.add_argument("--corpus", required=True)
    pl.add_argument("--out", required=True)
    pl.add_argument("--config", required=True,
                    help="JSON file: {\"stages\": [{\"op\": ..., ...}]}")
    pl.add_argument("--no-stats", action="store_true")
    pl.add_argument("--work-dir", default=None,
                    help="per-stage parquet + sealed markers; a rerun "
                    "resumes after the last completed unchanged stage")
    pl.set_defaults(fn=cmd_pipeline)

    hi = sub.add_parser(
        "hot-items",
        help="exact heavy-hitter tokens (Misra-Gries sketch + exact "
        "verify, no full-vocabulary shuffle)",
    )
    hi.add_argument("--corpus", required=True)
    hi.add_argument("--min-frac", type=float, default=0.01)
    hi.set_defaults(fn=cmd_hot_items)

    mr = sub.add_parser(
        "media-resize",
        help="resize image payloads in a media table (non-images pass "
        "through byte-identical)",
    )
    mr.add_argument("--media", required=True)
    mr.add_argument("--out", required=True)
    mr.add_argument("--width", type=int, required=True)
    mr.add_argument("--height", type=int, required=True)
    mr.add_argument(
        "--lenient",
        action="store_true",
        help="pass undecodable image payloads through unresized "
        "instead of failing",
    )
    mr.set_defaults(fn=cmd_media_resize)

    g = sub.add_parser(
        "grep", help="regex grep (trigram-index accelerated with --tri-index)"
    )
    g.add_argument("--corpus", required=True)
    g.add_argument(
        "--pattern", required=True, action="append",
        help="regex; repeat for a one-pass multi-pattern batch",
    )
    g.add_argument("--tri-index", default=None)
    g.add_argument("--limit", type=int, default=100)
    g.add_argument(
        "-n", "--line-numbers", action="store_true",
        help="emit per-line matches (doc_id, line_no, line) like grep -n",
    )
    g.add_argument(
        "--pushdown", action="store_true",
        help="push candidate ids into the corpus scan (row-group pruning "
        "on a doc_id-sorted corpus; selective patterns read candidate "
        "blocks only)",
    )
    g.add_argument("--pushdown-cap", type=int, default=10_000)
    g.set_defaults(fn=cmd_grep)

    gi = sub.add_parser(
        "grep-ingest",
        help="build/sync the committed trigram index (segments + tombstones)",
    )
    gi.add_argument("--corpus", required=True, help="added/reindexed docs parquet")
    gi.add_argument("--tri-index", required=True)
    gi.add_argument(
        "--removed-ids", default=None,
        help="parquet of doc_id to tombstone (removed + reindexed)",
    )
    gi.add_argument("--partitions", type=int, default=None)
    gi.set_defaults(fn=cmd_grep_ingest)

    gc = sub.add_parser(
        "grep-compact", help="fold trigram segments+tombstones into one base"
    )
    gc.add_argument("--tri-index", required=True)
    gc.add_argument("--partitions", type=int, default=None)
    gc.set_defaults(fn=cmd_grep_compact)

    bt = sub.add_parser(
        "bpe-train", help="learn a BPE subword vocabulary (merge list)"
    )
    bt.add_argument("--corpus", required=True)
    bt.add_argument("--vocab", required=True, help="output vocabulary dir")
    bt.add_argument("--merges", type=int, default=64)
    bt.add_argument("--text-col", default="text")
    bt.set_defaults(fn=cmd_bpe_train)

    be = sub.add_parser(
        "bpe-encode", help="encode docs to BPE pieces under a trained vocab"
    )
    be.add_argument("--corpus", required=True)
    be.add_argument("--vocab", required=True, help="bpe-train output dir")
    be.add_argument("--out", required=True)
    be.add_argument("--text-col", default="text")
    be.add_argument("--id-col", default="doc_id")
    be.set_defaults(fn=cmd_bpe_encode)

    v = sub.add_parser(
        "vacuum", help="delete all but the newest N committed index versions"
    )
    v.add_argument("--versions", help="versions directory (v0001, ...)")
    v.add_argument(
        "--line-counts",
        help="line-count store directory (counts_v000001, ...) to "
        "vacuum instead of an index version chain",
    )
    v.add_argument(
        "--registry-state",
        help="registry snapshot directory (state_v000001, ...) to "
        "vacuum instead of an index version chain",
    )
    v.add_argument(
        "--trigram",
        help="committed trigram index directory: delete segments/"
        "tombstones/manifests no kept manifest references",
    )
    v.add_argument(
        "--ann-index",
        help="persisted IVF vector store: delete segments/tombstones/"
        "manifests no kept manifest references",
    )
    v.add_argument("--keep-last", type=int, default=2)
    v.set_defaults(fn=cmd_vacuum)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

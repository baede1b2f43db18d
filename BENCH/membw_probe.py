#!/usr/bin/env python
"""Hardware-ceiling probe for the scaling attribution (no Spark).

Runs the exact per-task kernels of the two wide build stages —
``tokenize_postings_arrays`` (stage A) and ``encode_posting_lists_bulk``
(stage C) — in K CONCURRENT CPU-pinned OS processes, no Spark, no JVM,
no shuffle, no scheduler. Each worker gets the same private input, so
aggregate throughput should scale perfectly with K on ideal hardware;
any sublinearity here is the machine (one socket's memory bandwidth /
shared cache), not the engine. Prints one JSON line per K plus the
implied 2→8 kernel ceiling.

Usage: python BENCH/membw_probe.py [docs_per_worker]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _pin(core: int) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass


def _tokenize_worker(core: int, n_docs: int, out) -> None:
    _pin(core)
    import numpy as np
    import pandas as pd

    from text_indexer_spark.tokenizer import tokenize_postings_arrays

    rng = np.random.RandomState(7)
    vocab = np.array([f"tok{i:03d}" for i in range(500)])
    texts = pd.Series([
        " ".join(vocab[rng.randint(0, 500, 24)]) for _ in range(n_docs)
    ])
    # warm once (allocators, regex compile), then measure
    tokenize_postings_arrays(texts.iloc[:1000])
    t0 = time.time()
    p_doc, p_term, p_tf, _ = tokenize_postings_arrays(texts)
    out.put((len(p_term), time.time() - t0))


def _encode_worker(core: int, n_docs: int, out) -> None:
    _pin(core)
    import numpy as np

    from text_indexer_spark.operators.codec import encode_posting_lists_bulk

    rng = np.random.RandomState(11)
    n_post = n_docs * 20
    terms = np.sort(rng.randint(0, 2000, n_post)).astype(str)
    doc_ids = rng.randint(0, n_docs, n_post).astype(np.int64)
    order = np.lexsort((doc_ids, terms))
    terms, doc_ids = terms[order], doc_ids[order]
    tfs = rng.randint(1, 5, n_post).astype(np.int64)
    w = rng.rand(n_post)
    encode_posting_lists_bulk(terms[:5000], doc_ids[:5000], tfs[:5000], w[:5000], 128)
    t0 = time.time()
    encode_posting_lists_bulk(terms, doc_ids, tfs, w, 128)
    out.put((n_post, time.time() - t0))


def run(kernel, worker, n_docs: int) -> dict:
    res = {}
    for k in (1, 2, 4, 8):
        q = mp.Queue()
        procs = [
            mp.Process(target=worker, args=(c, n_docs, q)) for c in range(k)
        ]
        t0 = time.time()
        for p in procs:
            p.start()
        got = [q.get() for _ in procs]
        for p in procs:
            p.join()
        wall = time.time() - t0
        agg = sum(n for n, _ in got) / wall
        res[k] = agg
        print(json.dumps({
            "kernel": kernel, "workers": k,
            "aggregate_per_sec": round(agg, 1),
            "per_worker_sec": round(sum(s for _, s in got) / k, 3),
        }))
    for k in (2, 4, 8):
        eff = res[k] / (k * res[1])
        print(json.dumps({"kernel": kernel, "scaling": f"1->{k}",
                          "efficiency": round(eff, 3)}))
    print(json.dumps({
        "kernel": kernel, "scaling": "2->8",
        "efficiency": round(res[8] / (4 * res[2]), 3),
    }))
    return res


if __name__ == "__main__":
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    mp.set_start_method("spawn")
    rt = run("tokenize", _tokenize_worker, nd)
    re_ = run("encode", _encode_worker, nd)
    out = {
        "tokenize": round(rt[8] / (4 * rt[2]), 3),
        "encode": round(re_[8] / (4 * re_[2]), 3),
    }
    with open(os.path.join(os.path.dirname(__file__), "membw.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps({"written": out}))

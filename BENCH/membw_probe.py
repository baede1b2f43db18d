#!/usr/bin/env python
"""Hardware-ceiling probe for the scaling attribution (no Spark).

Runs the exact per-task kernels of the two wide build stages —
``tokenize_postings_arrays`` (stage A) and ``encode_posting_lists_bulk``
(stage C) — in K CONCURRENT CPU-pinned OS processes, no Spark, no JVM,
no shuffle, no scheduler. Each worker gets the same private input, so
aggregate throughput should scale perfectly with K on ideal hardware;
any sublinearity here is the machine (one socket's shared memory
bandwidth / caches / allocator), not the engine.

Measurement protocol: every worker generates its data and warms the
kernel FIRST, then all workers rendezvous on a barrier and run the
kernel R times back-to-back; each reports its own kernel-only
throughput. Aggregate = Σ per-worker throughput while all K run
concurrently — process spawn, imports and datagen never pollute the
measured window (the first version measured wall-from-fork, which at
K=32 was mostly fork/exec + numpy import, not kernel).

Usage: python BENCH/membw_probe.py [docs_per_worker]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

# spawn-mode children re-import this file with sys.path[0] = BENCH/, so
# the repo root (where text_indexer_spark lives) must be added explicitly
# or every worker dies on ModuleNotFoundError before its first q.put —
# which the parent would wait on forever
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

KS = (1, 2, 4, 8, 16, 32)
PAIRS = ((1, 4), (2, 8), (8, 32))
REPS = 3


def _pin(core: int) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass


def _tokenize_worker(core: int, n_docs: int, barrier, out) -> None:
    _pin(core)
    import numpy as np
    import pandas as pd

    from text_indexer_spark.tokenizer import tokenize_postings_arrays

    rng = np.random.RandomState(7)
    vocab = np.array([f"tok{i:03d}" for i in range(500)])
    texts = pd.Series([
        " ".join(vocab[rng.randint(0, 500, 24)]) for _ in range(n_docs)
    ])
    # warm (allocators, regex compile) BEFORE the rendezvous
    n_post = len(tokenize_postings_arrays(texts)[1])
    barrier.wait()
    t0 = time.time()
    for _ in range(REPS):
        tokenize_postings_arrays(texts)
    out.put((n_post * REPS, time.time() - t0))


def _encode_worker(core: int, n_docs: int, barrier, out) -> None:
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
    encode_posting_lists_bulk(terms, doc_ids, tfs, w, 128)  # warm
    barrier.wait()
    t0 = time.time()
    for _ in range(REPS):
        encode_posting_lists_bulk(terms, doc_ids, tfs, w, 128)
    out.put((n_post * REPS, time.time() - t0))


def run(kernel, worker, n_docs: int) -> dict:
    res = {}
    for k in KS:
        q = mp.Queue()
        barrier = mp.Barrier(k)
        procs = [
            mp.Process(target=worker, args=(c, n_docs, barrier, q))
            for c in range(k)
        ]
        for p in procs:
            p.start()
        # bounded wait: a dead worker must fail the probe, not hang it
        got = [q.get(timeout=600) for _ in procs]
        for p in procs:
            p.join()
        # Σ of per-worker kernel throughput while all K ran concurrently
        agg = sum(n / t for n, t in got)
        res[k] = agg
        print(json.dumps({
            "kernel": kernel, "workers": k,
            "aggregate_per_sec": round(agg, 1),
            "per_worker_sec": round(sum(t for _, t in got) / k, 3),
        }))
    for k in KS[1:]:
        print(json.dumps({"kernel": kernel, "scaling": f"1->{k}",
                          "efficiency": round(res[k] / (k * res[1]), 3)}))
    for lo, hi in PAIRS:
        print(json.dumps({
            "kernel": kernel, "scaling": f"{lo}->{hi}",
            "efficiency": round(res[hi] / (hi / lo * res[lo]), 3),
        }))
    return res


if __name__ == "__main__":
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    mp.set_start_method("spawn")
    rt = run("tokenize", _tokenize_worker, nd)
    re_ = run("encode", _encode_worker, nd)
    out = {}
    for name, res in (("tokenize", rt), ("encode", re_)):
        for lo, hi in PAIRS:
            out[f"{name} {lo}->{hi}"] = round(res[hi] / (hi / lo * res[lo]), 3)
    with open(os.path.join(os.path.dirname(__file__), "membw.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps({"written": out}))

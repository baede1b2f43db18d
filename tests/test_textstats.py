"""Text-analysis operators vs hand-computed values."""

from __future__ import annotations

import pytest

from text_indexer_spark.operators.textstats import (
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)


DOCS = [
    (0, "the cat is in the house and it is warm"),
    (1, "der hund ist nicht zu haus und das ist gut"),
    (2, "le chat est dans la maison et il est content"),
    (3, "xyzzy plugh"),  # no markers
    (4, "the quick brown fox, jumps; over!"),
    (5, "the quick brown fox, jumps; over!"),  # dup of 4
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_lang_id(docs):
    pred = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert pred[0] == "en"
    assert pred[1] == "de"
    assert pred[2] == "fr"
    assert pred[3] == "und"


def test_token_counts(docs):
    rows = {r["doc_id"]: r for r in token_counts(docs).collect()}
    # doc 0: 10 whitespace tokens, 10 word tokens
    assert rows[0]["ws_tokens"] == 10
    assert rows[0]["word_tokens"] == 10
    # doc 4: "the quick brown fox, jumps; over!" → 6 ws, 6 words
    assert rows[4]["ws_tokens"] == 6
    assert rows[4]["word_tokens"] == 6
    # bpe_ish: alnum chars = len("thequickbrownfoxjumpsover")=25 → ceil/4=7, punct ",;!"=3 → 10
    assert rows[4]["bpe_ish_pieces"] == 7 + 3


def test_quality_scores(docs):
    rows = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    r0 = rows[0]
    text = DOCS[0][1]
    assert r0["n_chars"] == len(text)
    assert r0["n_tokens"] == 10
    alpha = sum(c.isalnum() for c in text)
    assert r0["alpha_ratio"] == pytest.approx(round(alpha / len(text), 4), abs=1e-4)
    assert 0.0 <= r0["quality"] <= 1.0
    # punctuation-heavy doc has higher punct_ratio
    assert rows[4]["punct_ratio"] > rows[0]["punct_ratio"]


def test_fingerprints_dups_collide(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs, n=5).collect()}
    assert fp[4] == fp[5]
    assert fp[0] != fp[4]
    assert all(len(v) == 32 for v in fp.values())  # md5 hex


def test_filter_by_quality_zero_shuffle_and_semantics(spark):
    """filter_by_quality is a scan-fused row-local filter (zero
    exchanges) and keeps exactly the rows quality_scores clears."""
    from text_indexer_spark.operators.textstats import filter_by_quality, quality_scores
    from text_indexer_spark.plans.checks import count_exchanges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = filter_by_quality(docs, min_quality=0.4)
    assert count_exchanges(kept) == 0
    exp = {
        r["doc_id"]
        for r in quality_scores(docs).filter("quality >= 0.4").collect()
    }
    got = {r["doc_id"] for r in kept.collect()}
    assert got == exp and 0 < len(got) < docs.count()


def test_chunk_documents_reassembles_and_shapes(spark):
    """Chunks concatenate back to the tokenized doc; sizes ≤ N with only
    the last chunk short; empty docs yield one empty chunk; zero
    exchanges in the plan."""
    from text_indexer_spark.operators.textstats import chunk_documents
    from text_indexer_spark.plans.checks import count_exchanges
    from text_indexer_spark.tokenizer import tokenize_text

    rows = [
        (0, " ".join(f"w{i}" for i in range(10))),   # 2 chunks of 4+... n=10,N=4 → 4,4,2
        (1, "one two three"),                          # single short chunk
        (2, ""),                                       # empty
        (3, None),                                     # null text
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, max_tokens=4)
    assert count_exchanges(out) == 0
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"], r["chunk_text"]))
    for d in got:
        got[d].sort()
    assert [n for _, n, _ in got[0]] == [4, 4, 2]
    reassembled = " ".join(t for _, _, t in got[0])
    assert reassembled == " ".join(tokenize_text(rows[0][1]))
    assert got[1] == [(0, 3, "one two three")]
    assert got[2] == [(0, 0, "")]
    assert got[3] == [(0, 0, "")]


def test_pack_chunks_invariants(spark):
    """Packing invariants: every chunk packed exactly once; per-sequence
    total ≤ budget (except singleton oversize chunks); deterministic
    across partitionings; sequences fill greedily (no two consecutive
    sequences that would fit together)."""
    from text_indexer_spark.operators.textstats import chunk_documents, pack_chunks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=16).cache()
    packed = pack_chunks(chunks, budget=48, buckets=8).cache()

    assert packed.count() == chunks.count()  # nothing lost or duplicated
    assert packed.select("doc_id", "chunk_idx").distinct().count() == chunks.count()

    import collections
    seq_tot = collections.defaultdict(int)
    seqs = collections.defaultdict(list)
    for r in packed.collect():
        seq_tot[(r["bucket"], r["seq_idx"])] += r["n_tokens"]
        seqs[r["bucket"]].append((r["seq_idx"], r["n_tokens"]))
    for (b, s), tot in seq_tot.items():
        assert tot <= 48 or sum(1 for r in seqs[b] if r[0] == s) == 1
    # greedy: consecutive sequence totals can't both fit in one budget
    per_bucket = collections.defaultdict(dict)
    for (b, s), tot in seq_tot.items():
        per_bucket[b][s] = tot
    for b, m in per_bucket.items():
        for s in sorted(m)[:-1]:
            # the FIRST chunk of s+1 must not have fit at the end of s
            first_next = min(
                ((r["doc_id"], r["chunk_idx"]), r["n_tokens"])
                for r in packed.collect()
                if r["bucket"] == b and r["seq_idx"] == s + 1
            )[1] if (s + 1) in m else None
            if first_next is not None:
                assert m[s] + first_next > 48

    repart = pack_chunks(chunks.repartition(7), budget=48, buckets=8)
    assert sorted(map(tuple, repart.collect())) == sorted(map(tuple, packed.collect()))


# ------------------------------------------------------- vocab encoding
def test_vocabulary_ids_deterministic_and_ranked(spark):
    from text_indexer_spark.operators.textstats import vocabulary_ids

    docs = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c b a")], "doc_id long, text string"
    )
    vocab = {r["term"]: (r["token_id"], r["count"])
             for r in vocabulary_ids(docs).collect()}
    # counts: a=4, b=3, c=2 -> ids 0, 1, 2; ties would break term-asc
    assert vocab == {"a": (0, 4), "b": (1, 3), "c": (2, 2)}
    # parallelism-independence: same ids at a different partitioning
    again = {r["term"]: (r["token_id"], r["count"])
             for r in vocabulary_ids(docs.repartition(7)).collect()}
    assert again == vocab


def test_encode_docs_order_and_oov(spark):
    from text_indexer_spark.operators.textstats import (
        encode_docs,
        vocabulary_ids,
    )

    docs = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c b a")], "doc_id long, text string"
    )
    vocab = vocabulary_ids(docs)
    enc = {r["doc_id"]: (r["n_tokens"], r["ids"])
           for r in encode_docs(docs, vocab).collect()}
    assert enc == {1: (6, [1, 0, 0, 2, 1, 0]), 2: (3, [2, 1, 0])}
    # min_count cut drops OOV tokens from the encoding
    cut = vocabulary_ids(docs, min_count=3)
    enc_cut = {r["doc_id"]: r["ids"]
               for r in encode_docs(docs, cut).collect()}
    assert enc_cut == {1: [1, 0, 0, 1, 0], 2: [1, 0]}

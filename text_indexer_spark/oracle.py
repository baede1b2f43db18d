"""Single-node numpy/pure-Python oracle: the rank/score ground truth.

Mirrors the reference engine's semantics exactly (tokenize →
boolean inverted index → conjunctive AND, ``Index.kt`` +
``DocumentsIndexer.kt:46-76``), extended with exact BM25 scoring (no
WAND, no compression, no approximation). Spark results must match this
oracle: membership exactly, scores to 1e-9, ranks identically.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from text_indexer_spark.functions.bm25 import B, K1
from text_indexer_spark.tokenizer import tokenize_text


@dataclass
class OracleIndex:
    """In-memory index over (doc_id -> content) — the reference's
    ``Index`` + ``IndexedDocuments`` collapsed into one test double."""

    docs: dict[int, str] = field(default_factory=dict)
    tfs: dict[int, Counter] = field(default_factory=dict)
    postings: dict[str, set[int]] = field(default_factory=dict)

    def add(self, doc_id: int, content: str) -> None:
        # replace semantics: drop existing postings first (Index.kt:15-16)
        self.remove(doc_id)
        toks = tokenize_text(content)
        self.docs[doc_id] = content
        self.tfs[doc_id] = Counter(toks)
        for t in self.tfs[doc_id]:
            self.postings.setdefault(t, set()).add(doc_id)

    def remove(self, doc_id: int) -> None:
        if doc_id not in self.docs:
            return
        for t in self.tfs[doc_id]:
            s = self.postings.get(t)
            if s:
                s.discard(doc_id)
                if not s:  # prune empty posting lists (Index.kt:37-38)
                    del self.postings[t]
        del self.docs[doc_id]
        del self.tfs[doc_id]

    # --- queries -----------------------------------------------------
    def doc_len(self, doc_id: int) -> int:
        return sum(self.tfs[doc_id].values())

    def avgdl(self) -> float:
        if not self.docs:
            return 0.0
        return sum(self.doc_len(d) for d in self.docs) / len(self.docs)

    def conjunctive(self, terms: list[str]) -> set[int]:
        terms = list(dict.fromkeys(terms))
        if not terms:
            return set()
        sets = [self.postings.get(t, set()) for t in terms]
        out = set(sets[0])
        for s in sets[1:]:
            out &= s
        return out

    def idf(self, term: str) -> float:
        n = len(self.docs)
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def bm25(self, doc_id: int, terms: list[str]) -> float:
        avgdl = self.avgdl()
        dl = self.doc_len(doc_id)
        score = 0.0
        for t in dict.fromkeys(terms):
            tf = self.tfs[doc_id].get(t, 0)
            if tf == 0:
                continue
            norm = K1 * (1.0 - B + B * dl / avgdl)
            score += self.idf(t) * tf * (K1 + 1.0) / (tf + norm)
        return score

    def bm25_topk(
        self, terms: list[str], k: int = 10, conjunctive: bool = True
    ) -> list[tuple[int, float]]:
        terms = list(dict.fromkeys(terms))
        if not terms:
            return []
        if conjunctive:
            cands = self.conjunctive(terms)
        else:
            cands = set().union(*(self.postings.get(t, set()) for t in terms))
        scored = [(d, self.bm25(d, terms)) for d in cands]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

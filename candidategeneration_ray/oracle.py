"""Executable reference semantics — exhaustive, pure Python/numpy oracle.

The Java reference cannot run on transcript tables (its inputs are
ClueWeb artifacts), so this oracle IS the reference for tests: it
re-states the scoring/indexing contract of
utilsClass.java:115-130 (quantized BM25), InvertedIndex.java:157-173
(stats/df/tf), :264-314 (d-window pairs), :364-389 (unigram emission),
with zero Ray and zero cleverness. Everything the engine produces is
checked against this.

Documents enter as an ordered list of (doc_id, text); doc order and ids
are the caller's contract (the engine assigns ids by stable
(conv_id, turn_idx) rank).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from candidategeneration_ray.functions.bm25 import truncated_avgdl
from candidategeneration_ray.functions.tokenize import tokenize_text


def _bm25_int(tf: int, max_tf: int, doc_len: int, df: int, n_docs: int,
              avgdl: float, k1: float = 1.6, b: float = 0.75,
              quantization: int = 10_000_000) -> int:
    nf = 0.5 + 0.5 * tf / max_tf
    idf = __import__("math").log((n_docs - df + 0.5) / (df + 0.5))
    # avgdl can be 0 (total_tokens < n_docs after integer division);
    # Java double division then yields Infinity and BM25 -> 0.0 — we
    # replicate IEEE semantics instead of raising (utilsClass.java:125)
    inner = float("inf") if avgdl == 0 else b * doc_len / avgdl
    raw = idf * nf * (k1 + 1.0) / (nf + k1 * (1.0 - b + inner))
    return int(raw * quantization)  # int() truncates toward zero, like Java (int)


@dataclass
class OracleIndex:
    doc_ids: list[int]
    tokens: dict[int, list[str]]          # doc_id -> kept tokens (in order)
    doc_len: dict[int, int]               # doc_id -> #kept tokens
    df: dict[str, int]                    # term -> doc frequency
    n_docs: int
    total_tokens: int
    avgdl: float
    term_ids: dict[str, int]              # sorted-unique-term -> 1-based id

    # derived lazily
    def tf(self, doc_id: int) -> Counter:
        return Counter(self.tokens[doc_id])

    def term_score(self, doc_id: int, term: str) -> int | None:
        """Quantized BM25 of one term in one doc, None if absent."""
        tfs = self.tf(doc_id)
        if term not in tfs or term not in self.df:
            return None
        max_tf = max(tfs.values())
        return _bm25_int(tfs[term], max_tf, self.doc_len[doc_id],
                         self.df[term], self.n_docs, self.avgdl)

    def unigram_postings(self, term: str) -> list[tuple[int, int]]:
        """[(doc_id, score)] sorted by doc_id asc — one per containing doc."""
        out = []
        for d in self.doc_ids:
            s = self.term_score(d, term)
            if s is not None:
                out.append((d, s))
        return out

    def pair_postings(self, t1: str, t2: str, distance: int = 5) -> list[tuple[int, int]]:
        """[(doc_id, score1+score2)] for docs where the sorted pair
        co-occurs within the d-window; doc_id asc."""
        lo, hi = sorted([t1, t2])
        out = []
        for d in self.doc_ids:
            toks = self.tokens[d]
            found = False
            for i, a in enumerate(toks):
                for j in range(i + 1, min(i + distance, len(toks) - 1) + 1):
                    pa, pb = sorted([a, toks[j]])
                    if pa == lo and pb == hi:
                        found = True
                        break
                if found:
                    break
            if found:
                s1 = self.term_score(d, lo)
                s2 = self.term_score(d, hi)
                out.append((d, s1 + s2))
        return out

    def topk(self, query_terms: list[str], k: int = 10) -> list[tuple[int, int]]:
        """Exhaustive BM25 top-k: for every doc, sum quantized scores of
        the distinct query terms it contains; rank by (score desc,
        doc_id asc). Docs containing none of the terms are excluded."""
        qterms = sorted(set(query_terms))
        scored = []
        for d in self.doc_ids:
            total, hit = 0, False
            for t in qterms:
                s = self.term_score(d, t)
                if s is not None:
                    total += s
                    hit = True
            if hit:
                scored.append((d, total))
        scored.sort(key=lambda p: (-p[1], p[0]))
        return scored[:k]


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: ordered [(doc_id, text)]."""
    tokens = {d: tokenize_text(t) for d, t in docs}
    doc_len = {d: len(ts) for d, ts in tokens.items()}
    df: Counter = Counter()
    for ts in tokens.values():
        df.update(set(ts))
    n_docs = len(docs)
    total = sum(doc_len.values())
    vocab = sorted(df)
    return OracleIndex(
        doc_ids=[d for d, _ in docs],
        tokens=tokens,
        doc_len=doc_len,
        df=dict(df),
        n_docs=n_docs,
        total_tokens=total,
        avgdl=truncated_avgdl(total, n_docs) if n_docs else 1.0,
        term_ids={t: i + 1 for i, t in enumerate(vocab)},
    )

"""Quantized BM25 — the score identity contract.

Reference: src/main/java/PredictiveIndex/utilsClass.java:115-130 (getBM25):

  N      = globalStats[0]                  (number of docs)
  avg    = globalStats[1] / N              ** Java long/long INTEGER division
                                           — avgdl is truncated to a whole
                                           number before use; we replicate **
  k=1.6, b=0.75
  nf     = 0.5 + 0.5*tf/maxtf              (maxtf = max term freq in the doc)
  IDF    = ln((N - n + 0.5)/(n + 0.5))     (n = document frequency; may be
                                           negative when n > N/2)
  BM25   = IDF*nf*(k+1) / (nf + k*(1 - b + b*doclen/avg))
  score  = (int)(BM25 * 1e7)               ** Java (int) cast truncates
                                           toward ZERO (not floor) — matters
                                           for negative IDF **

All arithmetic in float64; only the final quantization goes to int.
"""

from __future__ import annotations

import numpy as np


def truncated_avgdl(total_tokens: int, n_docs: int) -> float:
    """avg doc length with the reference's long/long integer division."""
    return float(total_tokens // n_docs)


def bm25_quantized(
    tf: np.ndarray,
    max_tf: np.ndarray | float,
    doc_len: np.ndarray | float,
    df: np.ndarray,
    n_docs: int,
    avgdl: float,
    k1: float = 1.6,
    b: float = 0.75,
    quantization: int = 10_000_000,
) -> np.ndarray:
    """Vectorized quantized BM25; returns int32 scores.

    `avgdl` must come from :func:`truncated_avgdl`.
    """
    tf = np.asarray(tf, dtype=np.float64)
    df = np.asarray(df, dtype=np.float64)
    with np.errstate(divide="ignore"):
        # avgdl == 0 → inner Inf → BM25 0.0, like Java double division
        nf = 0.5 + 0.5 * tf / np.asarray(max_tf, dtype=np.float64)
        idf = np.log((n_docs - df + 0.5) / (df + 0.5))
        denom = nf + k1 * (1.0 - b + b * np.asarray(doc_len, dtype=np.float64) / avgdl)
        raw = idf * nf * (k1 + 1.0) / denom
    # Java (int)(double) truncates toward zero.
    return np.trunc(raw * quantization).astype(np.int64).astype(np.int32)

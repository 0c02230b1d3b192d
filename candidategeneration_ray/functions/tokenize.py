"""Tokenizer / normalizer with the reference's exact semantics.

Reference: src/excluded/HtmlpageCleaner.java:64-105 —
  1. replace every char outside [a-zA-Z0-9.] with a space,
  2. whitespace-tokenize,
  3. lowercase each token,
  4. keep a token iff it is NOT a stopword AND len > 1 AND is either
     all-letters or all-digits (so tokens containing '.' or mixing
     letters+digits are dropped).
No stemming (Krovetz import commented out, WWW.java:7,353).

Equivalently (and how we implement it): findall of [A-Za-z0-9.]+ over
the raw text, lowercase, then the keep-filter. The raw `text` column is
never mutated — tokenization is a derived column (the per-turn
text-equality invariant).
"""

from __future__ import annotations

import re

from candidategeneration_ray.functions.stopwords import STOPWORDS

_TOKEN_RE = re.compile(r"[A-Za-z0-9.]+")
# A kept token is pure alpha or pure digit, len >= 2 (post-lowercase).
_ALPHA_RE = re.compile(r"[a-z]+\Z")
_DIGIT_RE = re.compile(r"[0-9]+\Z")


def tokenize_text(text: str) -> list[str]:
    """Tokenize one string with the reference's rules."""
    out = []
    for raw in _TOKEN_RE.findall(text):
        tok = raw.lower()
        if len(tok) > 1 and tok not in STOPWORDS and (
            _ALPHA_RE.match(tok) or _DIGIT_RE.match(tok)
        ):
            out.append(tok)
    return out


def tokenize_many(texts) -> list[list[str]]:
    """Tokenize a column of strings (one compiled-regex pass per row)."""
    findall = _TOKEN_RE.findall
    alpha = _ALPHA_RE.match
    digit = _DIGIT_RE.match
    stop = STOPWORDS
    result = []
    append = result.append
    for text in texts:
        toks = []
        tappend = toks.append
        for raw in findall(text or ""):
            tok = raw.lower()
            if len(tok) > 1 and tok not in stop and (alpha(tok) or digit(tok)):
                tappend(tok)
        append(toks)
    return result

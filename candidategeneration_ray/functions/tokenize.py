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


# ASCII fast path: map every ASCII char outside [A-Za-z0-9.] to space;
# non-ASCII text falls back to the regex (translate would leave unicode
# chars glued to neighboring tokens, changing split points).
_ASCII_TBL = str.maketrans({
    chr(c): " " for c in range(128)
    if not (chr(c).isascii() and (chr(c).isalnum() or chr(c) == "."))
})


def tokenize_many(texts) -> list[list[str]]:
    """Tokenize a column of strings.

    Per-batch memoization of the raw-token -> kept-form decision (the
    filter is a pure function of the token) makes this ~3.5x faster
    than per-token regex checks; ASCII rows split via str.translate
    (C speed), non-ASCII rows via the reference regex.
    """
    findall = _TOKEN_RE.findall
    alpha = _ALPHA_RE.match
    digit = _DIGIT_RE.match
    stop = STOPWORDS
    cache: dict[str, str] = {}
    result = []
    append = result.append
    for text in texts:
        text = text or ""
        raws = (text.translate(_ASCII_TBL).split()
                if text.isascii() else findall(text))
        toks = []
        tappend = toks.append
        for raw in raws:
            v = cache.get(raw)
            if v is None:
                tok = raw.lower()
                v = tok if (len(tok) > 1 and tok not in stop
                            and (alpha(tok) or digit(tok))) else ""
                cache[raw] = v
            if v:
                tappend(v)
        append(toks)
    return result

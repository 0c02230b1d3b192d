"""Lexicon operators: fuzzy distance kernel, deletion variants,
block-count invariance, and OR/AND consistency."""

import numpy as np
import pandas as pd
import pytest

from candidategeneration_ray.pipelines.lexicon import (
    _deletion_variants,
    _edit_distance_le1,
)

SF = "/root/testdata/sf0.001"


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = ["", "a", "ab", "ba", "abc", "acb", "abcd", "abd", "xbcd",
         "vector", "vectr", "vecttor", "wector", "vectors", "scan",
         "scann", "banana", "banane", "ananab", "table", "tible"]


def test_edit_distance_le1_matches_dp():
    for a in WORDS:
        for b in WORDS:
            true = _levenshtein(a, b)
            got = _edit_distance_le1(a, b)
            if true <= 1:
                assert got == true, (a, b)
            else:
                assert got is None, (a, b)


def test_deletion_variants_exhaustive():
    s = pd.Series(["abc", "x", ""], dtype=object)
    v = _deletion_variants(s)
    got = set(map(tuple, v[["variant", "row"]].itertuples(index=False)))
    expect = {("abc", 0), ("bc", 0), ("ac", 0), ("ab", 0),
              ("x", 1), ("", 1), ("", 2)}
    assert got == expect


def test_deletion_neighborhood_covers_ed1():
    # any pair at true distance <= 1 must share a deletion variant
    for a in WORDS:
        for b in WORDS:
            if _levenshtein(a, b) <= 1:
                va = set(_deletion_variants(
                    pd.Series([a], dtype=object))["variant"])
                vb = set(_deletion_variants(
                    pd.Series([b], dtype=object))["variant"])
                assert va & vb, (a, b)


@pytest.mark.usefixtures("ray_session")
def test_prefix_terms_block_invariance():
    from candidategeneration_ray.pipelines import lexicon as lx

    base = lx.q_prefix_terms(SF).to_pandas()
    base = base.sort_values(list(base.columns)).reset_index(drop=True)
    assert len(base) > 0
    # every returned term actually starts with its prefix and df >= 1
    assert all(t.startswith(p) for p, t in zip(base["prefix"], base["term"]))
    assert (base["df"] >= 1).all()
    # the per-block scan must not depend on the dictionary block count
    orig = lx._dictionary_ds
    try:
        lx._dictionary_ds = lambda sf, n_blocks=1: orig(sf, n_blocks=1)
        one = lx.q_prefix_terms(SF).to_pandas()
    finally:
        lx._dictionary_ds = orig
    one = one.sort_values(list(one.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, one)


@pytest.mark.usefixtures("ray_session")
def test_bool_or_superset_of_and():
    from candidategeneration_ray.pipelines.lexicon import q_bool_or_docs
    from candidategeneration_ray.pipelines.textlm import q_bool_and_docs

    or_t = q_bool_or_docs(SF).to_pandas()
    and_t = q_bool_and_docs(SF).to_pandas()
    or_pairs = set(zip(or_t["query_id"], or_t["doc_id"]))
    # AND docs for multi-term queries satisfy any m-of-k with m=2
    # (queries with >= 2 indexed kept terms)
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.docquery import DOC_QUERIES

    multi = {qid for qid, text in DOC_QUERIES
             if len(set(tokenize_text(text))) >= 2}
    for qid, did in zip(and_t["query_id"], and_t["doc_id"]):
        if qid in multi:
            assert (qid, did) in or_pairs


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_terms_sound_and_bounded():
    from candidategeneration_ray.pipelines.lexicon import (
        FUZZY_QUERIES, q_fuzzy_terms)

    t = q_fuzzy_terms(SF).to_pandas()
    assert len(t) > 0
    for qw, term, dist in zip(t["qword"], t["term"], t["dist"]):
        assert qw in FUZZY_QUERIES
        assert _levenshtein(qw, term) == dist <= 1
    # no duplicate (qword, term) pairs
    assert not t.duplicated(subset=["qword", "term"]).any()


def test_substring_docs_boundaries(ray_session, tmp_path, monkeypatch):
    """Patterns at doc start/end match; text straddling two docs must
    NOT match (separator windows can't satisfy the trigram filter);
    repeated occurrences dedup to one row."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines import lexicon as lx

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "spark at start",            # match at offset 0
            "ends with spark",           # match at end
            "spa",                       # straddle bait: next doc "rk..."
            "rk spark spark",            # repeated -> one row
        ], pa.string()),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    monkeypatch.setattr(lx, "SUBSTR_PATTERNS", ("spark",))
    got = lx.q_substring_docs(str(tmp_path)).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [0, 1, 3]
    assert (got["pattern"] == "spark").all()


def test_substring_docs_matches_bruteforce(ray_session):
    from candidategeneration_ray.pipelines import lexicon as lx
    import os
    import pyarrow.parquet as pq

    got = lx.q_substring_docs(SF).to_pandas()
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"])
    want = sorted(
        (p, int(d)) for d, x in zip(t.column("doc_id").to_pylist(),
                                    t.column("text").to_pylist())
        for p in lx.SUBSTR_PATTERNS if p in x)
    assert sorted(zip(got["pattern"], got["doc_id"])) == want
    assert len(want) > 0


def test_bitmap_index_reconstructs_doc_sets(ray_session):
    """Decoding every (col, value) bitmap back to doc ids reproduces
    the exact row sets of the base table, and each doc appears in
    exactly one value per column (the bitmaps partition the corpus)."""
    import numpy as np
    import pyarrow.parquet as pq
    from candidategeneration_ray.pipelines import lexicon as lx

    sf = "/root/testdata/sf0.001"
    rows = lx.q_bitmap_index(sf).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "lang", "source"]).to_pandas()
    for col in lx.BITMAP_COLS:
        seen = set()
        for value, grp in rows[rows["col"] == col].groupby("value"):
            got = set()
            for w, bits in zip(grp["word_idx"], grp["word_bits"]):
                b = int(bits)
                assert 0 <= b < (1 << lx.BITMAP_WORD_BITS)
                for i in range(lx.BITMAP_WORD_BITS):
                    if b & (1 << i):
                        got.add(int(w) * lx.BITMAP_WORD_BITS + i)
            want = set(docs.loc[docs[col] == value, "doc_id"].astype(int))
            assert got == want, (col, value)
            assert not (got & seen)
            seen |= got
        assert seen == set(docs["doc_id"].astype(int))


def test_bitmap_popcount_words():
    import numpy as np
    from candidategeneration_ray.pipelines.lexicon import _popcount_words

    a = np.array([0, 1, 0xFFFFFFFF, 0b1010], np.int64)
    assert _popcount_words(a) == 0 + 1 + 32 + 2


class TestBooleanCompiler:
    def test_parser_shapes_and_errors(self):
        import pytest as _pytest

        from candidategeneration_ray.pipelines.lexicon import parse_bool_query

        assert parse_bool_query("a") == ("term", "a")
        assert parse_bool_query("a AND b OR c") == (
            "or", ("and", ("term", "a"), ("term", "b")), ("term", "c"))
        assert parse_bool_query("a AND NOT (b OR c)") == (
            "andnot", ("term", "a"),
            ("or", ("term", "b"), ("term", "c")))
        for bad in ["", "AND a", "a AND", "(a", "a b", "a )"]:
            with _pytest.raises((ValueError, IndexError)):
                parse_bool_query(bad)

    def test_matches_bruteforce(self, ray_session):
        """Engine evaluation equals a per-doc python evaluation of the
        same AST over tokenized texts at sf0.001."""
        import pyarrow.parquet as pq

        from candidategeneration_ray.functions.tokenize import tokenize_many
        from candidategeneration_ray.pipelines.lexicon import (
            BOOL_QUERIES, parse_bool_query, q_boolean_query_docs)

        sf = "/root/testdata/sf0.001"
        got = q_boolean_query_docs(sf).to_pandas()
        docs = pq.read_table(f"{sf}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        tsets = dict(zip(docs.doc_id,
                         (set(t) for t in tokenize_many(list(docs.text)))))

        def ev(ast, s):
            k = ast[0]
            if k == "term":
                return ast[1] in s
            if k == "and":
                return ev(ast[1], s) and ev(ast[2], s)
            if k == "or":
                return ev(ast[1], s) or ev(ast[2], s)
            return ev(ast[1], s) and not ev(ast[2], s)

        want = {(qid, int(d)) for qid, text in BOOL_QUERIES
                for d, s in tsets.items() if ev(parse_bool_query(text), s)}
        have = {(int(r.query_id), int(r.doc_id)) for r in got.itertuples()}
        assert have == want


class TestDictionaryBytes:
    def test_known_vocabulary_arithmetic(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from candidategeneration_ray.pipelines.lexicon import (
            q_dictionary_bytes)

        # vocabulary: aaaa aaab aaac ... shares 3-char prefixes
        toks = [f"aaa{chr(97 + i)}" for i in range(10)]
        t = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(toks)], pa.string()),
        })
        d = str(tmp_path)
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = q_dictionary_bytes(d).to_pandas().iloc[0]
        assert got["n_terms"] == 10
        assert got["raw_bytes"] == 10 * (2 + 4)
        # head stored whole (6), 9 others at 2 + 1 suffix byte
        assert got["front_bytes"] == 6 + 9 * 3
        assert got["saved_ppm"] == ((60 - 33) * 1_000_000) // 60

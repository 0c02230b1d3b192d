"""Property tests for the textlm/relational kernels (no Ray session —
pure numpy/duckdb)."""

import collections

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from candidategeneration_ray.pipelines import relational as rl
from candidategeneration_ray.pipelines.textlm import (
    _packed_doc_terms, _segment_counts)

_tok = st.text(alphabet="abcde", min_size=1, max_size=4)
_doc = st.lists(_tok, min_size=0, max_size=12)


class TestPackedDocTerms:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(_doc, min_size=0, max_size=20))
    def test_matches_per_doc_counters(self, docs):
        lens, u, doc_g, term_g, tf_g = _packed_doc_terms(docs)
        assert lens.tolist() == [len(d) for d in docs]
        got = collections.defaultdict(dict)
        for d, t, f in zip(doc_g, term_g, tf_g):
            got[int(d)][u[t]] = int(f)
        want = {i: dict(collections.Counter(d))
                for i, d in enumerate(docs) if d}
        assert dict(got) == want

    @settings(max_examples=30, deadline=None)
    @given(st.lists(_doc, min_size=1, max_size=20))
    def test_u_is_sorted_unique(self, docs):
        _, u, _, _, _ = _packed_doc_terms(docs)
        assert list(u) == sorted(set(t for d in docs for t in d))


class TestSegmentCounts:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.lists(st.booleans(), min_size=1, max_size=8),
                    min_size=1, max_size=12))
    def test_matches_python_sums(self, segs):
        sizes = np.array([len(s) for s in segs], np.int64)
        flat = np.array([b for s in segs for b in s], bool)
        w = np.arange(flat.size, dtype=np.int64)
        n_hit, w_sum = _segment_counts(flat, sizes, w)
        off = 0
        for i, s in enumerate(segs):
            assert n_hit[i] == sum(s)
            assert w_sum[i] == sum(off + j for j, b in enumerate(s) if b)
            off += len(s)


class TestCentsVsDuckdb:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                              allow_nan=False, allow_infinity=False),
                    min_size=1, max_size=20))
    def test_cents_identical_to_sql_round(self, vals):
        v = np.array(vals, np.float64)
        con = duckdb.connect()
        want = [con.execute(
            "SELECT CAST(round(? * 100) AS BIGINT)", [float(x)]).fetchone()[0]
            for x in v]
        assert rl._cents(v).tolist() == want

"""Property tests for the sketch / clustering kernels (no Ray):
the guarantees the distributed paths rely on, checked on random inputs.
"""

import collections
from fractions import Fraction

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from candidategeneration_ray.pipelines import clustering as cl
from candidategeneration_ray.pipelines import sketches as sk

# token universe: pure-digit tokens (always kept by the tokenizer)
_tok = st.integers(min_value=10, max_value=9999).map(str)
_doc = st.lists(_tok, min_size=0, max_size=60).map(" ".join)


class TestMgPartialGuarantees:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(_doc, min_size=1, max_size=30))
    def test_lower_bound_and_absence_error(self, texts):
        batch = pa.table({"text": pa.array(texts, pa.string())})
        part = sk._mg_partial(batch)
        terms = part.column("term").to_pylist()
        cnts = part.column("cnt").to_pylist()
        assert terms[0] == sk._TOTAL_KEY
        true = collections.Counter(
            t for toks in map(str.split, texts) for t in toks)
        B = sum(true.values())
        assert cnts[0] == B                      # exact batch total
        err = B / (sk.MG_CAPACITY + 1)
        summary = dict(zip(terms[1:], cnts[1:]))
        assert len(summary) <= sk.MG_CAPACITY
        for t, c in summary.items():
            assert c <= true[t]                  # lower bound
            assert true[t] - c <= err            # bounded undercount
        for t, c in true.items():                # absent => small
            if t not in summary:
                assert c <= err


class TestHllMergeProperties:
    @settings(max_examples=25, deadline=None)
    @given(st.lists(_doc, min_size=1, max_size=40),
           st.integers(min_value=1, max_value=5))
    def test_split_merge_equals_whole(self, texts, n_parts):
        whole = sk._hll_partial(
            pa.table({"text": pa.array(texts, pa.string())}))

        def regs(tab):
            r = np.zeros(sk.HLL_M, dtype=np.int64)
            for reg, rho in zip(tab.column("register").to_pylist(),
                                tab.column("rho").to_pylist()):
                r[reg] = max(r[reg], rho)
            return r

        merged = np.zeros(sk.HLL_M, dtype=np.int64)
        bounds = np.linspace(0, len(texts), n_parts + 1).astype(int)
        for i in range(n_parts):
            part = sk._hll_partial(pa.table(
                {"text": pa.array(texts[bounds[i]:bounds[i + 1]], pa.string())}))
            merged = np.maximum(merged, regs(part))
        assert (regs(whole) == merged).all()

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                    min_size=1, max_size=200))
    def test_bit_length_matches_python(self, vals):
        x = np.array(vals, dtype=np.uint64)
        got = sk._bit_length_u64(x)
        assert got.tolist() == [v.bit_length() for v in vals]


class TestKmeansExactness:
    @settings(max_examples=50, deadline=None)
    @given(st.integers(min_value=-(1 << 45), max_value=1 << 45),
           st.integers(min_value=1, max_value=1 << 31))
    def test_floor_div_via_float_is_exact(self, s, c):
        # the centroid update computes floor(s/c) through float64
        # division; must equal the exact rational floor in the
        # documented range (|sum| < 2^46-ish, count < 2^31)
        got = int(np.floor(np.float64(s) / np.float64(c)))
        # guard: only guaranteed while the quotient magnitude stays
        # within the quantized-coordinate range the pipeline produces
        if abs(s) // c <= (1 << 17):
            assert got == Fraction(s, c).__floor__()

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=2, max_value=40),
           st.integers(min_value=2, max_value=8),
           st.integers(min_value=0, max_value=2 ** 31 - 1))
    def test_assign_matches_naive(self, n, dim, seed):
        rng = np.random.default_rng(seed)
        xq = rng.integers(-(1 << 17), 1 << 17, size=(n, dim), dtype=np.int64)
        cent = rng.integers(-(1 << 17), 1 << 17,
                            size=(cl.KMEANS_K, dim), dtype=np.int64)
        got = cl._assign(xq, cent)
        d2 = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        want = np.argmin(d2, axis=1)
        assert (got == want).all()

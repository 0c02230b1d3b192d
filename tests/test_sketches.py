"""Sketch aggregates (pipelines/sketches.py): exactness of the 2-pass
heavy hitters under real MG truncation, HLL error bound and
partition-independence, histogram/quantile invariants.  The sf0.01
oracle-identity check runs in test_driver_contract."""

import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from candidategeneration_ray.functions.tokenize import tokenize_many
from candidategeneration_ray.pipelines import sketches as sk

SF_DIR = "/root/testdata/sf0.001"


def _docs_table(texts: list[str], lo: int = 0) -> pa.Table:
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(range(lo, lo + n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["synth"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _write_docs(path: str, texts: list[str], num_files: int) -> str:
    """sf-dir layout; documents.parquet is a DIRECTORY of num_files
    part files when num_files > 1 (read_parquet accepts both)."""
    if num_files == 1:
        pq.write_table(_docs_table(texts),
                       os.path.join(path, "documents.parquet"))
        return path
    d = os.path.join(path, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    bounds = np.linspace(0, len(texts), num_files + 1).astype(int)
    for i in range(num_files):
        pq.write_table(
            _docs_table(texts[bounds[i]:bounds[i + 1]], lo=int(bounds[i])),
            os.path.join(d, f"part_{i}.parquet"))
    return path


@pytest.fixture(scope="module")
def skewed_docs(tmp_path_factory, ray_session):
    """500 docs x 150 pure-digit tokens: a Zipf-ish head (so frequent
    terms exist) over a ~40k-distinct tail (so per-batch vocab far
    exceeds MG_CAPACITY and the decrement path actually runs, and HLL
    is in its estimator regime rather than linear counting)."""
    rng = np.random.default_rng(7)
    texts = []
    uniq = 100000
    for d in range(500):
        toks = []
        for _ in range(150):
            r = rng.random()
            if r < 0.30:                     # head: 20 hot terms
                toks.append(str(1000 + rng.integers(20)))
            elif r < 0.45:                   # warm: 500 terms
                toks.append(str(2000 + rng.integers(500)))
            else:                            # tail: fresh token
                uniq += 1
                toks.append(str(uniq))
        texts.append(" ".join(toks))
    d1 = _write_docs(str(tmp_path_factory.mktemp("docs1f")), texts, 1)
    return d1, texts


def _exact_counts(texts: list[str]) -> collections.Counter:
    c = collections.Counter()
    for toks in tokenize_many(texts):
        c.update(toks)
    return c


class TestFrequentTerms:
    def test_exact_under_mg_truncation(self, skewed_docs):
        d, texts = skewed_docs
        counts = _exact_counts(texts)
        total = sum(counts.values())
        threshold = -(-50 * total // 10000)
        expect = sorted(((t, c) for t, c in counts.items() if c >= threshold),
                        key=lambda x: (-x[1], x[0]))
        got = sk.q_frequent_terms(d).to_pandas()
        assert list(map(tuple, got.itertuples(index=False))) == expect
        assert len(expect) >= 10  # the fixture actually has hitters

    def test_mg_partial_truncates(self, skewed_docs):
        d, texts = skewed_docs
        batch = pa.table({"text": pa.array(texts[:200], pa.string())})
        part = sk._mg_partial(batch)
        # vocab in 200 docs is ~>10k; the summary must be capped
        assert part.num_rows <= sk.MG_CAPACITY + 1
        assert part.column("term").to_pylist()[0] == ""

    def test_sf_small(self, ray_session):
        import pyarrow.dataset as pads

        texts = pads.dataset(
            os.path.join(SF_DIR, "documents.parquet")).to_table(
            columns=["text"]).column("text").to_pylist()
        counts = _exact_counts(texts)
        total = sum(counts.values())
        threshold = -(-50 * total // 10000)
        expect = {t: c for t, c in counts.items() if c >= threshold}
        got = sk.q_frequent_terms(SF_DIR).to_pandas()
        assert dict(zip(got["term"], got["cnt"])) == expect


class TestHll:
    def test_error_bound_and_partition_independence(self, skewed_docs,
                                                    tmp_path_factory):
        d1, texts = skewed_docs
        exact = len(_exact_counts(texts))
        assert exact > 30000  # estimator regime, not linear counting
        est1 = sk.q_hll_distinct_terms(d1)["n_distinct_est"][0].as_py()
        assert abs(est1 - exact) / exact < 0.05
        # same rows split across 8 files -> different batches/parallelism
        # -> identical registers (max is commutative) -> identical estimate
        d8 = _write_docs(str(tmp_path_factory.mktemp("docs8f")), texts, 8)
        est8 = sk.q_hll_distinct_terms(d8)["n_distinct_est"][0].as_py()
        assert est8 == est1


class TestHistogram:
    def test_totals_and_quantiles(self, skewed_docs):
        d, texts = skewed_docs
        hist = sk.q_doclen_histogram(d).to_pandas()
        assert hist["n_docs"].sum() == len(texts)
        assert (hist["lo_chars"] == hist["bin"] * sk.HIST_BIN_WIDTH).all()
        qs = sk.q_doclen_quantiles(d).to_pandas().sort_values("pct")
        assert (qs["bin"].diff().dropna() >= 0).all()  # monotone in pct
        # direct rank check: ub bin covers the ceil-rank doc length
        lens = np.sort(np.array([len(t) for t in texts]))
        for _, row in qs.iterrows():
            target = -(-int(row["pct"]) * len(lens) // 100)
            v = lens[target - 1]
            assert row["bin"] == v // sk.HIST_BIN_WIDTH


class TestBloom:
    def test_state_matches_direct_construction(self, ray_session):
        import pyarrow.parquet as pq

        from candidategeneration_ray.functions.tokenize import tokenize_text
        from candidategeneration_ray.pipelines import sketches as sk

        SF_ = "/root/testdata/sf0.001"
        txt = pq.read_table(SF_ + "/documents.parquet", columns=["text"])
        toks = np.unique(np.asarray(
            [t for s in txt.column("text").to_pylist()
             for t in tokenize_text(s)], dtype=object))
        want = sk._bloom_bits_of(toks).tolist()
        got = sk.q_bloom_bits(SF_).to_pandas()["bit"].tolist()
        assert got == want
        assert 0 < len(got) <= sk.BLOOM_M

    def test_membership_no_false_negatives(self, ray_session):
        from candidategeneration_ray.pipelines import sketches as sk

        got = sk.q_bloom_membership("/root/testdata/sf0.001").to_pandas()
        by_term = dict(zip(got["term"], got["in_filter"]))
        # present terms must be found (bloom has no false negatives)
        for t in ("query", "join", "vector", "batch"):
            assert by_term[t] == 1, t


def test_source_pct_rank_semantics(ray_session):
    """pct = (#strictly shorter in source) * 1e6 // n_source; doc set
    complete; min per source is 0 and max < 1e6."""
    import pyarrow.parquet as pq

    from candidategeneration_ray.pipelines.sketches import q_source_pct_rank

    SF_ = "/root/testdata/sf0.001"
    got = q_source_pct_rank(SF_).to_pandas()
    raw = pq.read_table(SF_ + "/documents.parquet",
                        columns=["doc_id", "source", "n_chars"]).to_pandas()
    assert len(got) == len(raw)
    for s, g in raw.groupby("source"):
        sub = got[got["source"] == s].set_index("doc_id")
        n = len(g)
        for r in g.itertuples():
            below = int((g["n_chars"] < r.n_chars).sum())
            assert sub.loc[r.doc_id, "pct_millionths"] == below * 1_000_000 // n
    assert got.groupby("source")["pct_millionths"].min().eq(0).all()
    assert (got["pct_millionths"] < 1_000_000).all()


def test_keyed_hll_reduces_to_global(ray_session):
    """Max over sources of each register's rho == the global register
    state (HLL merge is a max-union), and every per-source register
    also appears globally."""
    from candidategeneration_ray.pipelines.sketches import (
        q_hll_registers, q_hll_registers_by_source)

    SF_ = "/root/testdata/sf0.001"
    keyed = q_hll_registers_by_source(SF_).to_pandas()
    glob = q_hll_registers(SF_).to_pandas().set_index("register")["rho"]
    union = keyed.groupby("register")["rho"].max()
    assert union.to_dict() == glob.to_dict()


class TestCountMin:
    def test_upper_bound_and_exactness(self, ray_session):
        from candidategeneration_ray.pipelines.sketches import (
            q_cmsketch_estimates)

        got = q_cmsketch_estimates("/root/testdata/sf0.001").to_pandas()
        # CM never underestimates
        assert (got["cm_estimate"] >= got["true_count"]).all()
        # absent probes still get 0 truth
        by_term = got.set_index("term")
        assert by_term.loc["zzqq", "true_count"] == 0
        assert by_term.loc["query", "true_count"] > 0

    def test_counter_mass_conserved(self, ray_session):
        """Each depth row's counters sum to the total token count."""
        import pyarrow.parquet as pq

        from candidategeneration_ray.functions.tokenize import tokenize_text
        from candidategeneration_ray.pipelines.sketches import (
            CM_DEPTH, q_cmsketch_counters)

        SF_ = "/root/testdata/sf0.001"
        txt = pq.read_table(SF_ + "/documents.parquet", columns=["text"])
        total = sum(len(tokenize_text(s))
                    for s in txt.column("text").to_pylist())
        got = q_cmsketch_counters(SF_).to_pandas()
        sums = got.groupby("depth")["cnt"].sum()
        assert sums.tolist() == [total] * CM_DEPTH


def test_source_ntile_equi_count(ray_session):
    """Per source: tiles partition the docs, sizes differ by at most
    one, and the larger tiles come first (DuckDB ntile semantics)."""
    from candidategeneration_ray.pipelines import sketches as sk

    got = sk.q_source_ntile("/root/testdata/sf0.001").to_pandas()
    for s, grp in got.groupby("source"):
        sizes = grp.groupby("tile").size()
        assert set(sizes.index) == set(range(1, len(sizes) + 1))
        assert sizes.max() - sizes.min() <= 1
        assert (sizes.sort_index().diff().dropna() <= 0).all()

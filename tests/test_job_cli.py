"""The ray-job CLI end to end in real subprocesses (each owns its own
Ray session, as `ray job submit` would)."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    out = subprocess.run(
        [sys.executable, "-m", "candidategeneration_ray.job", *args],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    from candidategeneration_ray.sources.transcripts import write_transcripts

    d = tmp_path_factory.mktemp("cli_corpus")
    return write_transcripts(str(d), num_convs=40, seed=42, num_files=3)


class TestJobCli:
    def test_build_query_resume(self, cli_corpus, tmp_path_factory):
        out_dir = str(tmp_path_factory.mktemp("cli_idx"))
        r = _run(["build", "--input", cli_corpus, "--out", out_dir,
                  "--partitions", "2", "--num-cpus", "4"])
        assert r["ok"] and r["n_docs"] > 0
        assert not any(p.get("skipped") for p in r["phases"])

        # resume: second build must skip everything
        r2 = _run(["build", "--input", cli_corpus, "--out", out_dir,
                   "--partitions", "2", "--num-cpus", "4"])
        assert all(p.get("skipped") for p in r2["phases"])

        # query through the CLI
        qdir = tmp_path_factory.mktemp("cli_q")
        qfile = str(qdir / "queries.parquet")
        pq.write_table(pa.table({
            "query_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["query engine", "data worker"]),
        }), qfile)
        cand_dir = str(qdir / "cands")
        rq = _run(["query", "--index", out_dir, "--queries", qfile,
                   "--out", cand_dir, "--num-cpus", "4"])
        assert rq["ok"]
        import pyarrow.dataset as pads

        t = pads.dataset(cand_dir).to_table()
        assert t.num_rows > 0
        assert set(t.schema.names) == {"query_id", "rank", "doc_id", "score"}

"""The north-rule launch mode: ``spark-submit --py-files unfurl_spark.zip
plans/driver.py`` must run the full job and resume idempotently.

Mirrors the reference's production entry (`urlScraper`,
packages/unfurl/src/index.ts:159-166) re-expressed as a cluster job
submission; the sandbox has no cluster manager so master is local[4].
"""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_job_and_resume(tmp_path):
    from unfurl_spark.sources.synthetic import write_corpus

    corpus = write_corpus(str(tmp_path / "corpus"), 300, seed=7)
    zip_path = shutil.make_archive(
        str(tmp_path / "unfurl_spark"), "zip", REPO, "unfurl_spark")
    out = str(tmp_path / "out")

    def submit():
        r = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--py-files", zip_path,
             os.path.join(REPO, "unfurl_spark", "plans", "driver.py"),
             "--input", corpus["documents_raw"],
             "--output", out,
             "--oembed", corpus["oembed_docs"],
             "--media", corpus["media_payloads"],
             "--buckets", "4", "--buckets-per-job", "2"],
            capture_output=True, text=True, timeout=420)
        assert r.returncode == 0, r.stderr[-3000:]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        return json.loads(line)

    first = submit()
    assert first["processed_buckets"] == [0, 1, 2, 3]
    assert first["n_docs"] == 300
    assert first["n_failures"] == 0

    # second submission: every bucket already committed → pure resume
    second = submit()
    assert second["resumed_buckets"] == [0, 1, 2, 3]
    assert second["processed_buckets"] == []

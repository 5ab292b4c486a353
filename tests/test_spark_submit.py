"""Deployment-contract pin (north_rule: "run via spark-submit --py-files"):
the package must be fully importable from a --py-files zip by a driver in a
scratch cwd, and mapInPandas closures must unpickle on executors.  Shells
out to the real spark-submit — this is the one test that exercises the
cluster deployment story rather than an in-process session."""

import os
import re
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_smoke():
    out = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "smoke_spark_submit.sh"), "local[4]"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYSPARK_PYTHON": shutil.which("python")},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"TRIPLES_WRITTEN (\d+)", out.stdout)
    assert m, out.stdout[-2000:]
    assert int(m.group(1)) > 0

"""True spark-submit --py-files deploy of the job CLI (S6 launch surface).

The other job tests exercise job.run() in-process; this one launches a real
`spark-submit --master local[4] --py-files flow_feature_spark.zip driver.py`
subprocess whose ONLY access to the package is the shipped zip (PYTHONPATH
stripped, cwd outside the repo), mirroring how the job reaches a cluster
(reference basis: flow-feature is invoked as a standalone script,
get_flow_feature.py:1-20; our deploy unit is the package zip).

Also pins the session factory's master-resolution contract: with no --master
arg and no SPARK_GRAFT_MASTER, the submit-provided master must win over the
local default (session.py), or cluster deploys silently run local.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from flow_feature_spark import job
from flow_feature_spark.synth import synth_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

DRIVER_SRC = """\
import sys

from flow_feature_spark.session import get_spark

spark = get_spark(app_name="ffs_submit_probe")
print("RESOLVED_MASTER=" + spark.sparkContext.master, flush=True)

from flow_feature_spark.job import run

sys.exit(run(sys.argv[1:]))
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_job(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    synth_transcripts(spark, n_convs=30, turns_mean=8).write.parquet(inp)

    zip_path = str(tmp_path / "flow_feature_spark.zip")
    subprocess.run(
        ["sh", os.path.join(REPO, "tools", "make_pyfiles_zip.sh"), zip_path],
        check=True,
        capture_output=True,
    )
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER_SRC)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env.pop("SPARK_GRAFT_MASTER", None)
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_GRAFT_LOCAL_DIR"] = str(tmp_path / "spark-local")

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            str(driver),
            "--input",
            inp,
            "--output",
            out,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # submit-provided master respected (no --master arg reached job.run)
    assert "RESOLVED_MASTER=local[4]" in proc.stdout

    # bit-for-bit parity with the in-process engine on the same input
    ref_out = str(tmp_path / "ref_out")
    assert job.run(["--input", inp, "--output", ref_out]) == 0
    got = spark.read.parquet(out)
    ref = spark.read.parquet(ref_out)
    assert got.schema == ref.schema
    key = [got.columns[0], got.columns[1]]
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    assert got.count() > 20

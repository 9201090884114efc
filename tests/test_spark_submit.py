"""True ``spark-submit --py-files`` submission test — the north-rule
invocation shape (BASELINE.json: "run via spark-submit --py-files on a
multi-executor cluster").

Builds ``docee_spark.zip`` exactly as the README documents, copies the
entrypoint OUT of the repo, and runs ``spark-submit`` from a scratch cwd
with PYTHONPATH scrubbed — so every ``docee_spark`` import (driver- and
executor-side, including the Arrow UDF workers) must resolve from the
submitted zip, not from the working tree. Reference analog: the package
is importable from the run script alone (run_dee_task.py's flat-repo
invocation).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(zpath: str) -> None:
    pkg = os.path.join(REPO, "docee_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zpath = str(tmp_path / "docee_spark.zip")
    _build_zip(zpath)

    # the entrypoint leaves the repo: a stale relative import or a cwd
    # fallback would pass silently if we submitted from /root/repo
    main = str(tmp_path / "cli_main.py")
    shutil.copy(os.path.join(REPO, "docee_spark", "cli.py"), main)
    out = str(tmp_path / "kg")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zpath,
            main,
            "--synth",
            "800",
            "--output",
            out,
            "--fused",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["triples"] > 0

    # the emitted table is real parquet with the KG schema
    import duckdb

    cols = {
        r[0]
        for r in duckdb.sql(
            f"describe select * from read_parquet('{out}/triples/*.parquet')"
        ).fetchall()
    }
    assert {"doc_id", "event_type", "subj", "pred", "obj"} <= cols

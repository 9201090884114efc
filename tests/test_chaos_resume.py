"""Chaos kill/resume: SIGKILL the cli run mid-stage, resume, and verify
(a) committed stages are skipped (manifest untouched) and (b) the final
triples are byte-identical to an uninterrupted run's.

Reference analog: epoch-checkpoint resume (dee/tasks/dee_task.py:746-760,
get_latest_cpt_epoch :887-907) — a crashed training run resumes from the
last saved epoch; here a crashed pipeline resumes from the last committed
stage table (StageStore write-then-rename manifests).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import duckdb
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = "6000"
FINGERPRINT = "chaos-fp-1"


def _cli_cmd(out: str, store: str) -> list[str]:
    return [
        sys.executable,
        "-m",
        "docee_spark.cli",
        "--synth",
        N_DOCS,
        "--output",
        out,
        "--store",
        store,
        "--fingerprint",
        FINGERPRINT,
    ]


def _env() -> dict[str, str]:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _triples(out_dir: str):
    return duckdb.sql(
        "select doc_id, event_type, recguid, subj, pred, obj "
        f"from read_parquet('{out_dir}/triples/*.parquet') order by all"
    ).fetchall()


class TestChaosResume:
    def test_kill_mid_stage_then_resume_matches_uninterrupted(self, tmp_path):
        base_out, base_store = str(tmp_path / "base_out"), str(tmp_path / "base_store")
        out, store = str(tmp_path / "out"), str(tmp_path / "store")

        # 1. uninterrupted baseline run (own store)
        r = subprocess.run(
            _cli_cmd(base_out, base_store),
            env=_env(),
            capture_output=True,
            text=True,
            timeout=900,
            cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-3000:]

        # 2. start an identical run and SIGKILL the whole process group the
        # moment the first stage manifest commits (mid-pipeline, before
        # decode/triples commit)
        proc = subprocess.Popen(
            _cli_cmd(out, store),
            env=_env(),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            cwd=REPO,
            start_new_session=True,  # own process group → JVM dies with it
        )
        manifest = os.path.join(store, "segment.manifest.json")
        deadline = time.time() + 600
        while (
            time.time() < deadline
            and not os.path.exists(manifest)
            and proc.poll() is None
        ):
            time.sleep(0.1)
        killed = False
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            killed = True
        assert os.path.exists(manifest), "segment stage never committed"
        assert killed, "run finished before the kill window — shrink N_DOCS"
        seg_meta = json.loads(open(manifest).read())
        assert seg_meta["input_fingerprint"] == FINGERPRINT
        # the kill landed mid-pipeline: the final stage is not committed
        assert not os.path.exists(os.path.join(store, "triples.manifest.json"))

        # 3. resume: same store + fingerprint → committed stages skipped
        r2 = subprocess.run(
            _cli_cmd(out, store),
            env=_env(),
            capture_output=True,
            text=True,
            timeout=900,
            cwd=REPO,
        )
        assert r2.returncode == 0, r2.stderr[-3000:]
        seg_meta2 = json.loads(open(manifest).read())
        # skipped, not recomputed: manifest commit timestamp unchanged
        assert seg_meta2["committed_at"] == seg_meta["committed_at"]
        assert os.path.exists(os.path.join(store, "triples.manifest.json"))

        # 4. resumed output == uninterrupted output, row for row
        a, b = _triples(base_out), _triples(out)
        assert len(a) > 0
        assert a == b

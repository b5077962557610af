"""The pre-commit hook's BENCH.json fence (r9 verdict #2): the
official bench artifact regressed once to an sf0.01 smoke run
mid-round; the hook must reject any staged BENCH.json whose sf is not
0.1 or whose self-calibration fields are missing. Exercised in a
scratch git repo so the real working tree is never touched."""

from __future__ import annotations

import json
import shutil
import subprocess

REPO_HOOKS = "/root/repo/hooks"


def _run(cwd, *args):
    return subprocess.run(args, cwd=cwd, capture_output=True, text=True)


def _scratch_repo(tmp_path):
    repo = tmp_path / "scratch"
    repo.mkdir()
    _run(repo, "git", "init", "-q")
    _run(repo, "git", "config", "user.email", "t@example.invalid")
    _run(repo, "git", "config", "user.name", "t")
    shutil.copytree(REPO_HOOKS, repo / "hooks")
    _run(repo, "git", "config", "core.hooksPath", "hooks")
    return repo


def test_pre_commit_rejects_wrong_sf(tmp_path):
    repo = _scratch_repo(tmp_path)
    (repo / "BENCH.json").write_text(
        json.dumps({"sf": 0.01, "value": 1.0, "calibration": 0.7,
                    "value_per_calib": 1.4, "scaled_calibration": 0.6})
    )
    _run(repo, "git", "add", "-A")
    r = _run(repo, "git", "commit", "-m", "smoke overwrite")
    assert r.returncode != 0
    assert "rejected" in (r.stderr + r.stdout)


def test_pre_commit_rejects_missing_calibration(tmp_path):
    repo = _scratch_repo(tmp_path)
    (repo / "BENCH.json").write_text(json.dumps({"sf": 0.1, "value": 1.0}))
    _run(repo, "git", "add", "-A")
    r = _run(repo, "git", "commit", "-m", "uncalibrated")
    assert r.returncode != 0
    assert "calibration" in (r.stderr + r.stdout)


def test_pre_commit_accepts_official_shape(tmp_path):
    repo = _scratch_repo(tmp_path)
    (repo / "BENCH.json").write_text(
        json.dumps({"sf": 0.1, "value": 1.0, "calibration": 0.7,
                    "value_per_calib": 1.4, "scaled_calibration": 0.6})
    )
    _run(repo, "git", "add", "-A")
    r = _run(repo, "git", "commit", "-m", "official")
    assert r.returncode == 0, r.stderr

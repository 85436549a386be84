"""bench_check (tools/): the wall-time regression gate's three verdicts
— clean, regressed (exit 1, named query), SF-mismatch refusal (exit 2).
Runs against the committed BENCH_DETAIL.json baseline via git show, the
same path the gate chain uses."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "bench_check.py")


def _run(*extra):
    return subprocess.run(
        [sys.executable, TOOL, *extra],
        capture_output=True, text=True, cwd=REPO,
    )


def _baseline():
    out = subprocess.run(
        ["git", "show", "HEAD:BENCH_DETAIL.json"],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    return json.loads(out)


def test_identical_detail_passes(tmp_path):
    p = tmp_path / "fresh.json"
    p.write_text(json.dumps(_baseline()))
    r = _run("--fresh", str(p))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 regressed" in r.stdout


def test_doubled_warm_time_fails_with_name(tmp_path):
    d = _baseline()
    name = max(d["warm_queries"], key=d["warm_queries"].get)
    d["warm_queries"][name] = d["warm_queries"][name] * 2
    p = tmp_path / "fresh.json"
    p.write_text(json.dumps(d))
    r = _run("--fresh", str(p))
    assert r.returncode == 1
    assert f"REGRESSED {name}" in r.stdout


def test_sub_floor_queries_are_noise_exempt(tmp_path):
    d = _baseline()
    small = [n for n, t in d["warm_queries"].items() if t < 0.37]
    assert small, "expected at least one sub-0.37s warm query"
    for n in small:
        d["warm_queries"][n] = d["warm_queries"][n] * 2  # still < floor
    p = tmp_path / "fresh.json"
    p.write_text(json.dumps(d))
    assert _run("--fresh", str(p)).returncode == 0


def test_sf_mismatch_refused(tmp_path):
    d = _baseline()
    d["sf"] = 0.0101
    p = tmp_path / "fresh.json"
    p.write_text(json.dumps(d))
    r = _run("--fresh", str(p))
    assert r.returncode == 2
    assert "SF mismatch" in r.stdout

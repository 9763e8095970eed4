"""`crawlray submit` packaging: the dry-run submission must carry a valid
runtime_env + entrypoint, and the entrypoint string must actually run a
crawl end-to-end when executed (the local stand-in for driving the Ray Job
API — no dashboard/cluster exists in this sandbox)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_submit_dry_run_shape():
    p = subprocess.run(
        [sys.executable, "-m", "crawlray.cli", "submit", "--dry-run",
         "--n-urls", "80", "--budget", "2", "--max-pages", "30"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr
    sub = json.loads(p.stdout.strip().splitlines()[-1])
    assert sub["runtime_env"]["working_dir"] == REPO
    assert sub["entrypoint"].startswith("python -m crawlray.cli run ")
    assert "--max-pages 30" in sub["entrypoint"]
    assert "ray job submit" in sub["equivalent_cli"]


def test_submit_entrypoint_executes():
    # what `ray job submit` would exec on the cluster must run standalone
    p = subprocess.run(
        [sys.executable, "-m", "crawlray.cli", "submit", "--dry-run",
         "--n-urls", "60", "--n-hosts", "4", "--budget", "3", "--max-pages", "25"],
        capture_output=True, text=True, cwd=REPO,
    )
    entry = json.loads(p.stdout.strip().splitlines()[-1])["entrypoint"].split()
    assert entry[0] == "python"
    env = dict(os.environ, RAY_DEDUP_LOGS="0")
    q = subprocess.run(
        [sys.executable] + entry[1:] + ["--num-cpus", "2"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert q.returncode == 0, q.stderr[-2000:]
    out = json.loads(q.stdout.strip().splitlines()[-1])
    assert out["fetched"] == 25
    assert out["waves"] >= 1

"""Provenance stamp for validation records.

Every `validation/*.json` carries the git SHA and tree state of the run
that produced it, so a drifted solver cannot silently hide behind a
stale recorded number (the recorded-validation tests assert these
records; the slow tier re-runs physics from scratch).
"""

from __future__ import annotations

import datetime
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def provenance() -> dict:
    def git(*args: str) -> str:
        try:
            return subprocess.run(
                ["git", "-C", REPO, *args], capture_output=True, text=True,
                timeout=10).stdout.strip()
        except Exception:
            return ""

    sha = git("rev-parse", "HEAD")
    dirty = bool(git("status", "--porcelain", "--untracked-files=no"))
    return {
        "git_sha": sha or None,
        "dirty_tree": dirty,
        "recorded_utc": datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
    }

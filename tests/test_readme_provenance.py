"""README perf numbers must come from committed artifacts (VERDICT r3 #7:
the README drifted from the measured numbers in two consecutive rounds).

tools/readme_bench.py generates the table between the BENCH markers from
the newest bench JSON; --check fails when the README text differs from
what the artifacts produce.
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_matches_artifacts():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "readme_bench.py"),
         "--check"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr

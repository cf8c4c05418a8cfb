"""End-to-end CLI tests: write binary graph → dw gibbs → check marginals
file against the oracle (the reference's e2e shell-driver analog)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from sampler_tpu import fixtures, oracle
from sampler_tpu.cli import main
from sampler_tpu.io import binary, results


def run_cli(argv):
    return main(argv)


def test_gibbs_end_to_end(tmp_path):
    g = fixtures.ising_grid(3, 3, w_pair=0.4, w_bias=0.3)
    outdir = str(tmp_path / "out")
    binary.write_graph(g, str(tmp_path))
    rc = run_cli([
        "gibbs",
        "-w", str(tmp_path / "graph.weights"),
        "-v", str(tmp_path / "graph.variables"),
        "-f", str(tmp_path / "graph.factors"),
        "-m", str(tmp_path / "graph.meta"),
        "-o", outdir,
        "-i", "2000", "-b", "200", "--n_chains", "8", "--quiet",
    ])
    assert rc == 0
    parsed = results.read_marginals(os.path.join(outdir,
                                                 "inference_result.out.text"))
    exact = oracle.exact_marginals(g)
    errs = [abs(p - exact[vid, 1]) for vid, cat, p in parsed]
    assert max(errs) < 0.015
    # weights file exists with one line per weight
    wlines = open(os.path.join(outdir,
                               "inference_result.out.weights.text")).readlines()
    assert len(wlines) == g.n_weights


def test_gibbs_learning_end_to_end(tmp_path):
    g = fixtures.labeled_coin_graph(n_flips=300, p_heads=0.8, seed=5)
    outdir = str(tmp_path / "out")
    binary.write_graph(g, str(tmp_path))
    rc = run_cli([
        "gibbs",
        "-w", str(tmp_path / "graph.weights"),
        "-v", str(tmp_path / "graph.variables"),
        "-f", str(tmp_path / "graph.factors"),
        "-m", str(tmp_path / "graph.meta"),
        "-o", outdir,
        "-l", "300", "-a", "0.02", "-d", "0.995", "-i", "10", "--quiet",
    ])
    assert rc == 0
    wlines = open(os.path.join(outdir,
                               "inference_result.out.weights.text")).readlines()
    w = float(wlines[0].split()[1])
    p_hat = g.var_init.mean()
    w_star = np.log(p_hat / (1 - p_hat))
    assert w == pytest.approx(w_star, abs=0.2)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dw_subprocess(args, env_extra=None):
    """Run the CLI in a real subprocess (the fault hook os._exit's)."""
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               **(env_extra or {}))
    return subprocess.run(
        [sys.executable, "-m", "sampler_tpu.cli"] + args,
        env=env, cwd=REPO, capture_output=True, text=True)


def test_checkpoint_kill_and_resume_cli(tmp_path):
    """Preemption recovery (SURVEY.md §5.3/5.4): a run killed mid-flight by
    the fault-injection hook and then --resume'd must write EXACTLY the
    marginals and weights of an uninterrupted run with the same
    --checkpoint_every — chunk keys are folded from absolute indices, so
    the RNG stream replays identically across the kill."""
    g = fixtures.labeled_coin_graph(n_flips=60, p_heads=0.75, seed=7)
    binary.write_graph(g, str(tmp_path))
    base = [
        "gibbs", "--platform", "cpu",
        "-w", str(tmp_path / "graph.weights"),
        "-v", str(tmp_path / "graph.variables"),
        "-f", str(tmp_path / "graph.factors"),
        "-m", str(tmp_path / "graph.meta"),
        "-l", "4", "-a", "0.05", "-b", "50", "-i", "100",
        "--n_chains", "4", "--checkpoint_every", "25", "--quiet",
    ]
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")

    # uninterrupted checkpointed run + a profiler trace
    prof = str(tmp_path / "prof")
    r = _dw_subprocess(base + ["-o", out_a, "--profile", prof])
    assert r.returncode == 0, r.stderr
    assert os.path.isdir(os.path.join(prof, "plugins", "profile"))

    # killed after 5 checkpoint saves (inside the inference phase:
    # 2 learn saves + 2 burn saves + 1 infer save), then resumed
    r = _dw_subprocess(base + ["-o", out_b],
                       env_extra={"SAMPLER_TPU_FAULT_AFTER": "5"})
    assert r.returncode == 3, (r.returncode, r.stderr)
    assert os.path.exists(os.path.join(out_b, "checkpoint.npz"))
    assert not os.path.exists(os.path.join(out_b,
                                           "inference_result.out.text"))
    r = _dw_subprocess(base + ["-o", out_b, "--resume"])
    assert r.returncode == 0, r.stderr

    for fname in ["inference_result.out.text",
                  "inference_result.out.weights.text"]:
        a = open(os.path.join(out_a, fname)).read()
        b = open(os.path.join(out_b, fname)).read()
        assert a == b, f"{fname} differs after kill+resume"


def test_checkpoint_kill_and_resume_graph_sharded(tmp_path):
    """Kill+resume for GRAPH-SHARDED runs (VERDICT.md r2 #5): the sharded
    learn/burn/infer pipeline checkpoints at chunk boundaries and a killed
    run resumed must write EXACTLY the uninterrupted run's outputs."""
    g = fixtures.labeled_coin_graph(n_flips=64, p_heads=0.75, seed=9)
    binary.write_graph(g, str(tmp_path))
    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    base = [
        "gibbs", "--platform", "cpu",
        "-w", str(tmp_path / "graph.weights"),
        "-v", str(tmp_path / "graph.variables"),
        "-f", str(tmp_path / "graph.factors"),
        "-m", str(tmp_path / "graph.meta"),
        "-l", "4", "-a", "0.05", "-b", "30", "-i", "60",
        "--n_chains", "2", "--n_graph_shards", "2",
        "--checkpoint_every", "20", "--quiet",
    ]
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")

    r = _dw_subprocess(base + ["-o", out_a], env_extra=env)
    assert r.returncode == 0, r.stderr

    # kill after 3 saves (1 learn chunk save + 2 infer chunk saves), resume
    r = _dw_subprocess(base + ["-o", out_b],
                       env_extra={**env, "SAMPLER_TPU_FAULT_AFTER": "3"})
    assert r.returncode == 3, (r.returncode, r.stderr)
    assert os.path.exists(os.path.join(out_b, "checkpoint.npz"))
    r = _dw_subprocess(base + ["-o", out_b, "--resume"], env_extra=env)
    assert r.returncode == 0, r.stderr

    for fname in ["inference_result.out.text",
                  "inference_result.out.weights.text"]:
        a = open(os.path.join(out_a, fname)).read()
        b = open(os.path.join(out_b, fname)).read()
        assert a == b, f"{fname} differs after sharded kill+resume"


def test_text2bin_bin2text_round_trip(tmp_path):
    from sampler_tpu.io import text
    g = fixtures.mixed_graph()
    sections = text.graph_to_text(g)
    for rel in ["weight", "variable", "factor"]:
        tsv = tmp_path / f"{rel}.tsv"
        tsv.write_text("\n".join(sections[rel + "s"]) + "\n")
        binf = tmp_path / f"{rel}.bin"
        assert run_cli(["text2bin", rel, str(tsv), str(binf)]) == 0
        back = tmp_path / f"{rel}.tsv2"
        assert run_cli(["bin2text", rel, str(binf), str(back)]) == 0
        assert back.read_text().strip() == tsv.read_text().strip()


def test_gibbs_graph_sharded_cli(tmp_path):
    """--n_graph_shards routes through the (chains, graph) mesh: learning
    via learn_gs, inference via infer_gs, same outputs and oracle parity."""
    g = fixtures.ising_grid(3, 3, w_pair=0.4, w_bias=0.3)
    outdir = str(tmp_path / "out")
    binary.write_graph(g, str(tmp_path))
    rc = run_cli([
        "gibbs",
        "-w", str(tmp_path / "graph.weights"),
        "-v", str(tmp_path / "graph.variables"),
        "-f", str(tmp_path / "graph.factors"),
        "-m", str(tmp_path / "graph.meta"),
        "-o", outdir,
        "-i", "2000", "-b", "200", "--n_chains", "4",
        "--n_graph_shards", "2", "--quiet",
    ])
    assert rc == 0
    parsed = results.read_marginals(os.path.join(outdir,
                                                 "inference_result.out.text"))
    exact = oracle.exact_marginals(g)
    errs = [abs(p - exact[vid, 1]) for vid, cat, p in parsed]
    assert max(errs) < 0.015

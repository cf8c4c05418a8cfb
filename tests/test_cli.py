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

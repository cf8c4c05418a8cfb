"""CI-sized KBC-scale pipeline run (the 10^7-variable version is
`make scale-demo`; this drives the identical code path at 0.26M vars)."""
import json

import numpy as np


def test_scale_demo_pipeline(capsys):
    from sampler_tpu.scale_demo import main

    main(["--rows", "512", "--cols", "512", "--sweeps", "2",
          "--graph-axis", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_vars"] == 512 * 512
    assert out["updates_per_s"] > 0
    assert out["mesh"] == {"chains": 2, "graph": 4}
    # banding must engage at this size and the halo must beat all_gather
    assert out["band_w"] > 0
    assert out["halo"] is not None and sum(out["halo"]) < 4 - 1
    # memory budget sanity: chunked compile + narrow dtypes keep the full
    # device image under ~425 B/var for the pairwise benchmark shape
    # (350 pre-round-4; the gradient-kernel streams then the round-5
    # moment coefficients gd_ao/gd_an/gd_ax added ~60 B/var to affine2
    # tiers — deliberate trades for the fused learning path; inference-
    # only runs can strip them, see scale_tpu)
    assert out["memory"]["bytes_per_var"] < 425


def test_memory_budget_fields():
    from sampler_tpu.benchgraphs import big_ising_grid
    from sampler_tpu.compile import compile_graph
    from sampler_tpu.scale_demo import memory_budget

    g, colors = big_ising_grid(64, 64)
    dg, info = compile_graph(g, colors=colors)
    b = memory_budget(dg, info)
    from sampler_tpu.compile import iter_arrays
    assert b["total_bytes"] == sum(a.nbytes for _, a in iter_arrays(dg))
    assert b["bytes_per_var"] > 0 and b["projected_1e8_gb"] > 0

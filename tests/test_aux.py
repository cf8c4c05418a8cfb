"""Checkpoint round-trip + observability unit tests (SURVEY.md §5)."""
import json

import numpy as np

from sampler_tpu import checkpoint, observe


def test_checkpoint_round_trip(tmp_path):
    st = checkpoint.SamplerState(
        values=np.arange(10, dtype=np.int8).reshape(5, 2),
        weights=np.asarray([0.5, -1.25], np.float32),
        rng_key=np.asarray([1, 2], np.uint32),
        counts=np.ones((5, 3), np.int32),
        sweep=42, epoch=7, meta={"graph": "test", "n_chains": 2},
    )
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(st, p)
    back = checkpoint.load(p)
    np.testing.assert_array_equal(back.values, st.values)
    np.testing.assert_array_equal(back.weights, st.weights)
    np.testing.assert_array_equal(back.rng_key, st.rng_key)
    np.testing.assert_array_equal(back.counts, st.counts)
    assert back.sweep == 42 and back.epoch == 7
    assert back.meta["graph"] == "test"


def test_checkpoint_resume_determinism(tmp_path):
    """Resuming from a snapshot must reproduce the uninterrupted run."""
    import jax
    from sampler_tpu import fixtures
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.multichain import init_values_mc, run_sweeps_mc

    g = fixtures.ising_grid(3, 3)
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    key = jax.random.PRNGKey(0)
    v0 = init_values_mc(dgj, key, 4, info)

    # uninterrupted: 6 sweeps under one folded-key schedule
    direct = v0
    for i in range(6):
        direct = run_sweeps_mc(dgj, direct, dgj.w_init,
                               jax.random.fold_in(key, i), 1, False, info)

    # interrupted after 3: snapshot, reload, continue
    half = v0
    for i in range(3):
        half = run_sweeps_mc(dgj, half, dgj.w_init,
                             jax.random.fold_in(key, i), 1, False, info)
    p = str(tmp_path / "c.npz")
    checkpoint.save(checkpoint.SamplerState(
        values=np.asarray(half), weights=np.asarray(dgj.w_init),
        rng_key=np.asarray(jax.random.key_data(key)), sweep=3), p)
    st = checkpoint.load(p)
    resumed = jax.numpy.asarray(st.values)
    rkey = jax.random.wrap_key_data(jax.numpy.asarray(st.rng_key))
    for i in range(st.sweep, 6):
        resumed = run_sweeps_mc(dgj, resumed, dgj.w_init,
                                jax.random.fold_in(rkey, i), 1, False, info)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(resumed))


def test_runlog_jsonl(tmp_path):
    p = str(tmp_path / "run.jsonl")
    log = observe.RunLog(p, quiet=True)
    log.event("epoch", n=1, rate=123.0)
    log.event("done", total=2)
    log.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["kind"] == "epoch" and recs[0]["n"] == 1
    assert recs[1]["kind"] == "done"


def test_stats():
    s = observe.weight_stats(np.asarray([3.0, 4.0]))
    assert abs(s["w_l2"] - 5.0) < 1e-9
    ent = observe.marginal_entropy(np.asarray([[0.5, 0.5]]))
    assert abs(ent - np.log(2)) < 1e-9
    assert observe.throughput(10, 5, 2, 1.0) == 100.0

"""K-candidate fused color step (ops/fused.py affine_cat / fused_cat_draw).

Covers the categorical analog of the boolean fused-affine tests
(test_fused.py): the compile-time (a, b) candidate coefficients reproduce
the general color_logits_mc up to a per-variable constant (the softmax
shift the analysis drops), and the end-to-end draw through the kernel
(interpret mode on CPU) hits oracle-parity marginals.  Reference behavior
replaced: the categorical branch of sample_single_variable (SURVEY.md
§3.2) — softmax over the domain of the per-candidate potentials.
"""
import numpy as np
import jax
import jax.numpy as jnp

from sampler_tpu import oracle
from sampler_tpu import format_spec as fs
from sampler_tpu.benchgraphs import big_potts_grid
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import (color_logits_mc, infer_mc,
                                           learn_mc, prepare_fold)
from sampler_tpu.engine.learn import LearnConfig

FUSED = ("interpret", "interpret")
PLAIN = ("off", "off")


def _potts_evidence_grid(rows=16, cols=16, card=3, n_query=10, seed=0):
    """Potts grid big enough to band, all but n_query vars clamped so the
    exact oracle stays enumerable."""
    g, colors = big_potts_grid(rows, cols, card=card, seed=seed)
    rng = np.random.default_rng(seed)
    query = rng.choice(g.n_vars, n_query, replace=False)
    g.var_role[:] = fs.ROLE_EVIDENCE
    g.var_role[query] = fs.ROLE_QUERY
    g.var_init[:] = rng.integers(0, card, g.n_vars)
    return g, colors, query


def test_affinek_fold_matches_general_logits():
    """Σ_d (av + bv·e)[k==eqo] + kmask == color_logits_mc up to a
    k-independent per-variable shift — the dropped softmax constant."""
    g, colors, _ = _potts_evidence_grid(seed=2, card=4)
    g.w_init[:] = [0.6, -0.35]
    dg, info = compile_graph(g, colors=colors, band_tile=8,
                             band_min_block=1)
    assert info.affinek and not info.affine2
    dgj = to_device(dg)
    w = jnp.asarray(dg.w_init)
    ts, ti = dgj.tiers[0], info.tiers[0]
    K = info.max_card

    folded = prepare_fold(dgj, w, info, ("off", "interpret"))
    av, bv, _ = folded[0]                   # [C, nt, R] row d-major

    rng = np.random.default_rng(0)
    NC = 3
    P = dg.var_card.shape[0]
    values = jnp.asarray(rng.integers(0, 4, (P, NC)) %
                         np.asarray(dg.var_card)[:, None], jnp.int8)

    C = dg.tiers[0].cs_mask.shape[0]        # host view keeps [C, B, D, A]
    TB = ti.band_tb
    D = dg.tiers[0].cs_mask.shape[2]
    for c in range(C):
        gathered = values[np.asarray(dg.tiers[0].bd_nbr[c])]
        #           [nt, D*TB, NC] via global positions (d-major)
        nt = gathered.shape[0]
        R = gathered.shape[1]
        eqn = dgj.tiers[0].bd_eqn[c].reshape(nt, R, 1)
        e = (gathered.astype(jnp.int32) == eqn).astype(jnp.float32)
        contrib = (av[c].reshape(nt, R, 1)
                   + bv[c].reshape(nt, R, 1) * e)   # [nt, R, NC]
        eqo = dgj.tiers[0].bd_eqo[c].reshape(nt, R, 1)
        lcat = []
        for k in range(K):
            mk = jnp.where(eqo == k, contrib, 0.0)
            mk = mk.reshape(nt, D, TB, NC).sum(axis=1)    # [nt, TB, NC]
            lcat.append(mk.reshape(nt * TB, NC))
        lcat = jnp.stack(lcat, axis=1)      # [B, K, NC]
        lcat = lcat + dg.tiers[0].cm_kmask[c][:, :, None]

        lref = color_logits_mc(dgj, ts, ti, values, w, c, info, PLAIN)
        lref = lref + dg.tiers[0].cm_kmask[c][:, :, None]

        # compare after subtracting each variable's k=0 logit: the
        # analysis drops k-independent terms, a per-(b, chain) shift
        dcat = np.asarray(lcat - lcat[:, :1, :])
        dref = np.asarray(lref - lref[:, :1, :])
        card = np.asarray(dg.var_card)[c * info.block_size:
                                       c * info.block_size + lcat.shape[0]]
        kmask = np.arange(K)[None, :, None] < card[:, None, None]
        np.testing.assert_allclose(np.where(kmask, dcat, 0.0),
                                   np.where(kmask, dref, 0.0),
                                   rtol=0, atol=1e-4)


def test_fused_cat_oracle_parity():
    """End-to-end marginals through the K-candidate kernel (interpret)
    match exact enumeration within |Δp| < 0.01 (SURVEY.md §4)."""
    g, colors, query = _potts_evidence_grid(rows=16, cols=16, card=3,
                                            n_query=8, seed=5)
    dg, info = compile_graph(g, colors=colors, band_tile=8,
                             band_min_block=1)
    assert info.affinek
    dgj = to_device(dg)
    marg, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), n_burn=150,
                       n_sweeps=2500, info=info, n_chains=16, modes=FUSED)
    marg = np.asarray(marg)          # infer_mc returns original vid order
    exact = oracle.exact_marginals(g)
    err = np.abs(marg[query] - exact[query]).max()
    assert err < 0.01, f"fused-cat marginal error {err}"
    # the kernel path must actually have run: its RNG stream differs from
    # the XLA draw, so identical marginals would mean a silent fallback
    mplain, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), n_burn=150,
                         n_sweeps=2500, info=info, n_chains=16, modes=PLAIN)
    assert not np.array_equal(marg, np.asarray(mplain))


def test_fused_cat_deterministic_and_mixed_cards():
    """Same key ⇒ bitwise-same marginals; variables with card < K draw
    only valid categories (kmask)."""
    g, colors, query = _potts_evidence_grid(rows=16, cols=16, card=4,
                                            n_query=6, seed=7)
    # mixed cardinalities: demote a third of the variables to card 2
    g.var_card[::3] = 2
    g.var_init[:] = g.var_init % g.var_card
    g.e_eqpred[:] = g.e_eqpred % g.var_card[g.e_vid]
    dg, info = compile_graph(g, colors=colors, band_tile=8,
                             band_min_block=1)
    assert info.affinek
    dgj = to_device(dg)
    m1, v1 = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(3), n_burn=20,
                      n_sweeps=50, info=info, n_chains=4, modes=FUSED)
    m2, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(3), n_burn=20,
                     n_sweeps=50, info=info, n_chains=4, modes=FUSED)
    assert (np.asarray(m1) == np.asarray(m2)).all()
    # card-2 variables never sample categories >= 2
    vals = np.asarray(v1)
    card = np.asarray(dg.var_card)
    assert (vals < card[:, None]).all()


def test_fused_cat_learning_tracks_weights():
    """learn_mc through the kernel: the per-epoch fold refresh follows the
    weight updates (a stale fold would stall learning at w_init)."""
    g, colors, _ = _potts_evidence_grid(rows=16, cols=16, card=3,
                                        n_query=8, seed=11)
    rng = np.random.default_rng(1)
    g.var_init[:] = rng.integers(0, 3, g.n_vars)
    dg, info = compile_graph(g, colors=colors, band_tile=8,
                             band_min_block=1)
    assert info.affinek
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=12, n_sweeps_per_epoch=3, stepsize=0.08,
                      diminish=0.97)
    w, _, _ = learn_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info,
                       n_chains=4, modes=FUSED)
    assert not np.allclose(np.asarray(w), np.asarray(dgj.w_init))
    assert np.isfinite(np.asarray(w)).all()

"""Pallas HMM kernels vs the f64 sequential oracle kernels.

Run in interpreter mode on CPU CI (identical kernel code paths to TPU);
f32 tolerances as in the blocked-linear tests."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from ngsf_hmm_tpu.models.hmm import (
    forward_loglik,
    loglik_value_and_grad,
    posteriors,
)
from ngsf_hmm_tpu.models.hmm_pallas import (
    forward_loglik_pallas,
    loglik_value_and_grad_pallas,
    pick_block_size,
    posteriors_pallas,
    prepare_inputs,
)

RNG = np.random.default_rng(21)


def _case(S, N, br=0):
    gl, freq, dist, F, alpha, e = oracle.random_case(
        RNG, S=S, N=N, chrom_break_every=br
    )
    return (jnp.asarray(e), jnp.asarray(dist), jnp.asarray(F),
            jnp.asarray(alpha))


@pytest.mark.parametrize("S,N,bs,br", [
    (61, 4, 8, 17), (128, 8, 16, 0), (333, 5, 64, 101), (40, 3, 40, 0),
])
def test_pallas_loglik_matches(S, N, bs, br):
    e, dist, F, alpha = _case(S, N, br)
    prep = prepare_inputs(e, dist, bs=bs)
    ll_p = forward_loglik_pallas(F[None], alpha[None], prep)[0]
    ll_s = forward_loglik(F, alpha, e, dist)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_s), rtol=2e-6)


def test_pallas_loglik_candidate_batch():
    """B>1 rows must equal independent single evaluations."""
    e, dist, F, alpha = _case(77, 4, 13)
    prep = prepare_inputs(e, dist, bs=16)
    Fs = jnp.stack([F, F * 0.7, jnp.clip(F * 1.2, 0, 0.99)])
    As = jnp.stack([alpha, alpha * 2.0, alpha * 0.5])
    ll_b = forward_loglik_pallas(Fs, As, prep)
    for k in range(3):
        ll_1 = forward_loglik_pallas(Fs[k][None], As[k][None], prep)[0]
        np.testing.assert_allclose(np.asarray(ll_b[k]), np.asarray(ll_1),
                                   rtol=1e-6)
        ll_s = forward_loglik(Fs[k].astype(jnp.float64),
                              As[k].astype(jnp.float64), e, dist)
        np.testing.assert_allclose(np.asarray(ll_b[k]), np.asarray(ll_s),
                                   rtol=2e-6)


@pytest.mark.parametrize("S,N,bs,br", [(61, 4, 8, 17), (200, 6, 32, 47)])
def test_pallas_value_and_grad_matches(S, N, bs, br):
    e, dist, F, alpha = _case(S, N, br)
    prep = prepare_inputs(e, dist, bs=bs)
    L_p, gF_p, ga_p = loglik_value_and_grad_pallas(F, alpha, prep)
    L_s, gF_s, ga_s = loglik_value_and_grad(F, alpha, e, dist)
    np.testing.assert_allclose(np.asarray(L_p), np.asarray(L_s), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(gF_p), np.asarray(gF_s), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_s), rtol=2e-3)


@pytest.mark.parametrize("S,N,bs,br", [(61, 4, 8, 17), (150, 5, 50, 0)])
def test_pallas_posteriors_match(S, N, bs, br):
    e, dist, F, alpha = _case(S, N, br)
    prep = prepare_inputs(e, dist, bs=bs)
    p_p, llf_p, llb_p = posteriors_pallas(F, alpha, prep)
    p_s, llf_s, llb_s = posteriors(e, dist, F, alpha)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(llf_p), np.asarray(llf_s), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(llb_p), np.asarray(llb_s), rtol=2e-6)


def test_pick_block_size():
    assert pick_block_size(100_000) >= 256
    assert pick_block_size(10) == 10


def test_pallas_em_iteration_matches_log():
    """Full EM iterations in pallas mode track the f64 log-mode
    trajectory (f32 kernel tolerances)."""
    from ngsf_hmm_tpu.models.em import em_iteration, init_state

    # Own RNG: the module-level RNG's state depends on which tests ran
    # before, and this test's tolerances are trajectory- (not kernel-)
    # limited, so the draw must be reproducible in isolation.
    rng = np.random.default_rng(400)
    S, N = 400, 5
    gl, freq, dist, F, alpha, e = oracle.random_case(rng, S=S, N=N,
                                                     chrom_break_every=113)
    gl_j = jnp.asarray(np.transpose(gl, (1, 0, 2)))
    dist_j = jnp.asarray(dist)
    st_log = init_state(gl_j, jnp.asarray(freq), jnp.asarray(F),
                        jnp.asarray(alpha))
    st_pal = st_log
    for _ in range(3):
        st_log, _ = em_iteration(gl_j, dist_j, st_log, block_size=16)
        st_pal, stats = em_iteration(
            gl_j, dist_j, st_pal, numerics="pallas"
        )
    # freq inherits the optimizer-endpoint drift through the posteriors
    # (same PGTOL-bounded divergence as indF below), so its agreement is
    # also trajectory- not kernel-limited after 3 iterations
    np.testing.assert_allclose(
        np.asarray(st_pal.freq), np.asarray(st_log.freq), atol=1e-3
    )
    # indF agreement is bounded by the OPTIMIZER stop tolerance
    # (PGTOL = 1e-3), not kernel accuracy: both modes stop within pgtol
    # of the same flat optimum, so tiny f32 rounding differences between
    # kernel tiers can move the endpoint by O(pgtol). Kernel accuracy
    # itself is pinned at rtol 2e-6 by the dedicated tests above.
    np.testing.assert_allclose(
        np.asarray(st_pal.indF), np.asarray(st_log.indF), atol=3e-3
    )
    # ind_lkl is evaluated AT the diverged endpoints: with indF apart by
    # O(pgtol) and |dll/dindF| up to O(10) near the optimum, ll can move
    # by ~1e-2 absolute (~2e-5 relative at ll ~ -400). 1e-4 keeps margin
    # while still catching any real kernel break (those show at >1e-2).
    np.testing.assert_allclose(
        np.asarray(st_pal.ind_lkl), np.asarray(st_log.ind_lkl), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_pal.p_ibd), np.asarray(st_log.p_ibd), atol=5e-3
    )


def test_run_em_deferred_emissions_match_manual_loop():
    """run_em's fused-mode loop defers the per-iteration e_prob
    materialisation (write-only inside the loop) and rebuilds it at
    exit; the result must equal the undeferred iteration-by-iteration
    trajectory, and checkpoint callbacks must see a LIVE e_prob."""
    from ngsf_hmm_tpu.models.em import (
        EMOptions, em_iteration, init_state, run_em,
    )

    rng = np.random.default_rng(411)
    S, N = 300, 6
    gl, freq, dist, F, alpha, e = oracle.random_case(rng, S=S, N=N)
    gl_j = jnp.asarray(np.transpose(gl, (1, 0, 2)), jnp.float32)
    dist_j = jnp.asarray(dist, jnp.float32)
    st0 = init_state(gl_j, jnp.asarray(freq, jnp.float32),
                     jnp.asarray(F, jnp.float32),
                     jnp.asarray(alpha, jnp.float32))

    seen = {}

    def cb(n_iter, st, bkd):
        seen[n_iter] = np.asarray(st.e_prob)

    opts = EMOptions(numerics="pallas", min_iters=3, max_iters=3,
                     min_epsilon=1e-9)
    res = run_em(gl_j, dist_j, st0, opts, checkpoint_cb=cb)

    # mirror run_em's step exactly (slab threading + warm M-step
    # memory + the pallas est_maf tiles it builds at N < 32) minus the
    # deferral
    from ngsf_hmm_tpu.ops.maf_pallas import prepare_gl_tiles

    tiles = prepare_gl_tiles(jnp.exp(gl_j))
    st, slabs, mem = st0, None, None
    for _ in range(3):
        st, _, slabs, mem = em_iteration(
            gl_j, dist_j, st, numerics="pallas", prep_slabs=slabs,
            gl_tiles=tiles, return_prep=True, opt_memory=mem,
            return_opt=True,
        )

    np.testing.assert_array_equal(np.asarray(res.state.freq),
                                  np.asarray(st.freq))
    np.testing.assert_array_equal(np.asarray(res.state.indF),
                                  np.asarray(st.indF))
    np.testing.assert_allclose(np.asarray(res.state.e_prob),
                               np.asarray(st.e_prob), rtol=2e-6)
    # the checkpointed e_prob at the last iteration is the live one
    np.testing.assert_allclose(seen[max(seen)],
                               np.asarray(res.state.e_prob), rtol=2e-6)


def test_run_em_deferred_posteriors_match_manual_loop():
    """run_em's slab-route loop ALSO defers the per-iteration [S, N]
    p_ibd unpack (the slab est_maf consumes the raw posterior slab, so
    the unpacked posterior is write-only in-loop; round-5) and rebuilds
    it at exit from the final iteration's PRE-update params; the result
    must equal the undeferred trajectory bit-for-bit, and checkpoint
    callbacks must see a LIVE, snapped p_ibd."""
    from ngsf_hmm_tpu.models.em import (
        EMOptions, em_iteration, init_state, run_em,
    )
    from ngsf_hmm_tpu.ops.maf import macro_schedule
    from ngsf_hmm_tpu.ops.maf_pallas import slab_geom_ok

    rng = np.random.default_rng(413)
    S, N = 260, 40  # N >= 32: the slab est_maf route engages
    gl, freq, dist, F, alpha, e = oracle.random_case(rng, S=S, N=N)
    assert macro_schedule(N) is not None and slab_geom_ok(S, N)
    gl_j = jnp.asarray(np.transpose(gl, (1, 0, 2)), jnp.float32)
    dist_j = jnp.asarray(dist, jnp.float32)
    st0 = init_state(gl_j, jnp.asarray(freq, jnp.float32),
                     jnp.asarray(F, jnp.float32),
                     jnp.asarray(alpha, jnp.float32))

    seen = {}

    def cb(n_iter, st, bkd):
        seen[n_iter] = np.asarray(st.p_ibd)

    opts = EMOptions(numerics="pallas", min_iters=3, max_iters=3,
                     min_epsilon=1e-9)
    res = run_em(gl_j, dist_j, st0, opts, checkpoint_cb=cb)

    # undeferred mirror (gl_tiles=None: same slab est_maf route)
    st, slabs, mem = st0, None, None
    for _ in range(3):
        st, _, slabs, mem = em_iteration(
            gl_j, dist_j, st, numerics="pallas", prep_slabs=slabs,
            return_prep=True, opt_memory=mem, return_opt=True,
        )

    np.testing.assert_array_equal(np.asarray(res.state.freq),
                                  np.asarray(st.freq))
    np.testing.assert_array_equal(np.asarray(res.state.indF),
                                  np.asarray(st.indF))
    # the rebuilt p_ibd re-runs the same kernels on the same threaded
    # slabs at the same params; XLA's fusion context (FMA formation)
    # differs between the standalone rebuild program and the fused
    # iteration, so agreement is to 1-2 f32 ulps, not bit-exact
    np.testing.assert_allclose(np.asarray(res.state.p_ibd),
                               np.asarray(st.p_ibd), atol=5e-7)
    np.testing.assert_array_equal(seen[max(seen)],
                                  np.asarray(res.state.p_ibd))
    # snapped (check_interv) values: anything within EPSILON of {0,1}
    # must be exactly 0/1
    p = np.asarray(res.state.p_ibd)
    assert not np.any((p > 0) & (p < 1e-5))
    assert not np.any((p < 1) & (p > 1 - 1e-5))

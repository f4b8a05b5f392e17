"""Wide-N (N = 1000) parity: the BASELINE ladder's individual axis.

Round-4 VERDICT Missing #3 / ask #1: every prior measurement and test ran
at N in {32, 100}; the N axis is where the reference's serial freq M-step
dies (EM.cpp:224-271, gen_func.cpp:984-1005 -- the cross-individual
reduction) and where this engine's wide-N machinery engages: the v2 fold
geometry walks G = N/8 lane groups with static plane slices
(ops/maf_pallas._run_macro_slab), the M-step batches 1000 L-BFGS rows,
and pick_geom2's SLAB_MAF_LANES cap must keep the slab est_maf route
enabled instead of silently falling back to the tiles path (and its
full-size gl copy).

Sites are kept small (CPU CI; pallas runs in interpret mode) -- the
WIDTH is what is under test.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ngsf_hmm_tpu.models.em import EMOptions, em_iteration, init_state, run_em

N_W = 1000
RNG = np.random.default_rng(1000)


def _realistic_gls(rng, S, N, depth_mean=2.0, err=0.01):
    """Poisson-depth binomial-error GLs, LINEAR space, normalised."""
    depth = rng.poisson(depth_mean, size=(S, N))
    tf = rng.uniform(0.05, 0.45, size=S)
    g = (rng.random((S, N)) < tf[:, None]).astype(int) + (
        rng.random((S, N)) < tf[:, None]
    ).astype(int)
    p_der = np.array([err, 0.5, 1 - err])[g]
    der = rng.binomial(depth, p_der)
    k = der[..., None].astype(float)
    n = depth[..., None].astype(float)
    p = np.array([err, 0.5, 1 - err])[None, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        ll = k * np.log(p) + (n - k) * np.log1p(-p)
    ll = np.where(n == 0, 0.0, ll)
    gl = np.exp(ll - ll.max(-1, keepdims=True))
    return gl / gl.sum(-1, keepdims=True)


def _wide_case(S, seed=7):
    rng = np.random.default_rng(seed)
    gl_lin = _realistic_gls(rng, S, N_W)
    dist = rng.uniform(0.001, 0.3, size=S)
    dist[0] = 0.7
    dist[S // 2] = np.inf  # one chromosome break mid-sequence
    freq0 = rng.uniform(0.05, 0.45, S)
    indF0 = rng.uniform(0.05, 0.6, N_W)
    alpha0 = rng.uniform(0.01, 0.2, N_W)
    return gl_lin, dist, freq0, indF0, alpha0


def test_geometry_cap_keeps_slab_route():
    """pick_geom2's SLAB_MAF_LANES cap: at wide N the depth-balancing
    nb_p pick must shrink so the slab est_maf VMEM budget holds (the
    uncapped pick gave C = 32000 at 1M x 1000 and silently disabled the
    route). Also pins that the benched N <= 100 geometries are
    unchanged by the cap."""
    from ngsf_hmm_tpu.models.hmm_pallas import pick_geom2
    from ngsf_hmm_tpu.ops.maf_pallas import slab_geom_ok

    for S, N in ((1_000_000, 1000), (500_000, 1000), (250_000, 1000),
                 (250_000, 500), (10_000_000 // 40, 1000)):
        bs, nbp = pick_geom2(S, N)
        assert slab_geom_ok(S, N, bs, nbp), (S, N, bs, nbp)
    # unchanged small-N geometry (the benched shapes)
    assert pick_geom2(100_000, 32) == (391, 256)
    assert pick_geom2(1_000_000, 100) == (1303, 768)


def test_wide_blocked_matches_scan_em():
    """f64 blocked EM trajectory at 1000 individuals == the sequential
    scan tier (reassociation-level differences only): exercises the
    1000-row batched L-BFGS (per-row ring heads) and the wide est_maf
    through several live M-steps."""
    S = 384
    gl_lin, dist, freq0, indF0, alpha0 = _wide_case(S)
    gl = jnp.asarray(np.log(gl_lin), jnp.float64)
    d = jnp.asarray(dist, jnp.float64)
    st0 = init_state(gl, jnp.asarray(freq0), jnp.asarray(indF0),
                     jnp.asarray(alpha0))
    opts_scan = EMOptions(min_iters=3, max_iters=3, min_epsilon=1e-12)
    opts_blk = EMOptions(min_iters=3, max_iters=3, min_epsilon=1e-12,
                         block_size="auto")
    r_s = run_em(gl, d, st0, opts_scan)
    r_b = run_em(gl, d, st0, opts_blk)
    assert r_s.n_iters == r_b.n_iters == 3
    np.testing.assert_allclose(r_b.tot_lkl, r_s.tot_lkl, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(r_b.state.freq),
                               np.asarray(r_s.state.freq), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_b.state.indF),
                               np.asarray(r_s.state.indF), atol=1e-7)
    np.testing.assert_allclose(np.asarray(r_b.state.alpha),
                               np.asarray(r_s.state.alpha), atol=1e-6)


def test_wide_macro_maf_drift():
    """The macro-stepped est_maf's trajectory drift vs the exact damped
    quirk at N = 1000 stays inside the 1e-4 gate (the N >= 96 schedule;
    larger N sharpens the cross-individual sums, so wide N should sit
    WELL inside)."""
    from ngsf_hmm_tpu.ops.maf import est_maf

    S = 512
    gl_lin, _, _, _, _ = _wide_case(S, seed=11)
    rng = np.random.default_rng(13)
    p = rng.random((S, N_W)) * 0.9
    gl32 = jnp.asarray(gl_lin, jnp.float32)
    p32 = jnp.asarray(p, jnp.float32)
    exact = np.asarray(est_maf(gl32, p32, linear=True))
    macro = np.asarray(est_maf(gl32, p32, linear=True, macro=True))
    drift = float(np.max(np.abs(exact - macro)))
    assert drift <= 1e-4, f"macro drift {drift:.2e} at N={N_W}"


def test_wide_fused_posteriors_interpret():
    """v2 GL-fused posteriors at the N = 1000 fold geometry (G = 125
    lane groups) vs the f64 sequential kernels, interpret mode."""
    from ngsf_hmm_tpu.models import hmm_pallas as hp
    from ngsf_hmm_tpu.models.hmm import posteriors
    from ngsf_hmm_tpu.ops.emissions import calc_emission

    S = 64
    gl_lin, dist, freq0, indF0, alpha0 = _wide_case(S, seed=23)
    gl32 = jnp.asarray(gl_lin, jnp.float32)
    d32 = jnp.asarray(dist, jnp.float32)
    F = jnp.asarray(indF0, jnp.float32)
    a = jnp.asarray(alpha0, jnp.float32)
    prep2 = hp.prepare_gl_inputs(gl32, d32)
    assert prep2["G"] == N_W // 8
    fc = hp.freq_compact(jnp.asarray(freq0, jnp.float32), prep2)
    p_p, llf_p, llb_p = hp.posteriors_fused(F, a, prep2, fc)
    e = calc_emission(jnp.asarray(np.log(gl_lin)),
                      jnp.asarray(freq0)[:, None])
    p_s, llf_s, llb_s = posteriors(e, jnp.asarray(dist),
                                   jnp.asarray(indF0),
                                   jnp.asarray(alpha0))
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(llf_p), np.asarray(llf_s),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(llb_p), np.asarray(llb_s),
                               rtol=2e-6)


def test_wide_slab_est_maf_interpret():
    """The slab est_maf kernel's static G = 125 lane-group walk at
    N = 1000 matches the XLA macro path (the same 2e-5 gate as the
    N <= 100 cases in test_maf.py)."""
    from ngsf_hmm_tpu.models.hmm_pallas import (
        pack_sites2, prepare_gl_inputs,
    )
    from ngsf_hmm_tpu.ops.maf import est_maf, macro_schedule
    from ngsf_hmm_tpu.ops.maf_pallas import est_maf_slab, slab_geom_ok

    S = 64
    gl_lin, _, _, _, _ = _wide_case(S, seed=31)
    rng = np.random.default_rng(33)
    p = rng.random((S, N_W)) * 0.9
    p[5, :] = 1.0  # het-floor row
    gl32 = jnp.asarray(gl_lin, jnp.float32)
    p32 = jnp.asarray(p, jnp.float32)
    assert macro_schedule(N_W) is not None
    assert slab_geom_ok(S, N_W)
    prep2 = prepare_gl_inputs(gl32, jnp.zeros(S))
    p_slab = pack_sites2(p32, prep2)
    want = np.asarray(est_maf(gl32, p32, linear=True, macro=True))
    got = np.asarray(est_maf_slab(prep2, p_slab, macro=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_wide_em_iteration_pallas_route():
    """One full pallas em_iteration at N = 1000 (fused kernels + slab
    est_maf engaged) vs the f64 scan iteration: freq/posterior/lkl
    agreement within the speed-tier envelopes."""
    S = 64
    gl_lin, dist, freq0, indF0, alpha0 = _wide_case(S, seed=41)
    gl64 = jnp.asarray(np.log(gl_lin), jnp.float64)
    d64 = jnp.asarray(dist, jnp.float64)
    st64 = init_state(gl64, jnp.asarray(freq0), jnp.asarray(indF0),
                      jnp.asarray(alpha0))
    st_s, _ = em_iteration(gl64, d64, st64)

    gl32 = jnp.asarray(np.log(gl_lin), jnp.float32)
    d32 = jnp.asarray(dist, jnp.float32)
    st32 = init_state(gl32, jnp.asarray(freq0, jnp.float32),
                      jnp.asarray(indF0, jnp.float32),
                      jnp.asarray(alpha0, jnp.float32))
    st_p, _ = em_iteration(gl32, d32, st32, numerics="pallas")
    np.testing.assert_allclose(np.asarray(st_p.p_ibd),
                               np.asarray(st_s.p_ibd), atol=5e-5)
    np.testing.assert_allclose(np.asarray(st_p.ind_lkl),
                               np.asarray(st_s.ind_lkl), rtol=2e-6)
    # freq: pallas slab macro vs f64 exact damped -- macro drift gate
    np.testing.assert_allclose(np.asarray(st_p.freq),
                               np.asarray(st_s.freq), atol=2e-4)
    # M-step endpoints after a single COLD iteration, f32 pallas vs f64
    # scan, on 64-site-per-individual surfaces: a few percent of rows
    # sit on near-flat likelihoods where the two precisions' line
    # searches legitimately stop at different points (measured: ~2% of
    # 1000 rows beyond 5e-3, max ~0.12). Gate the BULK tightly and cap
    # the flat-surface tail; f64 trajectory equality at N=1000 is
    # pinned by test_wide_blocked_matches_scan_em above.
    d_indF = np.abs(np.asarray(st_p.indF) - np.asarray(st_s.indF))
    assert float(np.median(d_indF)) < 1e-5
    assert (d_indF > 5e-3).mean() < 0.03, \
        f"{(d_indF > 5e-3).sum()} rows beyond 5e-3"

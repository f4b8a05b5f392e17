"""est_maf fixed point vs the per-site oracle (incl. accumulator quirk)."""

import numpy as np
import jax.numpy as jnp

import oracle
from ngsf_hmm_tpu.ops.maf import est_maf


def test_est_maf_matches_oracle():
    rng = np.random.default_rng(11)
    S, N = 23, 9
    gl = np.log(rng.dirichlet(np.ones(3), size=(S, N)))
    indF = rng.uniform(0, 1, size=(S, N))
    # include snapped-to-1 posteriors (the F==1 HWE special case)
    indF[0, :] = 1.0
    indF[1, :] = 0.0
    got = np.asarray(est_maf(jnp.asarray(gl), jnp.asarray(indF)))
    want = np.array([oracle.est_maf(gl[s], indF[s]) for s in range(S)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_est_maf_uniform_prior():
    rng = np.random.default_rng(12)
    S, N = 5, 40
    # concentrated GLs around genotype counts drawn at known maf
    true_maf = 0.3
    geno = rng.binomial(2, true_maf, size=(S, N))
    gl = np.full((S, N, 3), np.log(0.01))
    for s in range(S):
        for i in range(N):
            gl[s, i, geno[s, i]] = np.log(0.98)
    gl -= np.log(np.exp(gl).sum(-1, keepdims=True))
    got = np.asarray(est_maf(jnp.asarray(gl), None))
    assert np.all(np.abs(got - geno.mean(axis=1) / 2) < 0.05)


def test_est_maf_pallas_matches_xla():
    """The VMEM-resident pallas fixed point must reproduce ops/maf.py
    (same damped-accumulator trajectories, per-tile early exit only
    freezes already-frozen lanes)."""
    import jax.numpy as jnp
    import numpy as np

    from ngsf_hmm_tpu.ops.maf import est_maf
    from ngsf_hmm_tpu.ops.maf_pallas import est_maf_pallas, prepare_gl_tiles

    rng = np.random.default_rng(5)
    S, N = 1100, 7  # crosses tile boundaries (TS=512) with a ragged tail
    raw = rng.random((S, N, 3)) + 1e-4
    gl_lin = jnp.asarray(raw / raw.sum(-1, keepdims=True), jnp.float32)
    p_ibd = jnp.asarray(np.clip(rng.random((S, N)), 0.0, 1.0), jnp.float32)

    want = est_maf(gl_lin, p_ibd, linear=True)
    tiles = prepare_gl_tiles(gl_lin)
    got = est_maf_pallas(tiles, p_ibd, S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_est_maf_pallas_het_certain_at_full_ibd():
    """A heterozygote-certain GL at p_ibd == 1 must NOT produce NaN:
    calc_HWE's F==1 het floor (gen_func.cpp:946-956) applies in the
    pallas kernel too (regression: missing floor divided by zero)."""
    import jax.numpy as jnp
    import numpy as np

    from ngsf_hmm_tpu.ops.maf import est_maf
    from ngsf_hmm_tpu.ops.maf_pallas import est_maf_pallas, prepare_gl_tiles

    S, N = 8, 3
    gl_lin = np.full((S, N, 3), 1.0 / 3, np.float32)
    gl_lin[2, 1] = [0.0, 1.0, 0.0]  # het-certain individual
    p_ibd = np.zeros((S, N), np.float32)
    p_ibd[2, :] = 1.0  # fully-IBD site
    gl_j = jnp.asarray(gl_lin)
    p_j = jnp.asarray(p_ibd)

    want = np.asarray(est_maf(gl_j, p_j, linear=True))
    got = np.asarray(est_maf_pallas(prepare_gl_tiles(gl_j), p_j, S))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-6)

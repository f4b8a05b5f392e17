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

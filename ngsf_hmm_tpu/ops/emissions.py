"""Emission probabilities: P(GLs | state) under HWE-with-inbreeding priors.

For state k in {0 = non-IBD, 1 = IBD}, the emission at a site with minor
allele frequency ``maf`` is

    e_k = log sum_g GL[g] * P(g | maf, F=k)

(reference: shared/HMM.cpp:144-154). The full [n_ind, n_sites, 2] emission
tensor is computed in one fused elementwise pass -- the reference's serial
per-site loop (EM.cpp:252-263) disappears.
"""

import jax.numpy as jnp

from ..utils.constants import BIG
from .logsum import logsum3


def log_hwe_by_state(maf):
    """Log genotype priors for both states, [..., 2, 3], from maf [...].

    State 0: HWE (F=0) -> [(1-p)^2, 2p(1-p), p^2]
    State 1: full IBD (F=1) -> [(1-p), 1/BIG, p]  (het floored; see
    calc_HWE's F==1 special case, gen_func.cpp:946-956).
    """
    maf = jnp.asarray(maf)
    p = maf
    one_m = 1.0 - p
    pq = one_m * p
    # F = 0
    g0 = jnp.stack([one_m * one_m, 2.0 * pq, p * p], axis=-1)
    # F = 1: [ (1-p)^2 + pq, het floor, p^2 + pq ]
    g1 = jnp.stack([one_m * one_m + pq, jnp.zeros_like(p), p * p + pq], axis=-1)
    lg0 = jnp.log(g0)
    lg0 = jnp.where(jnp.isneginf(lg0), -BIG, lg0)
    lg1 = jnp.log(g1)
    lg1 = jnp.where(jnp.isneginf(lg1), -BIG, lg1)
    lg1 = lg1.at[..., 1].set(jnp.asarray(-BIG, dtype=lg1.dtype))
    return jnp.stack([lg0, lg1], axis=-2)  # [..., 2, 3]


def calc_emission(gl, maf):
    """Log emissions for both states.

    gl:  [..., 3]  normalised log genotype likelihoods
    maf: broadcastable to gl[..., 0]
    Returns [..., 2] log emissions (state axis last).
    """
    lpri = log_hwe_by_state(maf)  # [..., 2, 3]
    x = gl[..., None, :] + lpri
    return logsum3(x[..., 0], x[..., 1], x[..., 2])


def emission_probs_linear(gl_lin, maf):
    """Linear-space emissions for speed-mode scaled kernels.

    gl_lin: [..., 3] normalised linear-space genotype likelihoods.
    Returns [..., 2] linear emissions: e_k = sum_g gl[g] * P(g|maf, F=k).
    """
    p = jnp.asarray(maf)
    one_m = 1.0 - p
    pq = one_m * p
    het_floor = jnp.asarray(1.0 / BIG, dtype=gl_lin.dtype)
    e0 = (
        gl_lin[..., 0] * (one_m * one_m)
        + gl_lin[..., 1] * (2.0 * pq)
        + gl_lin[..., 2] * (p * p)
    )
    e1 = (
        gl_lin[..., 0] * (one_m * one_m + pq)
        + gl_lin[..., 1] * het_floor
        + gl_lin[..., 2] * (p * p + pq)
    )
    return jnp.stack([e0, e1], axis=-1)

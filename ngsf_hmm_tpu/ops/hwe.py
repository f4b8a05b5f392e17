"""Genotype-prior math: HWE-with-inbreeding priors and posterior normalisation.

Equivalents of the reference's pop-gen scalar kernels, vectorised over
arbitrary leading batch dimensions:

- :func:`calc_hwe`  <-> calc_HWE   (reference: shared/gen_func.cpp:938-957)
- :func:`post_prob` <-> post_prob  (reference: shared/gen_func.cpp:920-932)
- :func:`check_interv` <-> check_interv (reference: shared/gen_func.cpp:55-70)

All log-space values use ``-BIG`` (=-1e15) instead of ``-inf`` exactly as
the reference does (conv_space, gen_func.cpp:123-130), which keeps
``gl + prior`` NaN-free.
"""

import jax.numpy as jnp

from ..utils.constants import BIG, EPSILON
from .logsum import logsum3


def calc_hwe(maf, F, log_scale=True):
    """Genotype frequencies under HWE with inbreeding coefficient ``F``.

    maf, F: broadcastable arrays (linear space). Returns an array with a
    trailing axis of size 3 (genotypes AA, Aa, aa).

    When ``F == 1`` exactly, the heterozygote probability is floored to
    ``1/BIG`` (log: ``-BIG``) rather than 0 so fully-IBD sites keep usable
    posteriors (reference: gen_func.cpp:946-956).
    """
    maf, F = jnp.broadcast_arrays(jnp.asarray(maf), jnp.asarray(F))
    pq = (1.0 - maf) * maf
    g0 = (1.0 - maf) * (1.0 - maf) + pq * F
    g1 = 2.0 * pq - 2.0 * pq * F
    g2 = maf * maf + pq * F
    g = jnp.stack([g0, g1, g2], axis=-1)

    if log_scale:
        lg = jnp.log(g)
        lg = jnp.where(jnp.isneginf(lg), -BIG, lg)
        het_floor = jnp.asarray(-BIG, dtype=lg.dtype)
        lg = lg.at[..., 1].set(jnp.where(F == 1.0, het_floor, lg[..., 1]))
        return lg
    het_floor = jnp.asarray(1.0 / BIG, dtype=g.dtype)
    g = g.at[..., 1].set(jnp.where(F == 1.0, het_floor, g[..., 1]))
    return g


def post_prob(lkl, prior=None):
    """Normalised log posteriors from log-likelihoods and optional log prior.

    ``lkl``/``prior``: [..., 3] log-space. Returns [..., 3] log posteriors
    summing (in linear space) to 1. Matches gen_func.cpp:920-932 including
    the index-order log-sum.
    """
    pp = lkl if prior is None else lkl + prior
    norm = logsum3(pp[..., 0], pp[..., 1], pp[..., 2])
    return pp - norm[..., None]


def check_interv(value):
    """Snap values within EPSILON of {0, 1} to exactly {0, 1}.

    Matches gen_func.cpp:55-70 (NaN check handled by callers; here NaN
    propagates so downstream invariant checks can catch it).
    """
    value = jnp.where(value < EPSILON, 0.0, value)
    value = jnp.where(value > 1.0 - EPSILON, 1.0, value)
    return value


def miss_data(gl):
    """True where a genotype's three log-likelihoods are all (EPSILON-)equal.

    ``gl``: [..., 3]. Matches gen_func.cpp:862-868.
    """
    return (jnp.abs(gl[..., 0] - gl[..., 1]) < EPSILON) & (
        jnp.abs(gl[..., 1] - gl[..., 2]) < EPSILON
    )


def call_geno(gl):
    """Call genotypes from normalised log-probabilities.

    Vectorised equivalent of the reference's default call
    ``call_geno(geno, N_GENO)`` -- log_scale=True, both thresholds 0,
    missing-data mode 0 (reference: gen_func.cpp:886-914 with defaults from
    gen_func.hpp:98): missing sites become uniform ``log(1/3)``, all others
    snap to a one-hot at the highest-probability genotype (ties resolved to
    the lowest index, like array_max_pos).

    ``gl``: [..., 3] log-space, normalised. Returns [..., 3] log-space.
    """
    max_pos = jnp.argmax(gl, axis=-1)
    missing = gl[..., 0] == gl[..., 2]
    # reference: min==max <=> all equal; with normalised inputs comparing
    # extremes via argmax/argmin is equivalent to geno[min]==geno[max]
    missing = missing & (gl[..., 0] == gl[..., 1])

    one_hot = jnp.where(
        jnp.arange(3) == max_pos[..., None],
        0.0,  # log(1)
        -BIG,
    )
    uniform = jnp.full_like(gl, jnp.log(1.0 / 3.0))
    return jnp.where(missing[..., None], uniform, one_hot)

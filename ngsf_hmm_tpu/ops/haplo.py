"""Two-site haplotype-frequency EM and LD-aware emissions.

Equivalents of the reference's experimental LD path (gen_func.cpp:1027-1178,
shared/HMM.cpp:175-236; enabled by --freq_est 2 / --e_prob 2 and warned as
"under development" at parse_args.cpp:213-214).

IMPORTANT parity note: the reference's log-scale inner iteration
``pair_freq_iter_log`` discards its accumulator update (the ``logsum(tmp,
...)`` result at gen_func.cpp:1160 is never assigned), so every haplotype
frequency it returns is NaN after normalisation, and the EM exits after one
iteration (NaN comparisons make eps == 0). Since ``haplo_freq`` is always
invoked with log-scale inputs in the reference, --freq_est 2 writes NaN
frequencies and --e_prob 2 aborts inside forward() on NaN emissions.
``haplo_freq(..., compat=True)`` reproduces that; ``compat=False`` runs the
mathematically-intended linear-space EM (gen_func.cpp:1076-1119).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import EPSILON, ITER_MAX
from .logsum import logsum3

# Haplotype h in {0..3} encodes (site1 allele = h>>1, site2 allele = h&1).
# _G1/_G2 genotype index tables over (k, h) pairs (gen_func.cpp:1073-1074).
_K, _H = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
_G1 = jnp.asarray((_K >> 1 & 1) + (_H >> 1 & 1))  # [4,4]
_G2 = jnp.asarray((_K & 1) + (_H & 1))  # [4,4]


def _one_iter(f, p1, p2):
    """One linear-space EM update of haplotype freqs.

    f: [..., 4]; p1/p2: [..., N, 3] linear-space genotype probs.
    Returns updated f. Vectorised over leading batch dims and individuals.
    """
    # pair likelihood table per individual: L[..., n, k, h]
    l1 = jnp.take(p1, _G1, axis=-1)  # [..., N, 4, 4]
    l2 = jnp.take(p2, _G2, axis=-1)
    fk = f[..., None, :, None]
    fh = f[..., None, None, :]
    joint = fk * fh * l1 * l2  # [..., N, 4, 4]
    denom = jnp.sum(joint, axis=(-1, -2), keepdims=True)  # [..., N, 1, 1]
    # ff[k] = sum_h f_k f_h (L(h,k) + L(k,h)) / denom == sum over row+col
    contrib = (jnp.sum(joint, axis=-1) + jnp.sum(joint, axis=-2)) / denom[..., 0]
    ff = jnp.sum(contrib, axis=-2)  # sum over individuals -> [..., 4]
    n = p1.shape[-2]
    f_new = ff / (2.0 * n)
    return f_new / jnp.sum(f_new, axis=-1, keepdims=True)


def haplo_freq(pp1, pp2, maf1, maf2, compat=True):
    """ML haplotype frequencies between two adjacent sites.

    pp1/pp2: [..., N, 3] genotype posteriors -- LOG space (as the reference
    passes them). maf1/maf2: [...] current MAF estimates (init values).
    Returns hap_freq [..., 4] = (P_BA, P_Ba, P_bA, P_ba).

    compat=True returns NaN (see module docstring). compat=False runs the
    intended EM on exp(pp) until max |delta f| < EPSILON or ITER_MAX.
    """
    maf1 = jnp.asarray(maf1)
    init = jnp.stack(
        [
            (1 - maf1) * (1 - maf2),
            (1 - maf1) * maf2,
            maf1 * (1 - maf2),
            maf1 * maf2,
        ],
        axis=-1,
    )
    if compat:
        return jnp.full_like(init, jnp.nan)

    p1 = jnp.exp(pp1)
    p2 = jnp.exp(pp2)

    def cond(st):
        f, last, it = st
        return jnp.any(jnp.max(jnp.abs(f - last), axis=-1) >= EPSILON) & (it < ITER_MAX)

    def body(st):
        f, _, it = st
        return _one_iter(f, p1, p2), f, it + 1

    f, _, _ = jax.lax.while_loop(
        cond, body, (_one_iter(init, p1, p2), init, jnp.asarray(1))
    )
    return f


def ld_init_freq(gl):
    """Initial freqs for ``--freq e`` under ``--freq_est 2``.

    The reference (parse_args.cpp:316-321) seeds site 1 with est_maf(F=0)
    and every later site with hap[1]+hap[3] from a pair EM over
    (s-1, s) -- seeded Gauss-Seidel style with (freq[s-1], 0.01) and then
    NaN-broken like every other haplo_freq call (gen_func.cpp:1160).
    This corrected init seeds every pair with the plain est_maf freqs
    (Jacobi, so all pairs vectorise) and runs the intended linear-space
    pair EM on the raw GLs, exactly as the reference init passes them.

    gl: [S, N, 3] log GLs. Returns freq [S].
    """
    from .maf import est_maf

    base = est_maf(gl, jnp.zeros(gl.shape[:2], gl.dtype))
    hap = haplo_freq(gl[:-1], gl[1:], base[:-1], base[1:], compat=False)
    return jnp.concatenate([base[:1], hap[:, 1] + hap[:, 3]])


def joint_geno_prob(hap_freq, F):
    """P(g_prev, g_curr | hap freqs, shared IBD state F) as a [..., 3, 3] table.

    Rows g_prev, cols g_curr (shared/HMM.cpp:211-236; only the F_p == F_c
    case exists in the reference).
    """
    h0, h1, h2, h3 = (hap_freq[..., i] for i in range(4))
    z = jnp.zeros_like(h0)
    outbred = jnp.stack(
        [
            jnp.stack([h0 * h0, 2 * h0 * h1, h1 * h1], axis=-1),
            jnp.stack([2 * h0 * h2, 2 * (h0 * h3 + h1 * h2), 2 * h1 * h3], axis=-1),
            jnp.stack([h2 * h2, 2 * h2 * h3, h3 * h3], axis=-1),
        ],
        axis=-2,
    )
    inbred = jnp.stack(
        [
            jnp.stack([h0, z, h1], axis=-1),
            jnp.stack([z, z, z], axis=-1),
            jnp.stack([h2, z, h3], axis=-1),
        ],
        axis=-2,
    )
    F = jnp.asarray(F)
    return jnp.where(F[..., None, None] == 0, outbred, inbred)


def calc_emission_ld(hap_freq, gl_p, gl_c, maf_p, state):
    """LD-conditioned log emission (shared/HMM.cpp:175-207, live branch).

    hap_freq: [..., 4]; gl_p/gl_c: [..., 3] log GLs (prev/curr site);
    maf_p: [...]; state: 0/1. Returns log P(g_c | g_p) under the pair model:
    log sum_{g_p,g_c} P(g_p,g_c) s_p[g_p] s_c[g_c]  -  e(gl_p, maf_p, state).
    """
    from .emissions import calc_emission

    s_p = jnp.exp(gl_p)
    s_c = jnp.exp(gl_c)
    jp = joint_geno_prob(hap_freq, jnp.full(jnp.shape(maf_p), float(state)))
    total = jnp.sum(jp * s_p[..., :, None] * s_c[..., None, :], axis=(-1, -2))
    e_prev = calc_emission(gl_p, maf_p)[..., state]
    return jnp.log(total) - e_prev

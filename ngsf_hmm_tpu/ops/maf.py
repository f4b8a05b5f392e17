"""Minor-allele-frequency M-step: the est_maf fixed point, all sites at once.

The reference runs est_maf serially per site on one thread -- its scaling
bottleneck (EM.cpp:224-271, gen_func.cpp:974-1009). Here the fixed point
runs for EVERY site simultaneously as one masked ``lax.while_loop``;
converged sites freeze, so per-site trajectories equal the serial loops.

Quirk replicated (SURVEY.md §3.6b): the expected-allele-count accumulators
``num``/``den`` are initialised once OUTSIDE the fixed point and keep
accumulating across its iterations (gen_func.cpp:976-1000), damping
updates. ``.indF`` frequencies depend on this.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.constants import EPSILON, ITER_MAX
from .hwe import calc_hwe, post_prob, miss_data


class _MafState(NamedTuple):
    freq: jnp.ndarray  # [S]
    num: jnp.ndarray  # [S]
    den: jnp.ndarray  # [S]
    active: jnp.ndarray  # [S] bool
    passes: jnp.ndarray  # scalar int


def est_maf(gl_s, indF, ignore_miss_data=False, axis_name=None, linear=False):
    """Per-site MAF via the damped EM fixed point.

    gl_s:  [.., N, 3] normalised genotype likelihoods (site-major; any
           leading site shape, e.g. [S] or blocked [bs, nb]). LOG space
           by default; LINEAR space with ``linear=True`` (the speed-mode
           path: the per-pass prior/posterior math is then
           transcendental-free).
    indF:  [.., N] per-individual inbreeding weight at each site (the IBD
           posterior marg_prob[i][s][1] during EM; constants at init), or
           None for a uniform prior (gen_func.cpp:987-989).
    axis_name: mesh axis individuals are sharded over; the expected-allele
           count accumulators are psum'd across it (the ONLY cross-shard
           communication in the whole EM step). Because the psum'd
           freq/active trajectories are identical on every shard, the
           while_loop trip count is too -- no shard can exit the loop
           early and orphan a collective.
    Returns freq [..] (leading site shape).

    The loop-exit test matches the reference's post-increment condition
    ``while(|prev-freq| > EPS && iters++ < 100)``: the body runs at least
    once and at most ITER_MAX+1 times.
    """
    lead = gl_s.shape[:-2]
    N = gl_s.shape[-2]
    dtype = gl_s.dtype

    if ignore_miss_data:
        if linear:
            present = ~(
                (jnp.abs(gl_s[..., 0] - gl_s[..., 1]) < EPSILON)
                & (jnp.abs(gl_s[..., 1] - gl_s[..., 2]) < EPSILON)
            )
        else:
            present = ~miss_data(gl_s)
    else:
        present = jnp.ones(lead + (N,), dtype=bool)

    def _pp_linear(freq, F):
        if indF is None:
            raw = gl_s
        else:
            prior = calc_hwe(freq[..., None], F, log_scale=False)
            raw = gl_s * prior
        return raw / raw.sum(-1, keepdims=True)

    F = jnp.zeros(lead + (N,), dtype=dtype) if indF is None else indF
    w = present.astype(dtype)
    two_m_F = 2.0 - F
    # cd identity: the per-individual posteriors are normalised
    # (pp0+pp1+pp2 == 1), so the reference's denominator accumulator
    # 2*pp1 + (pp0+pp2)*(2-F)  ==  (2-F) + pp1*F  exactly (gen_func.cpp:
    # 997-999 algebra). The (2-F) part does not depend on freq, so its
    # cross-individual sum is hoisted out of the fixed point entirely --
    # one reduction + one multiply per pass instead of the full chain.
    T_w = jnp.sum(w * two_m_F, axis=-1)
    if axis_name is not None:
        T_w = jax.lax.psum(T_w, axis_name)

    def body(st: _MafState) -> _MafState:
        prev = st.freq
        if indF is None:
            pp = _pp_linear(st.freq, F) if linear else jnp.exp(post_prob(gl_s, None))
        elif linear:
            pp = _pp_linear(st.freq, F)
        else:
            prior = calc_hwe(st.freq[..., None], F)  # log
            pp = jnp.exp(post_prob(gl_s, prior))
        cn = jnp.sum(w * (pp[..., 1] + pp[..., 2] * two_m_F), axis=-1)
        cdv = jnp.sum(w * (pp[..., 1] * F), axis=-1)
        if axis_name is not None:
            # one fused collective per pass (tuple psum), not two
            cn, cdv = jax.lax.psum((cn, cdv), axis_name)
        cd = T_w + cdv
        num = jnp.where(st.active, st.num + cn, st.num)
        den = jnp.where(st.active, st.den + cd, st.den)
        freq = jnp.where(st.active, num / den, st.freq)
        passes = st.passes + 1
        active = st.active & (jnp.abs(prev - freq) > EPSILON) & (passes <= ITER_MAX)
        return _MafState(freq, num, den, active, passes)

    init = _MafState(
        freq=jnp.full(lead, 0.01, dtype=dtype),
        num=jnp.zeros(lead, dtype=dtype),
        den=jnp.zeros(lead, dtype=dtype),
        active=jnp.ones(lead, dtype=bool),
        passes=jnp.zeros((), dtype=jnp.int32),
    )
    out = jax.lax.while_loop(lambda st: jnp.any(st.active), body, init)
    return out.freq

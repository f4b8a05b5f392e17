"""Minor-allele-frequency M-step: the est_maf fixed point, all sites at once.

The reference runs est_maf serially per site on one thread -- its scaling
bottleneck (EM.cpp:224-271, gen_func.cpp:974-1009). Here the fixed point
runs for EVERY site simultaneously as one masked ``lax.while_loop``;
converged sites freeze, so per-site trajectories equal the serial loops.

Quirk replicated (SURVEY.md §3.6b): the expected-allele-count accumulators
``num``/``den`` are initialised once OUTSIDE the fixed point and keep
accumulating across its iterations (gen_func.cpp:976-1000), damping
updates. ``.indF`` frequencies depend on this. On realistic low-coverage
GLs the damped 1/k steps never drop below EPSILON, so ~every site runs
all ITER_MAX+1 passes -- making est_maf the flop ceiling of the whole EM
iteration at scale.

Macro-stepping (the speed-mode escape from that ceiling, ``macro=True``):
after ``MACRO_K0`` real passes, each round evaluates the cross-individual
accumulator sums AND their freq-derivatives once (a single jvp: ~2x one
pass), then advances the damped recursion through that round's virtual
window with the per-site linearised model -- scalar site math, no
[.., N] work, no collectives. Windows GROW across rounds (``MACRO_MS``;
macro_schedule docstring) because the damped ~1/k iterate slows down.
The emulated trajectory tracks the exact damped iterate to ~4e-5
(Poisson-2x GLs; 1e-4 gate in tests/test_maf.py) at ~13 instead of 101
full-width pass-equivalents, and on ind-sharded meshes cuts est_maf's
collective count per EM iteration from ~101 psums to a FIXED
K0 + len(MACRO_MS) fused psums.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.constants import EPSILON, ITER_MAX
from .hwe import calc_hwe, post_prob, miss_data

MACRO_K0 = 8  # real full-width passes before linearised macro-stepping
MACRO_MS = (12, 24, 57)  # virtual-window lengths per jvp round


def macro_schedule(n_ind):
    """(K0, M) for ``macro=True``, keyed on the individual count, or None
    (= run exact) below the profitable/safe size. M is a TUPLE of
    virtual-window lengths, one gradient-augmented evaluation per entry.

    The linearisation error scales with the squared per-window freq
    movement, which shrinks BOTH as the cross-individual sums sharpen
    (larger N) and as the damped ~1/k iterate slows down (later
    windows) -- so the windows GROW across rounds: short early windows
    where freq still moves, long late ones where it crawls. Measured
    max drift vs the exact damped iterate on Poisson-2x GLs (1e-4 test
    gate): N >= 96 with (8, (12, 24, 57)): ~4e-5 in HALF the rounds of
    the former fixed (8, 16); 32 <= N < 96 with (16, (8, 16, 32, 29)):
    ~2.7e-5 in 4 rounds instead of the former (16, 8)'s 11. Below 32
    individuals the residual moves too much per window for a fixed
    schedule -- and exact passes are cheap there anyway. Sharded
    callers key on their LOCAL width: the gate is an absolute
    trajectory-error bound, not cross-layout bitwise equality.
    """
    if n_ind < 32:
        return None
    if n_ind < 96:
        return (16, (8, 16, 32, 29))
    return (MACRO_K0, MACRO_MS)


def macro_rounds(K0, M):
    """Normalise a schedule's M spec to the static tuple of virtual-
    window lengths covering the reference's ITER_MAX+1 trip budget.
    An int M (legacy fixed-window spec) expands to repeated windows;
    values beyond the budget are harmless (fully-converged or
    past-ITER_MAX states advance as masked no-ops)."""
    if isinstance(M, (tuple, list)):
        return tuple(int(m) for m in M)
    import math

    n = max(1, -(-(ITER_MAX + 1 - K0) // int(M)))
    return (int(M),) * n


class _MafState(NamedTuple):
    freq: jnp.ndarray  # [S]
    num: jnp.ndarray  # [S]
    den: jnp.ndarray  # [S]
    active: jnp.ndarray  # [S] bool
    passes: jnp.ndarray  # scalar int


def est_maf(gl_s, indF, ignore_miss_data=False, axis_name=None, linear=False,
            macro=False):
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
    macro: speed mode -- emulate the damped trajectory by linearised
           macro-stepping (module docstring) instead of running every
           pass at full width. Requires ``linear=True`` and an explicit
           ``indF``. True resolves (K0, M) via ``macro_schedule(N)``
           (exact below 32 individuals); a (K0, M) tuple overrides.
           Results deviate from the exact damped iterate by ~1e-5 per
           call (compat mode: leave False).
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

    def _local_sums(freq):
        """LOCAL (pre-psum) accumulator contributions at ``freq``."""
        if indF is None:
            pp = (
                _pp_linear(freq, F) if linear
                else jnp.exp(post_prob(gl_s, None))
            )
        elif linear:
            pp = _pp_linear(freq, F)
        else:
            prior = calc_hwe(freq[..., None], F)  # log
            pp = jnp.exp(post_prob(gl_s, prior))
        cn = jnp.sum(w * (pp[..., 1] + pp[..., 2] * two_m_F), axis=-1)
        cdv = jnp.sum(w * (pp[..., 1] * F), axis=-1)
        return cn, cdv

    def _advance(st: _MafState, cn, cd) -> _MafState:
        """One damped update + the reference's post-increment exit test."""
        prev = st.freq
        num = jnp.where(st.active, st.num + cn, st.num)
        den = jnp.where(st.active, st.den + cd, st.den)
        freq = jnp.where(st.active, num / den, st.freq)
        passes = st.passes + 1
        active = (
            st.active
            & (jnp.abs(prev - freq) > EPSILON)
            & (passes <= ITER_MAX)
        )
        return _MafState(freq, num, den, active, passes)

    def body(st: _MafState) -> _MafState:
        cn, cdv = _local_sums(st.freq)
        if axis_name is not None:
            # one fused collective per pass (tuple psum), not two
            cn, cdv = jax.lax.psum((cn, cdv), axis_name)
        return _advance(st, cn, T_w + cdv)

    init = _MafState(
        freq=jnp.full(lead, 0.01, dtype=dtype),
        num=jnp.zeros(lead, dtype=dtype),
        den=jnp.zeros(lead, dtype=dtype),
        active=jnp.ones(lead, dtype=bool),
        passes=jnp.zeros((), dtype=jnp.int32),
    )

    if not macro:
        out = jax.lax.while_loop(lambda st: jnp.any(st.active), body, init)
        return out.freq

    # ---- macro-stepping speed mode (module docstring)
    if not linear or indF is None:
        raise ValueError("est_maf macro mode requires linear=True and indF")
    sched = macro_schedule(N) if macro is True else macro
    if sched is None:
        out = jax.lax.while_loop(lambda st: jnp.any(st.active), body, init)
        return out.freq
    K0, M = sched
    Ms = macro_rounds(K0, M)

    st = jax.lax.while_loop(
        lambda st: jnp.any(st.active) & (st.passes < K0), body, init
    )

    def macro_round(st: _MafState, M_r: int) -> _MafState:
        # one gradient-augmented evaluation (jvp ~ 2x a plain pass) ...
        (cn, cdv), (dcn, dcdv) = jax.jvp(
            _local_sums, (st.freq,), (jnp.ones_like(st.freq),)
        )
        if axis_name is not None:
            cn, cdv, dcn, dcdv = jax.lax.psum(
                (cn, cdv, dcn, dcdv), axis_name
            )
        f0 = st.freq

        # ... then M_r virtual damped passes on the linearised model:
        # per-site scalar math only (and, on meshes, collective-free --
        # every operand here is already replicated across shards)
        def vstep(_, st2: _MafState) -> _MafState:
            df = st2.freq - f0
            return _advance(st2, cn + dcn * df, T_w + cdv + dcdv * df)

        return jax.lax.fori_loop(0, M_r, vstep, st)

    # rounds run unconditionally: a converged (or past-ITER_MAX) state
    # advances as a masked no-op, so the static round list is exactly
    # equivalent to the former any(active) while-loop -- and on meshes
    # it fixes the per-iteration collective count at len(Ms) + K0
    for M_r in Ms:
        st = macro_round(st, M_r)
    return st.freq

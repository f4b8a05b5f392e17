"""``--opt compat``: the reference-trajectory EM engine.

The speed engines (models/em.py tiers) redesign the (F, alpha) M-step
as a batched projected L-BFGS with analytic gradients -- endpoints agree
with the reference only to the shared PGTOL, so estimated-config outputs
match within tolerances, not bytes. This engine instead reproduces the
reference's ENTIRE estimation trajectory operation-for-operation:

 - E-step: the sequential f64 kernels (models/hmm.py, golden tier);
 - (F, alpha) M-step: per-individual L-BFGS-B 2.1 with central-
   difference gradients via models/lbfgsb_ref.py (bit-exact against the
   reference's f2c optimizer, tests/test_opt_compat.py), every
   individual's independent optimizer advanced in lockstep ROUNDS so the
   objective evaluations still run as batched [N] forward scans;
 - freq M-step: est_maf with the reference's EXACT accumulation order
   (sequential over individuals, the unsimplified num/den expressions,
   never-reset damped accumulators -- gen_func.cpp:974-1009);
 - loop control: the shared convergence_loop (EM.cpp:56 gate).

Purpose: byte-identical ``.indF``/``.ibd``/``.geno`` on ESTIMATED golden
configs (the reference prints its total likelihood at %.10f,
EM.cpp:302), not speed -- compat runs are the 10 x 10k golden scale.
"""

import numpy as np
import jax.numpy as jnp

from ..io.native import vexp, vlog
from ..ops.hwe import check_interv
from ..utils.constants import (
    ALPHA_MAX, ALPHA_MIN, BIG, EPSILON, F_MAX, F_MIN, ITER_MAX,
)
from .em import EMOptions, EMResult, EMState
from .hmm import forward_loglik, posteriors, viterbi
from .lbfgsb_ref import RefLBFGSB

# ---------------------------------------------------------------------------
# Exact-order numpy primitives. The shared jnp ops compute the same math
# but through XLA's vectorised f64 exp (1 ulp off glibc on a few percent
# of inputs) and occasionally different association; fine everywhere a
# tolerance gates the result, fatal for %.10f byte parity through the
# est_maf->emission->forward feedback loop. These use glibc exp/log
# (io/native.vexp/vlog) and the reference's operation order.
# ---------------------------------------------------------------------------


def _calc_hwe_log_ref(maf, F):
    """Log genotype priors [..., 3]; maf/F broadcastable. Mirrors
    calc_HWE(log_scale=true) + conv_space (gen_func.cpp:938-957,
    123-130): -inf -> -1e15, then the F==1 het floor."""
    maf, F = np.broadcast_arrays(np.asarray(maf, np.float64),
                                 np.asarray(F, np.float64))
    one_m = 1.0 - maf
    g0 = one_m * one_m + one_m * maf * F
    g1 = 2.0 * one_m * maf - 2.0 * one_m * maf * F
    g2 = maf * maf + one_m * maf * F
    g = np.stack([g0, g1, g2], axis=-1)
    lg = vlog(g)
    lg[np.isneginf(lg)] = -BIG
    lg[..., 1] = np.where(F == 1.0, -BIG, lg[..., 1])
    return lg


def _logsum3_ref(a):
    """logsum over the LAST axis of 3 (gen_func.cpp:135-151): running
    max in index order, then sum of exp(a_i - M) in index order."""
    M = np.maximum(np.maximum(a[..., 0], a[..., 1]), a[..., 2])
    # exp accumulated in index order (i = 0, 1, 2)
    s = vexp(a[..., 0] - M)
    s = s + vexp(a[..., 1] - M)
    s = s + vexp(a[..., 2] - M)
    out = vlog(s) + M
    return np.where(np.isneginf(M), -np.inf, out)


def _post_prob_ref(lkl, prior):
    """Normalised log posteriors (gen_func.cpp:920-932)."""
    pp = lkl + prior
    return pp - _logsum3_ref(pp)[..., None]


def calc_emission_ref(gl, maf):
    """Log emissions [..., 2] by the reference's calc_emission
    (HMM.cpp:144-154): per state, HWE prior then logsum3."""
    out = np.empty(gl.shape[:-1] + (2,), np.float64)
    for k in (0, 1):
        geno = _calc_hwe_log_ref(maf, float(k))
        out[..., k] = _logsum3_ref(gl + geno)
    return out


def _logsum2_ref(a, b):
    """logsum over a 2-vector, gen_func.cpp:135-151 order."""
    M = np.maximum(b, a)  # M = a[0]; M = max(a[1], M)
    out = vlog(vexp(a - M) + vexp(b - M)) + M
    return np.where(np.isneginf(M), -np.inf, out)


def _trans_log_ref(F, alpha, d):
    """Log transition entries [N, 4] (t00, t01, t10, t11) at one site,
    calc_trans's op order (HMM.cpp:130-139): coanc = exp(-alpha*d),
    trans = (1-coanc)*q_l (+ coanc if k == l), log."""
    c = vexp(-alpha * d)
    onem = 1.0 - c
    q0 = 1.0 - F
    q1 = F
    tt = np.stack([onem * q0 + c, onem * q1,
                   onem * q0, onem * q1 + c], axis=-1)
    return vlog(tt)


def forward_ref(e_prob, dist, F, alpha, keep=False):
    """Exact-order forward (HMM.cpp:6-28), vectorised over individuals.

    e_prob [S, N, 2] log; dist [S]; F/alpha [N]. Returns ll [N], or
    (ll, Fw [S+1, N, 2]) with keep=True (Fw[0] = log q)."""
    S, N = e_prob.shape[0], e_prob.shape[1]
    fw0 = vlog(1.0 - F)
    fw1 = vlog(F.copy())
    Fw = np.empty((S + 1, N, 2)) if keep else None
    if keep:
        Fw[0, :, 0] = fw0
        Fw[0, :, 1] = fw1
    for s in range(S):
        lt = _trans_log_ref(F, alpha, dist[s])
        n0 = _logsum2_ref(fw0 + lt[:, 0], fw1 + lt[:, 2]) + e_prob[s, :, 0]
        n1 = _logsum2_ref(fw0 + lt[:, 1], fw1 + lt[:, 3]) + e_prob[s, :, 1]
        fw0, fw1 = n0, n1
        if keep:
            Fw[s + 1, :, 0] = fw0
            Fw[s + 1, :, 1] = fw1
    ll = _logsum2_ref(fw0, fw1)
    return (ll, Fw) if keep else ll


def backward_ref(e_prob, dist, F, alpha):
    """Exact-order backward (HMM.cpp:33-60). Returns (ll_b [N],
    Bw [S+1, N, 2]) with Bw[0] INCLUDING the +log q finalisation."""
    S, N = e_prob.shape[0], e_prob.shape[1]
    Bw = np.empty((S + 1, N, 2))
    Bw[S] = 0.0  # log(1)
    bw0 = np.zeros(N)
    bw1 = np.zeros(N)
    for s in range(S - 1, -1, -1):
        lt = _trans_log_ref(F, alpha, dist[s])
        t0 = _logsum2_ref(lt[:, 0] + e_prob[s, :, 0] + bw0,
                          lt[:, 1] + e_prob[s, :, 1] + bw1)
        t1 = _logsum2_ref(lt[:, 2] + e_prob[s, :, 0] + bw0,
                          lt[:, 3] + e_prob[s, :, 1] + bw1)
        bw0, bw1 = t0, t1
        Bw[s, :, 0] = bw0
        Bw[s, :, 1] = bw1
    Bw[0, :, 0] += vlog(1.0 - F)
    Bw[0, :, 1] += vlog(F.copy())
    ll_b = _logsum2_ref(Bw[0, :, 0], Bw[0, :, 1])
    return ll_b, Bw


def _check_interv_ref(v):
    out = np.where(v < EPSILON, 0.0, v)
    return np.where(out > 1.0 - EPSILON, 1.0, out)


def posteriors_ref(e_prob, dist, F, alpha):
    """(p_ibd [S, N], ll_f, ll_b) -- marg_prob[..,1] by the reference's
    exp(Bw + Fw - ind_lkl) with check_interv (EM.cpp:176-184)."""
    ll_f, Fw = forward_ref(e_prob, dist, F, alpha, keep=True)
    ll_b, Bw = backward_ref(e_prob, dist, F, alpha)
    p = _check_interv_ref(vexp(Bw[1:, :, 1] + Fw[1:, :, 1] - ll_f[None]))
    return p, ll_f, ll_b


def viterbi_ref(e_prob, dist, F, alpha):
    """Exact-order production Viterbi INCLUDING the in-place update
    quirk (HMM.cpp:98-125: state l=1 reads l=0's already-updated score
    at the same site). Returns path [S, N] int8."""
    S, N = e_prob.shape[0], e_prob.shape[1]
    vp0 = vlog(1.0 - F)
    vp1 = vlog(F.copy())
    bp = np.empty((S, N, 2), np.int8)
    for s in range(S):
        lt = _trans_log_ref(F, alpha, dist[s])
        for l in range(2):
            p0 = vp0 + lt[:, 0 * 2 + l]
            p1 = vp1 + lt[:, 1 * 2 + l]
            # C: vmax = -INF; k=0 then k=1, strict improvement
            k_best = (p1 > p0).astype(np.int8)
            vmax = np.where(k_best == 1, p1, p0)
            bp[s, :, l] = k_best
            if l == 0:
                vp0 = vmax + e_prob[s, :, 0]  # in-place: l=1 sees this
            else:
                vp1 = vmax + e_prob[s, :, 1]
    path = np.empty((S, N), np.int8)
    last = (vp1 > vp0).astype(np.int8)  # array_max_pos: strict, ties->0
    path[S - 1] = last
    for s in range(S - 1, 0, -1):
        path[s - 1] = bp[s, np.arange(N), path[s]]
    return path


def est_maf_ref(gl, p_ibd):
    """Per-site MAF by the reference's est_maf, with ITS accumulation
    order: for each damped pass, the expected-count contributions are
    summed over individuals SEQUENTIALLY (i = 0..N-1) using the
    unsimplified expressions
        num += pp1 + pp2*(2-F);  den += 2*pp1 + (pp0+pp2)*(2-F)
    (gen_func.cpp:997-999; the speed tiers use the algebraically equal
    (2-F) + pp1*F form, whose different rounding is fine there but not
    at byte-parity). Vectorised over SITES (per-site trip counts via an
    active mask, like ops/maf.py); never-reset damped accumulators.

    gl: [S, N, 3] log GLs (f64); p_ibd: [S, N] f64. Returns [S] f64.
    """
    S, N = gl.shape[0], gl.shape[1]
    gl = np.asarray(gl, np.float64)
    F = np.asarray(p_ibd, np.float64)
    freq = np.full(S, 0.01)
    num = np.zeros(S)
    den = np.zeros(S)
    active = np.ones(S, bool)
    passes = 0
    while active.any() and passes <= ITER_MAX:
        prev = freq.copy()
        prior = _calc_hwe_log_ref(freq[:, None], F)  # [S, N, 3] log
        pp = vexp(_post_prob_ref(gl, prior))
        for i in range(N):  # sequential += per individual, C's order
            two_m_F = 2.0 - F[:, i]
            num = np.where(
                active, num + (pp[:, i, 1] + pp[:, i, 2] * two_m_F), num
            )
            den = np.where(
                active,
                den + (2.0 * pp[:, i, 1]
                       + (pp[:, i, 0] + pp[:, i, 2]) * two_m_F),
                den,
            )
        freq = np.where(active, num / den, freq)
        passes += 1
        active &= np.abs(prev - freq) > EPSILON
    return freq


def _mstep_compat(e_prob, dist, F, alpha, opts):
    """Per-individual L-BFGS-B 2.1 M-step, optimizers advanced in
    lockstep rounds with batched [N] forward evaluations. Returns
    (F', alpha')."""
    N = F.shape[0]
    lo = np.stack([np.full(N, F_MIN), np.full(N, ALPHA_MIN)], -1)
    hi = np.stack([np.full(N, F_MAX), np.full(N, ALPHA_MAX)], -1)
    if opts.indF_fixed:
        lo[:, 0] = hi[:, 0] = F
    if opts.alpha_fixed:
        lo[:, 1] = hi[:, 1] = alpha

    opt = [RefLBFGSB(np.array([F[i], alpha[i]]), lo[i], hi[i])
           for i in range(N)]
    cur = np.stack([F, alpha], -1)

    guard = 0
    while any(not o.done for o in opt) and guard < 100_000:
        guard += 1
        pts = [o.points() if not o.done else [] for o in opt]
        P = max(len(p) for p in pts)
        Fm = np.tile(cur[:, 0], (P, 1))
        am = np.tile(cur[:, 1], (P, 1))
        for i, p in enumerate(pts):
            for k, xk in enumerate(p):
                Fm[k, i] = xk[0]
                am[k, i] = xk[1]
        lls = np.stack([
            forward_ref(e_prob, dist, Fm[k], am[k]) for k in range(P)
        ])  # [P, N]
        for i, o in enumerate(opt):
            if pts[i]:
                o.supply([-lls[k, i] for k in range(len(pts[i]))])
    return (np.array([o.x[0] for o in opt]),
            np.array([o.x[1] for o in opt]))


def run_em_compat(
    gl, dist, state: EMState, opts: EMOptions,
    log_callback=None, trace=None,
) -> EMResult:
    """Reference-trajectory EM loop (iter_EM order, EM.cpp:139-289).

    Supports freq_est 0/1 with e_prob_calc 1 (the LD paths have no
    meaningful golden behaviour to byte-match; use the standard engine).
    """
    if opts.freq_est not in (0, 1) or opts.e_prob_calc != 1:
        raise NotImplementedError(
            "--opt compat supports freq_est 0/1 with e_prob 1"
        )
    from .driver import convergence_loop

    N = gl.shape[1]
    gl_h = np.asarray(gl, np.float64)
    dist_h = np.asarray(dist, np.float64)

    # the initial emissions must come from the SAME exact-order math as
    # the in-loop recompute (init_output computes them with
    # calc_emission too, parse_args.cpp:370-387); the caller's
    # init_state used the jnp tier, whose last-ulp exp/log rounding is
    # what this engine exists to avoid
    state = state._replace(e_prob=jnp.asarray(calc_emission_ref(
        gl_h, np.asarray(state.freq, np.float64)[:, None]
    )))

    def step(st, active):
        e_prob = np.asarray(st.e_prob, np.float64)
        F = np.asarray(st.indF, np.float64)
        alpha = np.asarray(st.alpha, np.float64)
        p_ibd, ll_f, ll_b = posteriors_ref(e_prob, dist_h, F, alpha)
        fwbw = float(np.max(np.abs(ll_f - ll_b)))
        if not (opts.indF_fixed and opts.alpha_fixed):
            F, alpha = _mstep_compat(e_prob, dist_h, F, alpha, opts)
        if opts.freq_est == 0:
            freq, e_new = st.freq, st.e_prob
        else:
            freq_h = est_maf_ref(gl_h, p_ibd)
            freq = jnp.asarray(freq_h)
            e_new = jnp.asarray(calc_emission_ref(gl_h, freq_h[:, None]))
        st2 = EMState(
            freq=freq, indF=jnp.asarray(F), alpha=jnp.asarray(alpha),
            e_prob=e_new, p_ibd=jnp.asarray(p_ibd), ind_lkl=jnp.asarray(ll_f),
        )
        return st2, ll_f, np.asarray([fwbw])

    state, bk, _ = convergence_loop(
        step, state, opts, n_ind=N, log_callback=log_callback,
        trace=trace, track_history=True,
    )
    # sequential per-individual sum, the reference's accumulation order
    # (numpy's pairwise sum differs above 8 individuals)
    tot = 0.0
    for v in np.asarray(state.ind_lkl, np.float64):
        tot += float(v)
    path = viterbi_ref(
        np.asarray(state.e_prob, np.float64), dist_h,
        np.asarray(state.indF, np.float64),
        np.asarray(state.alpha, np.float64),
    ) if opts.viterbi_compat else np.asarray(viterbi(
        state.e_prob, jnp.asarray(dist_h), state.indF, state.alpha,
        compat=False,
    )[0])
    return EMResult(
        state=state, path=np.asarray(path), tot_lkl=tot,
        n_iters=bk.n_iter, converged=bk.n_iter < opts.max_iters,
        lkl_history=bk.history,
    )

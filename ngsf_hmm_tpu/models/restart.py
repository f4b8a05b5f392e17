"""Multi-restart protocol: the ngsF-HMM.sh replicate loop as a device axis.

The reference wrapper (reference: ngsF-HMM.sh:9,83-116) runs N_REP=20
independent full EM runs with re-rolled seeds and keeps the replicate
with the highest first-line log-likelihood of ``.indF``. Here the
replicates become a leading vmapped axis over ONE device program per
iteration: all restarts advance in lockstep, each with its own
convergence bookkeeping (a replicate that has converged is frozen while
the stragglers finish, exactly as independent runs would converge at
their own pace).

Seeding: the shell wrapper re-rolls ``--seed $RANDOM`` per replicate
(ngsF-HMM.sh:84), which is irreproducible by design; here replicate r
draws its random inits from GslTaus(seed + r) — deterministic and
documented. Replicate 0 reproduces a single run with ``--seed seed``.

On a multi-chip mesh the same protocol shards replicates over the
"restart" mesh axis instead (parallel/sharded_em.py).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..io.gsl_rng import GslTaus
from ..io.init import init_freq, init_indF_alpha
from .em import EMOptions, EMResult, _array_max_pos, em_iteration, init_state
from .hmm import viterbi


def stack_restart_states(gl, n_rep, seed, indF_spec="r", freq_spec="r",
                         alpha_literal=None):
    """Build R independently-seeded initial EM states, stacked on axis 0.

    indF_spec/freq_spec follow the CLI's polymorphic init strings
    (parse_args.cpp:248-363): replicate r resolves any random draws with
    GslTaus(seed + r). Returns an EMState whose fields have a leading
    [R] axis.
    """
    S, N = gl.shape[0], gl.shape[1]
    states = []
    for r in range(n_rep):
        rng = GslTaus(seed + r)
        indF0, alpha0 = init_indF_alpha(indF_spec, N, rng)
        freq0 = init_freq(freq_spec, S, rng, gl=gl)
        if alpha_literal is not None:
            alpha0 = np.full(N, alpha_literal)
        states.append(
            init_state(
                gl,
                jnp.asarray(freq0, gl.dtype),
                jnp.asarray(indF0, gl.dtype),
                jnp.asarray(alpha0, gl.dtype),
            )
        )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@dataclasses.dataclass
class RestartResult:
    best: EMResult
    best_rep: int
    rep_lkl: np.ndarray  # [R] final total log-likelihoods
    rep_iters: np.ndarray  # [R] iterations each replicate ran


def run_em_restarts(gl, dist, states, opts: EMOptions, log_callback=None,
                    checkpoint_cb=None, resume_bookkeeping=None):
    """Run R lockstep EM replicates; return the argmax-likelihood one.

    states: EMState with leading [R] axis (stack_restart_states).
    Selection matches ngsF-HMM.sh:97-99 (highest total log-likelihood).

    checkpoint_cb(n_iter, states, bookkeeping): invoked after every
    lockstep iteration with the stacked states and the host-loop arrays
    ([R]-shaped convergence bookkeeping) needed for an exact resume;
    resume_bookkeeping: such a dict to continue from.
    """
    R = states.indF.shape[0]
    N = gl.shape[1]

    if opts.numerics == "pallas":
        # Pallas kernels don't vmap over the replicate axis; the XLA
        # linear kernels are the replicate-batched speed path.
        opts = dataclasses.replace(opts, numerics="linear",
                                   block_size=opts.block_size or "auto")

    step = jax.vmap(
        lambda st: em_iteration(
            gl,
            dist,
            st,
            freq_est=opts.freq_est,
            e_prob_calc=opts.e_prob_calc,
            indF_fixed=opts.indF_fixed,
            alpha_fixed=opts.alpha_fixed,
            block_size=opts.block_size,
            numerics=opts.numerics,
        )
    )

    n_iter = 0
    prev_tot = np.zeros(R)
    tot = np.zeros(R)
    prev_ind = np.full((R, N), -np.inf)
    max_eps = np.full(R, -np.inf)
    active = np.ones(R, dtype=bool)
    iters_done = np.zeros(R, dtype=np.int64)
    if resume_bookkeeping:
        bk = resume_bookkeeping
        n_iter = int(bk["n_iter"])
        prev_tot = np.asarray(bk["prev_tot"], dtype=np.float64)
        tot = np.asarray(bk["tot"], dtype=np.float64)
        prev_ind = np.asarray(bk["prev_ind"], dtype=np.float64)
        max_eps = np.asarray(bk["max_eps"], dtype=np.float64)
        iters_done = np.asarray(bk["iters_done"], dtype=np.int64)
        if prev_ind.shape != (R, N) or iters_done.shape != (R,):
            raise RuntimeError(
                f"restart checkpoint bookkeeping is {prev_ind.shape}, "
                f"run is {R} replicates x {N} ind"
            )

    def keep(r):
        return (
            prev_tot[r] - tot[r] > opts.min_epsilon
            or max_eps[r] > opts.min_epsilon
            or n_iter < opts.min_iters
        ) and n_iter < opts.max_iters

    if resume_bookkeeping:
        # Re-derive the active set from the restored convergence stats and
        # the CURRENT options (run_em re-evaluates its continuation
        # predicate every loop; storing the baked decision would make a
        # resume with a raised --max_iters / lowered --min_epsilon a no-op)
        active = np.array([keep(r) for r in range(R)], dtype=bool)

    from ..utils.signals import stop_requested

    while active.any() and not stop_requested():
        if log_callback is not None:
            log_callback(n_iter, states, tot)
        n_iter += 1
        new_states, stats = step(states)
        if opts.check_fwbw:
            d = float(np.max(np.asarray(stats.fwbw_maxdiff)[active]))
            if not np.isfinite(d) or d > opts.lkl_check_tol:
                raise RuntimeError(
                    f"Fw and Bw lkl do not match (max diff {d:g})!"
                )
        # freeze converged replicates (their stepped state is discarded,
        # like an independent run that already exited its loop)
        mask = jnp.asarray(active)

        def sel(new, old):
            m = mask.reshape((R,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        states = jax.tree.map(sel, new_states, states)

        ind_lkl = np.asarray(states.ind_lkl)  # [R, N]
        for r in range(R):
            if not active[r]:
                continue
            iters_done[r] = n_iter
            prev_tot[r] = tot[r]
            tot[r] = float(ind_lkl[r].sum())
            with np.errstate(invalid="ignore"):
                eps = (ind_lkl[r] - prev_ind[r]) / np.abs(prev_ind[r])
            max_eps[r] = eps[_array_max_pos(eps)]
            prev_ind[r] = ind_lkl[r]
        for r in range(R):
            if active[r] and not keep(r):
                active[r] = False
        if checkpoint_cb is not None:
            checkpoint_cb(
                n_iter,
                states,
                {
                    "n_iter": n_iter,
                    "prev_tot": prev_tot,
                    "tot": tot,
                    "prev_ind": prev_ind,
                    "max_eps": max_eps,
                    "active": active,
                    "iters_done": iters_done,
                },
            )

    best_rep = int(np.argmax(tot))
    best_state = jax.tree.map(lambda x: x[best_rep], states)
    path, _ = viterbi(
        best_state.e_prob,
        dist,
        best_state.indF,
        best_state.alpha,
        compat=opts.viterbi_compat,
    )
    best = EMResult(
        state=best_state,
        path=np.asarray(path),
        tot_lkl=tot[best_rep],
        n_iters=int(iters_done[best_rep]),
        converged=bool(iters_done[best_rep] < opts.max_iters),
        lkl_history=[],
    )
    return RestartResult(
        best=best,
        best_rep=best_rep,
        rep_lkl=tot.copy(),
        rep_iters=iters_done.copy(),
    )

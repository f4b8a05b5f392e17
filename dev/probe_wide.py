"""Wide-N probe on the real chip: the v2 pipeline at N=1000.

Usage:  PS=250000 PN=1000 PHASE=post|step python -u dev/probe_wide.py
Phases run as separate processes so each stays within a tame cold-
compile budget (Mosaic compiles are cached server-side per
kernel+shape). All chained timing jits take the big arrays as
ARGUMENTS -- a 0-arg closure would bake them into the HLO as constants
and the tunneled compile hangs (CLAUDE.md gotcha).
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

PS = int(os.environ.get("PS", 250_000))
PN = int(os.environ.get("PN", 1000))
PHASE = os.environ.get("PHASE", "post")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ngsf_hmm_tpu.models.em import em_iteration, init_state  # noqa: E402
from ngsf_hmm_tpu.models import hmm_pallas as hp  # noqa: E402


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def say(msg):
    print(msg, flush=True)


def main():
    dev = jax.devices()[0]
    say(f"[probe] {dev.platform}:{dev.device_kind}  S={PS} N={PN} "
        f"phase={PHASE}")
    dt = jnp.float32

    @jax.jit
    def synth(key):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (PS, PN, 3), dt, 1e-6, 1.0)
        e = -jnp.log(u)
        gl = jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))
        step_bp = jax.random.randint(k2, (PS,), 100, 200_000).astype(dt)
        return gl, step_bp / 1e6

    t0 = time.perf_counter()
    gl, dist = synth(jax.random.PRNGKey(5))
    sync(gl[0])
    say(f"[probe] synth {time.perf_counter() - t0:.1f}s")

    bs, nbp = hp.pick_geom2(PS, PN)
    from ngsf_hmm_tpu.ops.maf_pallas import slab_geom_ok

    say(f"[probe] geom bs={bs} nb_p={nbp} "
        f"slab_ok={slab_geom_ok(PS, PN, bs, nbp)}")

    if PHASE == "post":
        t0 = time.perf_counter()
        prep_j = jax.jit(
            lambda g, d: hp.prepare_gl_inputs(jnp.exp(g), d))
        prep2 = dict(prep_j(gl, dist))
        for k in ("S", "N", "bs", "nb", "nb_p", "G", "Np", "C", "bs_pad"):
            prep2[k] = int(np.asarray(prep2[k]))
        sync(prep2["g0"][0])
        say(f"[probe] slabs built {time.perf_counter() - t0:.1f}s")
        fc = hp.freq_compact(jnp.full((PS,), 0.2, dt), prep2)
        F = jnp.full((PN,), 0.2, dt)
        a = jnp.full((PN,), 0.05, dt)
        t0 = time.perf_counter()
        p, llf, llb, p_slab = hp.posteriors_fused(
            F, a, prep2, fc, return_slab=True)
        sync(llf)
        say(f"[probe] posteriors cold {time.perf_counter() - t0:.1f}s")

        ints = {k: prep2[k] for k in
                ("S", "N", "bs", "nb", "nb_p", "G", "Np", "C", "bs_pad")}

        def mk_chain(k):
            def f(g0, g2, dc, fc_, F_, a_):
                p2 = dict(ints, g0=g0, g2=g2, dc=dc)
                s = jnp.float32(0.0)
                for _ in range(k):
                    p_, llf_, llb_, ps_ = hp.posteriors_fused(
                        F_ + 0.0 * s, a_, p2, fc_, return_slab=True)
                    # consume EVERY output (incl. a slice of the slab
                    # and the unpacked [S, N] posterior): XLA DCEs
                    # whole kernels whose outputs are unused inside a
                    # jit -- the loop consumes all of these
                    s = (s + jnp.sum(llf_) + jnp.sum(llb_)
                         + jnp.sum(ps_[0]) + jnp.sum(p_))
                return s
            return jax.jit(f)

        args = (prep2["g0"], prep2["g2"], prep2["dc"], fc, F, a)
        c2, c6 = mk_chain(2), mk_chain(6)
        t0 = time.perf_counter()
        sync(c2(*args))
        say(f"[probe] chain2 compile+run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        sync(c6(*args))
        say(f"[probe] chain6 compile+run {time.perf_counter() - t0:.1f}s")
        for _ in range(2):
            t0 = time.perf_counter()
            sync(c2(*args))
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync(c6(*args))
            t6 = time.perf_counter() - t0
            say(f"[probe] posteriors(+slab) {1e3 * (t6 - t2) / 4:.2f} ms "
                f"(chained 2/6)")

        from ngsf_hmm_tpu.ops.maf_pallas import _run_macro_slab
        from ngsf_hmm_tpu.ops.maf import macro_rounds, macro_schedule

        K0, M = macro_schedule(PN)
        Ms = macro_rounds(K0, M)

        def mk_mchain(k):
            def f(g0, g2, ps):
                s = jnp.float32(0.0)
                for _ in range(k):
                    fcomp = _run_macro_slab(
                        g0, g2, ps * (1.0 + 0.0 * s),
                        ints["C"], ints["nb_p"], ints["G"], ints["bs"],
                        ints["nb"], PS, PN, ints["bs_pad"], K0, Ms,
                    )
                    s = s + jnp.sum(fcomp)
                return s
            return jax.jit(f)

        margs = (prep2["g0"], prep2["g2"], p_slab)
        m2, m6 = mk_mchain(2), mk_mchain(6)
        t0 = time.perf_counter()
        sync(m2(*margs))
        say(f"[probe] maf chain2 compile+run {time.perf_counter() - t0:.1f}s")
        sync(m6(*margs))
        for _ in range(2):
            t0 = time.perf_counter()
            sync(m2(*margs))
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync(m6(*margs))
            t6 = time.perf_counter() - t0
            say(f"[probe] est_maf_slab {1e3 * (t6 - t2) / 4:.2f} ms "
                f"(chained 2/6)")
        return

    if PHASE == "step":
        from ngsf_hmm_tpu.models.em import EMState

        # placeholder e_prob/p_ibd: the fused loop with BOTH defers
        # never reads them (init_state's full [S, N, 2] e_prob build is
        # itself a multi-GB transient at this scale and is dead weight)
        state = EMState(
            freq=jnp.full((PS,), 0.2, dt),
            indF=jnp.full((PN,), 0.2, dt),
            alpha=jnp.full((PN,), 0.05, dt),
            e_prob=jnp.zeros((1, 1, 2), dt),
            p_ibd=jnp.zeros((1, 1), dt),
            ind_lkl=jnp.zeros((PN,), dt),
        )
        holder = {"slabs": None, "opt": None, "opt_iters": None}

        def step(st):
            st2, stats, slabs, opt = em_iteration(
                gl, dist, st, numerics="pallas", gl_tiles=None,
                prep_slabs=holder["slabs"], return_prep=True,
                opt_memory=holder["opt"], return_opt=True,
                defer_emissions=True, defer_posteriors=True,
            )
            holder["slabs"] = slabs
            holder["opt"] = opt
            holder["opt_iters"] = stats.opt_iters
            return st2

        t0 = time.perf_counter()
        state = step(state)
        sync(state.ind_lkl)
        say(f"[probe] first step (cold) {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        state = step(state)
        sync(state.ind_lkl)
        say(f"[probe] second step {time.perf_counter() - t0:.1f}s")
        for reps in (4, 4, 4):
            t0 = time.perf_counter()
            for _ in range(reps):
                state = step(state)
            sync(state.ind_lkl)
            dtw = (time.perf_counter() - t0) / reps
            say(f"[probe] {reps} steps: {dtw * 1e3:.1f} ms/iter "
                f"(incl ~27/reps ms sync bias; opt_iters "
                f"{int(np.asarray(holder['opt_iters']))})")
        cells = PS * PN * 2
        say(f"[probe] cells/iter {cells:.3g}")
        return

    raise SystemExit(f"unknown PHASE {PHASE}")


if __name__ == "__main__":
    main()

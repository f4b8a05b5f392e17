"""Wide-N probe on the real chip: the v2 pipeline at N=1000.

Usage:  PS=250000 PN=1000 PHASE=post python dev/probe_wide.py
Phases (run as separate processes so each stays within a tame cold-
compile budget; Mosaic compiles are cached server-side per kernel+shape):
  post  -- posteriors_fused (+ slab est_maf warm) only
  step  -- full em_iteration steady-state loop (2-length chained timing)
  maf   -- slab est_maf alone (two-length chained)
Prints per-phase ms.
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


def main():
    dev = jax.devices()[0]
    print(f"[probe] {dev.platform}:{dev.device_kind}  S={PS} N={PN}")
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
    print(f"[probe] synth {time.perf_counter() - t0:.1f}s")

    bs, nbp = hp.pick_geom2(PS, PN)
    from ngsf_hmm_tpu.ops.maf_pallas import slab_geom_ok

    print(f"[probe] geom bs={bs} nb_p={nbp} "
          f"slab_ok={slab_geom_ok(PS, PN, bs, nbp)}")

    if PHASE == "post":
        t0 = time.perf_counter()
        prep2 = hp.prepare_gl_inputs(jnp.exp(gl), dist)
        sync(prep2["g0"][0])
        print(f"[probe] slabs built {time.perf_counter() - t0:.1f}s")
        fc = hp.freq_compact(jnp.full((PS,), 0.2, dt), prep2)
        F = jnp.full((PN,), 0.2, dt)
        a = jnp.full((PN,), 0.05, dt)
        t0 = time.perf_counter()
        p, llf, llb, p_slab = hp.posteriors_fused(
            F, a, prep2, fc, return_slab=True)
        sync(llf)
        print(f"[probe] posteriors cold {time.perf_counter() - t0:.1f}s")
        # warm chained: posterior depends on F -> chain via llf sum
        def chain(k):
            Fk, ak = F, a
            s = jnp.float32(0)
            for _ in range(k):
                _, llf_, _, _ = hp.posteriors_fused(
                    Fk, ak, prep2, fc, return_slab=True)
                s = s + jnp.sum(llf_)
                Fk = Fk + 0.0 * s  # serialize
            return s
        c2 = jax.jit(lambda: chain(2)).lower().compile()
        c6 = jax.jit(lambda: chain(6)).lower().compile()
        sync(c2()); sync(c6())
        t0 = time.perf_counter(); sync(c2()); t2 = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(c6()); t6 = time.perf_counter() - t0
        print(f"[probe] posteriors(+slab) {1e3 * (t6 - t2) / 4:.2f} ms "
              f"(chained 2/6)")
        from ngsf_hmm_tpu.ops.maf_pallas import est_maf_slab
        t0 = time.perf_counter()
        f1 = est_maf_slab(prep2, p_slab)
        sync(f1)
        print(f"[probe] est_maf_slab cold {time.perf_counter() - t0:.1f}s")
        def mchain(k):
            fcur = jnp.full((PS,), 0.2, dt)
            for _ in range(k):
                fcur = est_maf_slab(prep2, hp.pack_sites2(
                    jnp.zeros((PS, PN), dt) + fcur[:, None] * 0.0 + 0.5,
                    prep2))
            return jnp.sum(fcur)
        # simpler: time est_maf_slab on the SAME p_slab, chain via freq
        def mchain2(k):
            s = jnp.float32(0)
            for _ in range(k):
                f_ = est_maf_slab(prep2, p_slab)
                s = s + jnp.sum(f_) + 0.0 * s
            return s
        m2 = jax.jit(lambda: mchain2(2)).lower().compile()
        m6 = jax.jit(lambda: mchain2(6)).lower().compile()
        sync(m2()); sync(m6())
        t0 = time.perf_counter(); sync(m2()); t2 = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(m6()); t6 = time.perf_counter() - t0
        print(f"[probe] est_maf_slab {1e3 * (t6 - t2) / 4:.2f} ms "
              f"(chained 2/6; NOTE unchained repeats may elide -- chain "
              f"is via the running sum only, treat as lower bound)")
        return

    if PHASE == "step":
        state = init_state(
            gl, jnp.full((PS,), 0.2, dt), jnp.full((PN,), 0.2, dt),
            jnp.full((PN,), 0.05, dt),
        )
        holder = {"slabs": None, "opt": None, "opt_iters": None}

        def step(st):
            st2, stats, slabs, opt = em_iteration(
                gl, dist, st, numerics="pallas", gl_tiles=None,
                prep_slabs=holder["slabs"], return_prep=True,
                opt_memory=holder["opt"], return_opt=True,
                defer_emissions=True,
            )
            holder["slabs"] = slabs
            holder["opt"] = opt
            holder["opt_iters"] = stats.opt_iters
            return st2

        t0 = time.perf_counter()
        state = step(state)
        sync(state.ind_lkl)
        print(f"[probe] first step (cold) {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        state = step(state)
        sync(state.ind_lkl)
        print(f"[probe] second step {time.perf_counter() - t0:.1f}s")
        for reps in (4, 4, 4):
            t0 = time.perf_counter()
            for _ in range(reps):
                state = step(state)
            sync(state.ind_lkl)
            dtw = (time.perf_counter() - t0) / reps
            print(f"[probe] {reps} steps: {dtw * 1e3:.1f} ms/iter "
                  f"(incl ~27/reps ms sync bias; opt_iters "
                  f"{int(np.asarray(holder['opt_iters']))})")
        cells = PS * PN * 2
        print(f"[probe] cells/iter {cells:.3g}")
        return

    raise SystemExit(f"unknown PHASE {PHASE}")


if __name__ == "__main__":
    main()

"""Dev probe (round-5 VERDICT ask #2): bf16 gl slabs on the real v2
kernels at the 1M x 100 big-leg shape.

Measures, f32 vs bf16 slabs (two-length chained differencing, so the
~27 ms tunnel sync RTT cancels):
  - full fused em_iteration (threaded slabs, warm opt, both defers)
  - posteriors_fused alone (return_slab, no unpack)
  - transfer_grad_fused alone (the M-step's value-and-grad stream)
  - est_maf_slab alone
plus the bf16-vs-f32 numeric drift of one iteration's outputs.

Run: PS=1000000 PN=100 python dev/probe_bf16.py
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

S = int(os.environ.get("PS", 1_000_000))
N = int(os.environ.get("PN", 100))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ngsf_hmm_tpu.models import hmm_pallas as hp  # noqa: E402
from ngsf_hmm_tpu.models.em import EMState, em_iteration  # noqa: E402
from ngsf_hmm_tpu.ops.maf_pallas import est_maf_slab  # noqa: E402

dt = jnp.float32


def sync(x):
    return float(np.asarray(jnp.sum(x)))


@jax.jit
def synth(key):
    u = jax.random.uniform(key, (S, N, 3), dt, 1e-6, 1.0)
    e = -jnp.log(u)
    return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))


def chain_time(make_call, big_args, k_short=2, k_long=6):
    def chain(k):
        def f(*args):
            s = jnp.float32(0.0)
            for _ in range(k):
                o = make_call(s, *args)
                s = s + jnp.sum(o)
            return s
        return jax.jit(f)

    c_s, c_l = chain(k_short), chain(k_long)
    sync(c_s(*big_args))
    sync(c_l(*big_args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(c_s(*big_args))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(c_l(*big_args))
        t_l = time.perf_counter() - t0
        ts.append((t_l - t_s) / (k_long - k_short))
    return float(np.median(ts))


def em_chain_time(step, state0, reps=8):
    """Real EM-iteration chain (threads slabs/opt like bench._make_step)."""
    st = step(step(state0))
    sync(st.ind_lkl)
    t0 = time.perf_counter()
    for _ in range(reps):
        st = step(st)
    sync(st.ind_lkl)
    t_long = time.perf_counter() - t0
    t0 = time.perf_counter()
    st2 = step(st)
    sync(st2.ind_lkl)
    t_one = time.perf_counter() - t0
    # differencing removes the sync RTT: (reps iters + sync) - (1 + sync)
    return (t_long - t_one) / (reps - 1), st


def make_step(gl, dist, bf16):
    holder = {"slabs": None, "opt": None}

    def step(st):
        st2, stats, slabs, opt = em_iteration(
            gl, dist, st, numerics="pallas",
            prep_slabs=holder["slabs"], return_prep=True,
            opt_memory=holder["opt"], return_opt=True,
            defer_emissions=True, defer_posteriors=True, gl_bf16=bf16,
        )
        holder["slabs"] = slabs
        holder["opt"] = opt
        return st2

    return step


def main():
    dev = jax.devices()[0]
    print(f"[bf16] {dev.platform}:{dev.device_kind} S={S} N={N}",
          flush=True)
    gl = synth(jax.random.PRNGKey(2))
    dist = jnp.full((S,), 0.05, dt)

    state0 = EMState(
        freq=jnp.full((S,), 0.2, dt),
        indF=jnp.full((N,), 0.2, dt),
        alpha=jnp.full((N,), 0.05, dt),
        e_prob=jnp.zeros((1, 1, 2), dt),
        p_ibd=jnp.zeros((1, 1), dt),
        ind_lkl=jnp.zeros((N,), dt),
    )

    finals = {}
    for bf16 in (False, True):
        tag = "bf16" if bf16 else "f32 "
        per_iter, st_end = em_chain_time(make_step(gl, dist, bf16), state0)
        finals[bf16] = st_end
        print(f"[bf16] em_iteration {tag}: {per_iter * 1e3:7.2f} ms",
              flush=True)

    f, b = finals[False], finals[True]
    print(f"[bf16] after 11 iters: freq maxdiff "
          f"{float(jnp.max(jnp.abs(f.freq - b.freq))):.2e}  "
          f"F maxdiff {float(jnp.max(jnp.abs(f.indF - b.indF))):.2e}  "
          f"ll maxreldiff "
          f"{float(jnp.max(jnp.abs((f.ind_lkl - b.ind_lkl) / f.ind_lkl))):.2e}",
          flush=True)

    for bf16 in (False, True):
        tag = "bf16" if bf16 else "f32 "
        gdt = jnp.bfloat16 if bf16 else jnp.float32
        # eager build: make_prep2's int fields must stay Python ints
        # (a jitted build returns them as arrays and _rows_for's bool
        # tests fail under later tracing)
        prep2 = hp.prepare_gl_inputs(jnp.exp(gl), dist, gl_dtype=gdt)
        fc = hp.freq_compact(state0.freq, prep2)
        sync(prep2["g0"][0, 0, :8].astype(jnp.float32))

        F0, a0 = state0.indF, state0.alpha

        def post_call(s, g0, g2):
            p2 = dict(prep2, g0=g0 * (1 + 0 * s.astype(gdt)), g2=g2)
            _, lf, _, ps = hp.posteriors_fused(
                F0, a0, p2, fc, return_slab=True, return_p=False)
            return lf + jnp.sum(ps[:1, :1, :8])

        t = chain_time(post_call, (prep2["g0"], prep2["g2"]))
        print(f"[bf16] posteriors {tag}: {t * 1e3:7.2f} ms", flush=True)

        def vag_call(s, g0, g2):
            p2 = dict(prep2, g0=g0 * (1 + 0 * s.astype(gdt)), g2=g2)
            L, gF, ga = hp.loglik_value_and_grad_fused(F0, a0, p2, fc)
            return L + gF + ga

        t = chain_time(vag_call, (prep2["g0"], prep2["g2"]))
        print(f"[bf16] vag        {tag}: {t * 1e3:7.2f} ms", flush=True)

        _, _, _, p_slab = hp.posteriors_fused(
            F0, a0, prep2, fc, return_slab=True, return_p=False)
        sync(p_slab[:1, :1, :8])

        def maf_call(s, g0, g2, ps):
            p2 = dict(prep2, g0=g0, g2=g2)
            return est_maf_slab(p2, ps * (1 + 0 * s))

        t = chain_time(maf_call, (prep2["g0"], prep2["g2"], p_slab))
        print(f"[bf16] est_maf    {tag}: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

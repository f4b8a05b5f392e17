"""Dev probe: v1 (emission slabs) vs v2 (GL-fused) pallas kernels at
1M x 100 on the v5e. Chained two-length timing (sync RTT cancelled).

Run: PS=1000000 PN=100 python dev/probe_v2.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

S = int(os.environ.get("PS", 1_000_000))
N = int(os.environ.get("PN", 100))
REPS = int(os.environ.get("REPS", 12))

import jax
import jax.numpy as jnp

from ngsf_hmm_tpu.models import hmm_pallas as hp
from ngsf_hmm_tpu.models.em import init_state

dt = jnp.float32


@jax.jit
def synth(key):
    u = jax.random.uniform(key, (S, N, 3), dt, 1e-6, 1.0)
    e = -jnp.log(u)
    return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))


gl = synth(jax.random.PRNGKey(0))
dist = jnp.full((S,), 0.05, dt)
freq = jnp.full((S,), 0.2, dt)
F0 = jnp.full((N,), 0.2, dt)
a0 = jnp.full((N,), 0.05, dt)


def sync(x):
    return float(np.asarray(jnp.sum(x)))


# ---- v2 prep (gl slabs, built once per run)
prep2_fn = jax.jit(lambda g, d: hp.prepare_gl_inputs(jnp.exp(g), d))
prep2 = dict(prep2_fn(gl, dist))
for k in ("S", "N", "bs", "nb", "nb_p", "G", "Np", "C", "bs_pad"):
    prep2[k] = int(prep2[k])
fc = jax.jit(lambda f: hp.freq_compact(f, prep2))(freq)
sync(prep2["g0"])
print(f"v2: bs={prep2['bs']} nb={prep2['nb']} nb_p={prep2['nb_p']} "
      f"G={prep2['G']} C={prep2['C']} bs_pad={prep2['bs_pad']}",
      file=sys.stderr, flush=True)

# ---- v1 prep for comparison
state = init_state(gl, freq, F0, a0)
bs1 = hp.pick_block_size(S, N)
prep1 = dict(jax.jit(
    lambda e, d: hp.prepare_inputs(e, d, bs=bs1))(state.e_prob, dist))
for k in ("S", "N", "bs", "nb", "L", "Lp", "C", "R", "bs_pad"):
    prep1[k] = int(prep1[k])
sync(prep1["e0"])


def chain(label, step, consts, x0, k=REPS):
    @partial(jax.jit, static_argnames=("reps",))
    def chained(cs, x, reps):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(cs, c), x)

    def run(reps):
        o = chained(consts, x0, reps)
        sync(o[0])
        t0 = time.perf_counter()
        o = chained(consts, x0, reps)
        sync(o[0])
        return time.perf_counter() - t0

    t_long, t_short = run(3 * k), run(k)
    dtm = (t_long - t_short) / (2 * k) * 1e3
    print(f"{label:46s} {dtm:8.2f} ms", file=sys.stderr, flush=True)


E = 1e-30

# v2 consts: (g0, g2, fc, dc); v1 consts: (e0, e1, d)
c2 = (prep2["g0"], prep2["g2"], fc, prep2["dc"])
c1 = (prep1["e0"], prep1["e1"], prep1["d"])


def p2(cs):
    return dict(prep2, g0=cs[0], g2=cs[1], dc=cs[3])


def p1(cs):
    return dict(prep1, e0=cs[0], e1=cs[1], d=cs[2])


def v2_fwd(cs, c):
    F, a = c
    ll = hp.forward_loglik_fused(F[None], a[None], p2(cs), cs[2])[0]
    z = jnp.sum(ll) * E
    return (F + z, a + z)


def v1_fwd(cs, c):
    F, a = c
    ll = hp.forward_loglik_pallas(F[None], a[None], p1(cs))[0]
    z = jnp.sum(ll) * E
    return (F + z, a + z)


def v2_vag(cs, c):
    F, a = c
    L, gF, ga = hp.loglik_value_and_grad_fused(F, a, p2(cs), cs[2])
    z = jnp.sum(L) * E
    return (F + z + gF * 0.0, a + z + ga * 0.0)


def v1_vag(cs, c):
    F, a = c
    L, gF, ga = hp.loglik_value_and_grad_pallas(F, a, p1(cs))
    z = jnp.sum(L) * E
    return (F + z + gF * 0.0, a + z + ga * 0.0)


def v2_post(cs, c):
    F, a = c
    p, lf, lb = hp.posteriors_fused(F, a, p2(cs), cs[2])
    z = jnp.sum(p) * E + jnp.sum(lf) * E
    return (F + z, a + z)


def v1_post(cs, c):
    F, a = c
    p, lf, lb = hp.posteriors_pallas(F, a, p1(cs))
    z = jnp.sum(p) * E + jnp.sum(lf) * E
    return (F + z, a + z)


x0 = (F0, a0)
ONLY = set(os.environ.get("ONLY", "fwd,vag,post,prep").split(","))
if "fwd" in ONLY:
    chain("v1 forward_loglik", v1_fwd, c1, x0)
    chain("v2 forward_loglik (gl-fused)", v2_fwd, c2, x0)
if "vag" in ONLY:
    chain("v1 value_and_grad", v1_vag, c1, x0)
    chain("v2 value_and_grad (gl-fused)", v2_vag, c2, x0)
if "post" in ONLY:
    chain("v1 posteriors", v1_post, c1, x0)
    chain("v2 posteriors (gl-fused)", v2_post, c2, x0)
if "prep" in ONLY:
    # the per-iteration costs v2 removes: emission + slab relayout
    def v1_slabs(cs, c):
        f, = c
        gl_lin = jnp.exp(cs)
        from ngsf_hmm_tpu.ops.emissions import emission_probs_linear

        e_lin = emission_probs_linear(gl_lin, f[:, None])
        e0, e1 = hp.emission_slabs(e_lin, bs1)
        return (f + jnp.sum(e0) * E + jnp.sum(e1) * E,)

    def v2_fc(cs, c):
        f, = c
        fc_ = hp.freq_compact(f, prep2)
        return (f + jnp.sum(fc_) * E,)

    chain("v1 per-iter emission+slab build", v1_slabs, gl, (freq,), k=6)
    chain("v2 per-iter freq compact build", v2_fc, gl, (freq,), k=6)

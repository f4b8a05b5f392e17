"""Dev tool: per-phase timing of the pallas EM iteration at 1M x 100.

Not part of the package; used to locate roofline gaps (which phase of
the fused iteration is off its bytes-moved bound). Run on TPU:
    PS=1000000 PN=100 python dev/profile_em_phases.py
Data is synthesized ON DEVICE (the tunnel moves ~25MB/s; a 1.2GB
device_put would eat the whole budget).
"""
import os
import sys
import time

import numpy as np

S = int(os.environ.get("PS", 1_000_000))
N = int(os.environ.get("PN", 100))

import jax
import jax.numpy as jnp

from ngsf_hmm_tpu.models import hmm_pallas
from ngsf_hmm_tpu.models.em import em_iteration, init_state
from ngsf_hmm_tpu.models.lbfgsb import lbfgsb_minimize
from ngsf_hmm_tpu.ops.maf_pallas import est_maf_pallas, prepare_gl_tiles
from ngsf_hmm_tpu.ops.emissions import emission_probs_linear

dev = jax.devices()[0]
print("device:", dev.platform, dev.device_kind, file=sys.stderr, flush=True)

dt = jnp.float32


@jax.jit
def synth(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    err = 0.01
    depth = jax.random.poisson(k1, 2.0, (S, N)).astype(dt)
    truth = jax.random.randint(k2, (S, N), 0, 3)
    p_der = jnp.array([err, 0.5, 1 - err], dt)[truth]
    # binomial via normal approx + clip (timing only; any plausible GL works)
    mean = depth * p_der
    sd = jnp.sqrt(jnp.maximum(depth * p_der * (1 - p_der), 1e-6))
    der = jnp.clip(jnp.round(mean + sd * jax.random.normal(k3, (S, N))),
                   0.0, depth)
    k = der[..., None]
    n = depth[..., None]
    p = jnp.array([err, 0.5, 1 - err], dt)[None, None, :]
    ll = k * jnp.log(p) + (n - k) * jnp.log1p(-p)
    ll = jnp.where(n == 0, 0.0, ll)
    gl = ll - jax.scipy.special.logsumexp(ll, axis=-1, keepdims=True)
    step = jax.random.randint(k4, (S,), 100, 200_000).astype(dt)
    dist = step / 1e6  # first-site = absolute coord quirk irrelevant here
    return gl, dist


t0 = time.perf_counter()
gl, dist = synth(jax.random.PRNGKey(0))
state = init_state(gl, jnp.full((S,), 0.2, dt), jnp.full((N,), 0.2, dt),
                   jnp.full((N,), 0.05, dt))
gl_tiles = prepare_gl_tiles(jnp.exp(gl))


def sync(x):
    return float(np.asarray(jnp.sum(x)))


sync(state.e_prob)
print(f"synth+init done in {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)


def tick(label, fn, *args, reps=24):
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    sync(leaves[0])
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    sync(leaves[0])
    dtm = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:35s} {dtm:9.2f} ms   (cold {t_cold:.1f}s)",
          file=sys.stderr, flush=True)
    return out


PHASES = set(os.environ.get("PHASES", "prep,post,maf,em,full,lb").split(","))


def want(p):
    return p in PHASES


bs = hmm_pallas.pick_block_size(S, N)
print("block size:", bs, file=sys.stderr, flush=True)

prep_fn = jax.jit(lambda st: hmm_pallas.prepare_inputs(st.e_prob, dist, bs=bs))
prep = tick("prepare_inputs", prep_fn, state)
prep = dict(prep)
for _k in ("S", "N", "bs", "nb", "L", "Lp", "C", "R", "bs_pad"):
    prep[_k] = int(prep[_k])


def with_slabs(fn):
    # closing over the 400MB slab arrays bakes them into the HLO as
    # constants (the remote compile helper rejects the giant request);
    # pass them as jit args and close over the ints only
    import functools

    jf = jax.jit(lambda e0, e1, d, *a: fn(dict(prep, e0=e0, e1=e1, d=d), *a))
    return functools.partial(jf, prep["e0"], prep["e1"], prep["d"])


post_fn = with_slabs(lambda pr, st: hmm_pallas.posteriors_pallas(
    st.indF, st.alpha, pr))
if want("post"):
    p_raw, ll_f, ll_b = tick("posteriors_pallas", post_fn, state)
else:
    p_raw, ll_f, ll_b = post_fn(state)

p_ibd = jnp.clip(p_raw, 0.0, 1.0)
if want("maf"):
    # gl_tiles must be jit ARGS: closing over them bakes 1.2GB of
    # constants into the HLO and the remote compile request explodes
    # (HTTP 413 / broken pipe from the compile helper)
    maf_fn = jax.jit(lambda t, p: est_maf_pallas(t, p, S))
    freq = tick("est_maf_pallas (exact damped)",
                lambda p: maf_fn(gl_tiles, p), p_ibd)
    maf_m = jax.jit(lambda t, p: est_maf_pallas(t, p, S, macro=True))
    tick("est_maf_pallas (macro)", lambda p: maf_m(gl_tiles, p), p_ibd)
if want("em"):
    # gl as a jit ARG for the same reason as gl_tiles above
    em_fn = jax.jit(
        lambda g, f: jnp.log(emission_probs_linear(jnp.exp(g), f[:, None])))
    tick("emission recompute (incl exp)",
         lambda f: em_fn(gl, f), state.freq)

# em_iteration is itself jitted -- no outer jit (that would bake the
# 1.2GB gl closure into the HLO as a constant)
full = lambda st: em_iteration(gl, dist, st, numerics="pallas",
                               gl_tiles=gl_tiles)[0]
if not want("full"):
    sys.exit(0)
state2 = tick("FULL em_iteration (cold opt)", full, state, reps=6)


def full_threaded(st, slabs, opt):
    return em_iteration(gl, dist, st, numerics="pallas", gl_tiles=gl_tiles,
                        prep_slabs=slabs, return_prep=True,
                        opt_memory=opt, return_opt=True)


_, _, slabs0, opt0 = full_threaded(state, None, None)
hold = {"slabs": tuple(slabs0), "opt": opt0}


def steady(st):
    st2, stats, slabs, opt = full_threaded(st, hold["slabs"], hold["opt"])
    hold["slabs"], hold["opt"] = tuple(slabs), opt
    hold["opt_iters"] = stats.opt_iters
    return st2


state3 = tick("FULL em_iteration (threaded+warm)", steady, state2, reps=6)
print("  steady opt_iters:", int(np.asarray(hold["opt_iters"])),
      file=sys.stderr, flush=True)


if not want("lb"):
    sys.exit(0)
ll_fn = with_slabs(lambda pr, st: hmm_pallas.forward_loglik_pallas(
    st.indF[None], st.alpha[None], pr))
tick("forward_loglik (1 rung)", ll_fn, state)

llm_fn = with_slabs(lambda pr, st: hmm_pallas.forward_loglik_pallas(
    jnp.broadcast_to(st.indF, (8, N)), jnp.broadcast_to(st.alpha, (8, N)),
    pr))
tick("forward_loglik (8 rungs)", llm_fn, state)

vag_fn = with_slabs(lambda pr, st: hmm_pallas.loglik_value_and_grad_pallas(
    st.indF, st.alpha, pr))
tick("value_and_grad (2 launches)", vag_fn, state)


def lbfgs_phase(pr, st):
    x0 = jnp.stack([st.indF, st.alpha], axis=-1)
    lo = jnp.full_like(x0, 1e-15)
    hi = jnp.stack([jnp.full((N,), 1 - 1e-15, dt),
                    jnp.full((N,), 10.0, dt)], axis=-1)

    def objective(x):
        ll = hmm_pallas.forward_loglik_pallas(x[None, :, 0], x[None, :, 1], pr)[0]
        return -ll

    def objective_multi(xs):
        return -hmm_pallas.forward_loglik_pallas(xs[..., 0], xs[..., 1], pr)

    def objective_vag(x):
        L, gF, ga = hmm_pallas.loglik_value_and_grad_pallas(x[:, 0], x[:, 1], pr)
        return -L, -jnp.stack([gF, ga], axis=-1)

    x_opt, _, it = lbfgsb_minimize(objective, x0, lo, hi,
                                   value_and_grad=objective_vag,
                                   fun_multi=objective_multi)
    return x_opt, it


lb_fn = with_slabs(lbfgs_phase)
xo, it = tick("lbfgs M-step", lb_fn, state, reps=4)
print("  opt_iters:", int(it), file=sys.stderr, flush=True)

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
    """Time fn(*args) by LOOP-CHAINING it inside the caller-provided fn
    when it is already self-threading, else by queued reps. Two chain
    lengths are differenced so the ~27ms scalar-sync RTT cancels; a
    single (total/reps) smears the RTT over the reps (+27/reps ms --
    the round-3 phase table carried that bias). Queued independent
    calls are additionally unreliable on this backend: results whose
    buffers are dropped before the sync can be elided entirely (see
    dev/probe_kernel_flops.py), so fns timed here must THREAD their
    output into the next call's input when possible."""
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    sync(leaves[0])
    t_cold = time.perf_counter() - t0

    def run(k):
        t0 = time.perf_counter()
        o = out
        for _ in range(k):
            o = fn(*args)
        sync(jax.tree_util.tree_leaves(o)[0])
        return time.perf_counter() - t0

    t_long, t_short = run(reps), run(max(reps // 3, 1))
    dtm = (t_long - t_short) / (reps - max(reps // 3, 1)) * 1e3
    print(f"{label:35s} {dtm:9.2f} ms   (cold {t_cold:.1f}s)",
          file=sys.stderr, flush=True)
    return out


def chain_tick(label, step, consts, x0, reps=24):
    """step: (consts, x) -> x (same pytree structure as x0), jitted and
    fori-chained at two lengths; the difference cancels sync RTT and
    dispatch, and the data dependency defeats queue elision. `consts`
    holds the big loop-invariant arrays (slabs, gl) -- they must be jit
    ARGS, not closure captures (captures bake into the HLO as constants
    and the tunneled compile request explodes)."""
    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def chained(cs, x, k):
        return jax.lax.fori_loop(0, k, lambda i, c: step(cs, c), x)

    def run(k):
        o = chained(consts, x0, k)
        sync(jax.tree_util.tree_leaves(o)[0])
        t0 = time.perf_counter()
        o = chained(consts, x0, k)
        sync(jax.tree_util.tree_leaves(o)[0])
        return time.perf_counter() - t0

    t_long, t_short = run(reps), run(max(reps // 3, 1))
    dtm = (t_long - t_short) / (reps - max(reps // 3, 1)) * 1e3
    print(f"{label:35s} {dtm:9.2f} ms", file=sys.stderr, flush=True)
    return dtm


PHASES = set(os.environ.get(
    "PHASES", "prep,post,maf,em,v2,full,lb").split(","))


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


slab_consts = (prep["e0"], prep["e1"], prep["d"])
EPSI = 1e-30


def _with(pr_consts):
    e0, e1, d = pr_consts
    return dict(prep, e0=e0, e1=e1, d=d)


post_fn = with_slabs(lambda pr, st: hmm_pallas.posteriors_pallas(
    st.indF, st.alpha, pr))
p_raw, ll_f, ll_b = post_fn(state)
if want("post"):
    def post_step(cs, c):
        F, a = c
        p, lf, lb = hmm_pallas.posteriors_pallas(F, a, _with(cs))
        z = jnp.sum(p) * EPSI + jnp.sum(lf) * EPSI
        return (F + z, a + z)

    chain_tick("posteriors_pallas", post_step, slab_consts,
               (state.indF, state.alpha))

p_ibd = jnp.clip(p_raw, 0.0, 1.0)
if want("maf"):
    # gl_tiles must be jit ARGS: closing over them bakes 1.2GB of
    # constants into the HLO and the remote compile request explodes
    # (HTTP 413 / broken pipe from the compile helper).
    # NOTE: the chain perturbation (p + z) adds one [S, N] write+read
    # (~1 ms at this shape) to each rep -- a small overcount.
    def maf_step(macro):
        def step(cs, p):
            freq = est_maf_pallas(cs, p, S, macro=macro)
            return p + jnp.sum(freq) * EPSI

        return step

    freq = jax.jit(lambda t, p: est_maf_pallas(t, p, S))(gl_tiles, p_ibd)
    chain_tick("est_maf_pallas (exact damped)", maf_step(False),
               gl_tiles, p_ibd, reps=12)
    chain_tick("est_maf_pallas (macro)", maf_step(True),
               gl_tiles, p_ibd, reps=12)
if want("em"):
    def em_step(cs, f):
        e = jnp.log(emission_probs_linear(jnp.exp(cs), f[:, None]))
        return f + jnp.sum(e) * EPSI

    chain_tick("emission recompute (incl exp)", em_step, gl, state.freq)

if want("v2"):
    # ---- v2 gl-layout pipeline (the SHIPPED speed path: gl slabs as
    # run constants, in-kernel emissions, slab est_maf, bw-ratio
    # posterior stream)
    from ngsf_hmm_tpu.models.hmm_pallas import pack_sites2
    from ngsf_hmm_tpu.ops.maf_pallas import est_maf_slab

    prep2 = hmm_pallas.prepare_gl_inputs(jnp.exp(gl), dist)
    meta2 = {k: prep2[k] for k in
             ("S", "N", "bs", "nb", "nb_p", "G", "Np", "C", "bs_pad")}
    g0g2 = (prep2["g0"], prep2["g2"], prep2["dc"])

    def _with2(cs):
        g0, g2, dc = cs
        return dict(meta2, g0=g0, g2=g2, dc=dc)

    fc0 = hmm_pallas.freq_compact(state.freq, prep2)

    def post2_step(cs, c):
        F, a, fc = c
        p2, lf, lb = hmm_pallas.posteriors_fused(F, a, _with2(cs), fc)
        z = jnp.sum(lf) * EPSI + jnp.sum(p2) * EPSI
        return (F + z, a + z, fc + z)

    chain_tick("posteriors_fused (v2, 3 launches)", post2_step, g0g2,
               (state.indF, state.alpha, fc0))

    # meta2-only closure: ints, no array baking
    p_slab0 = jax.jit(lambda p: pack_sites2(p, meta2))(p_ibd)

    def maf2_step(cs, p):
        f = est_maf_slab(_with2(cs), p)
        return p + jnp.sum(f) * EPSI

    chain_tick("est_maf_slab (v2 macro)", maf2_step, g0g2, p_slab0,
               reps=12)

    def vag2_step(cs, c):
        F, a, fc = c
        L, gF, ga = hmm_pallas.loglik_value_and_grad_fused(
            F, a, _with2(cs), fc)
        z = jnp.sum(L) * EPSI
        return (F + z + gF * 0.0, a + z + ga * 0.0, fc + z)

    chain_tick("value_and_grad_fused (v2)", vag2_step, g0g2,
               (state.indF, state.alpha, fc0))

# em_iteration is itself jitted -- no outer jit (that would bake the
# 1.2GB gl closure into the HLO as a constant)
full = lambda st: em_iteration(gl, dist, st, numerics="pallas",
                               gl_tiles=gl_tiles)[0]
if not want("full"):
    sys.exit(0)
state2 = tick("FULL em_iteration (cold opt)", full, state, reps=6)


def full_threaded(st, slabs, opt):
    # defer_emissions + defer_posteriors as run_em's loop does (e_prob
    # and, on the slab route, the unpacked p_ibd are write-only in-loop)
    return em_iteration(gl, dist, st, numerics="pallas", gl_tiles=gl_tiles,
                        prep_slabs=slabs, return_prep=True,
                        opt_memory=opt, return_opt=True,
                        defer_emissions=True, defer_posteriors=True)


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


def ll_step(cs, c):
    F, a = c
    ll = hmm_pallas.forward_loglik_pallas(F[None], a[None], _with(cs))[0]
    z = jnp.sum(ll) * EPSI
    return (F + z, a + z)


chain_tick("forward_loglik (1 rung)", ll_step, slab_consts,
           (state.indF, state.alpha))


def llm_step(cs, c):
    F, a = c
    ll = hmm_pallas.forward_loglik_pallas(
        jnp.broadcast_to(F, (8, N)), jnp.broadcast_to(a, (8, N)), _with(cs))
    z = jnp.sum(ll) * EPSI
    return (F + z, a + z)


chain_tick("forward_loglik (8 rungs)", llm_step, slab_consts,
           (state.indF, state.alpha))


def vag_step(cs, c):
    F, a = c
    L, gF, ga = hmm_pallas.loglik_value_and_grad_pallas(F, a, _with(cs))
    z = jnp.sum(L) * EPSI
    return (F + z + gF * 0.0, a + z + ga * 0.0)


chain_tick("value_and_grad (2 launches)", vag_step, slab_consts,
           (state.indF, state.alpha))


def lb_step(cs, c):
    F, a = c
    pr = _with(cs)
    x0 = jnp.stack([F, a], axis=-1)
    lo = jnp.full_like(x0, 1e-15)
    hi = jnp.stack([jnp.full((N,), 1 - 1e-15, dt),
                    jnp.full((N,), 10.0, dt)], axis=-1)

    def objective(x):
        return -hmm_pallas.forward_loglik_pallas(
            x[None, :, 0], x[None, :, 1], pr)[0]

    def objective_multi(xs):
        return -hmm_pallas.forward_loglik_pallas(xs[..., 0], xs[..., 1], pr)

    def objective_vag(x):
        L, gF, ga = hmm_pallas.loglik_value_and_grad_pallas(
            x[:, 0], x[:, 1], pr)
        return -L, -jnp.stack([gF, ga], axis=-1)

    x_opt, _, it = lbfgsb_minimize(objective, x0, lo, hi,
                                   value_and_grad=objective_vag,
                                   fun_multi=objective_multi)
    # chain through the OPTIMUM, perturbed so the next cold solve starts
    # off-optimum (otherwise rep 2+ would measure a 1-probe no-op solve)
    return (jnp.clip(x_opt[:, 0] * 1.01, 1e-6, 1 - 1e-6),
            jnp.clip(x_opt[:, 1] * 0.99, 1e-6, 10.0))


chain_tick("lbfgs M-step (cold, near-opt start)", lb_step, slab_consts,
           (state.indF, state.alpha), reps=6)

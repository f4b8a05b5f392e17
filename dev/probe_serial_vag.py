"""Dev probe: why does one L-BFGS outer iteration cost ~50-70ms at
1M x 100 when a standalone value-and-grad pass is ~7ms?

Hypotheses:
  (a) serial-dependency latency: 24 queued INDEPENDENT vag calls
      pipeline, hiding a much larger per-call latency; a serial chain
      (each call consuming the previous result, as a line search must)
      exposes it.
  (b) L-BFGS loop-body overhead: two-loop recursion / masking ops.
Run: PS=1000000 PN=100 python dev/probe_serial_vag.py
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
from ngsf_hmm_tpu.models.em import init_state
from ngsf_hmm_tpu.models.lbfgsb import lbfgsb_minimize

dt = jnp.float32


@jax.jit
def synth(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    err = 0.01
    depth = jax.random.poisson(k1, 2.0, (S, N)).astype(dt)
    truth = jax.random.randint(k2, (S, N), 0, 3)
    p_der = jnp.array([err, 0.5, 1 - err], dt)[truth]
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
    return gl, jax.random.randint(k4, (S,), 100, 200_000).astype(dt) / 1e6


def sync(x):
    return float(np.asarray(jnp.sum(x)))


gl, dist = synth(jax.random.PRNGKey(0))
state = init_state(gl, jnp.full((S,), 0.2, dt), jnp.full((N,), 0.2, dt),
                   jnp.full((N,), 0.05, dt))
bs = hmm_pallas.pick_block_size(S, N)
prep_fn = jax.jit(lambda e, d: hmm_pallas.prepare_inputs(e, d, bs=bs))
prep = dict(prep_fn(state.e_prob, dist))
for _k in ("S", "N", "bs", "nb", "L", "Lp", "C", "R", "bs_pad"):
    prep[_k] = int(prep[_k])
sync(prep["e0"])


def tick(label, fn, *args, reps=8):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    dtm = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:42s} {dtm:9.2f} ms", file=sys.stderr, flush=True)


import functools


def with_slabs(fn):
    jf = jax.jit(lambda e0, e1, d, *a: fn(dict(prep, e0=e0, e1=e1, d=d), *a))
    return functools.partial(jf, prep["e0"], prep["e1"], prep["d"])


x0 = jnp.stack([state.indF, state.alpha], axis=-1)

# one independent vag (pipelined baseline)
vag1 = with_slabs(lambda pr, x: hmm_pallas.loglik_value_and_grad_pallas(
    x[:, 0], x[:, 1], pr))
tick("vag x1 (independent, pipelined)", vag1, x0, reps=24)


# serial chain of K vag calls: x <- x - eps * g  (forces one-at-a-time)
def serial(pr, x, k):
    def body(i, x):
        L, gF, ga = hmm_pallas.loglik_value_and_grad_pallas(
            x[:, 0], x[:, 1], pr
        )
        g = jnp.stack([gF, ga], axis=-1)
        return x - 1e-6 * g

    return jax.lax.fori_loop(0, k, body, x)


for k in (1, 2, 5, 10):
    fn = with_slabs(functools.partial(serial, k=k))
    tick(f"vag serial chain x{k}", fn, x0, reps=4)


# the actual L-BFGS M-step at several max_iters (slope = per-outer cost)
def mstep(pr, x, iters):
    lo = jnp.full_like(x, 1e-15)
    hi = jnp.stack([jnp.full((N,), 1 - 1e-15, dt),
                    jnp.full((N,), 10.0, dt)], axis=-1)

    def ovag(x):
        L, gF, ga = hmm_pallas.loglik_value_and_grad_pallas(
            x[:, 0], x[:, 1], pr
        )
        return -L, -jnp.stack([gF, ga], axis=-1)

    xo, _, it = lbfgsb_minimize(None, x, lo, hi, value_and_grad=ovag,
                                max_iters=iters)
    return xo, it


for iters in (1, 2, 5, 10):
    fn = with_slabs(functools.partial(mstep, iters=iters))
    tick(f"lbfgs max_iters={iters}", fn, x0, reps=4)

"""Dev probe: count value-and-grad evaluations per L-BFGS M-step at
1M x 100 by driving the HOST backend (same algorithm) with the jitted
TPU objective. Prints evals/iters for cold and warm starts.
Run: PS=1000000 PN=100 python dev/probe_ls_evals.py
"""
import os
import sys

import numpy as np

S = int(os.environ.get("PS", 1_000_000))
N = int(os.environ.get("PN", 100))

import jax
import jax.numpy as jnp

from ngsf_hmm_tpu.models import hmm_pallas
from ngsf_hmm_tpu.models.em import init_state
from ngsf_hmm_tpu.models.lbfgsb import lbfgsb_minimize_host

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


gl, dist = synth(jax.random.PRNGKey(0))
state = init_state(gl, jnp.full((S,), 0.2, dt), jnp.full((N,), 0.2, dt),
                   jnp.full((N,), 0.05, dt))
bs = hmm_pallas.pick_block_size(S, N)
prep_fn = jax.jit(lambda e, d: hmm_pallas.prepare_inputs(e, d, bs=bs))
prep = dict(prep_fn(state.e_prob, dist))
for _k in ("S", "N", "bs", "nb", "L", "Lp", "C", "R", "bs_pad"):
    prep[_k] = int(prep[_k])

_vag_j = jax.jit(lambda e0, e1, d, x: hmm_pallas.loglik_value_and_grad_pallas(
    x[:, 0], x[:, 1], dict(prep, e0=e0, e1=e1, d=d)))
vag_d = lambda x: _vag_j(prep["e0"], prep["e1"], prep["d"], x)

count = {"n": 0}


def vag(x):
    count["n"] += 1
    L, gF, ga = vag_d(jnp.asarray(x, dt))
    return (-np.asarray(L, np.float64),
            -np.stack([np.asarray(gF, np.float64),
                       np.asarray(ga, np.float64)], -1))


x0 = np.stack([np.full(N, 0.2), np.full(N, 0.05)], -1)
lo = np.full((N, 2), 1e-15)
hi = np.stack([np.full(N, 1 - 1e-15), np.full(N, 10.0)], -1)

x1, f1, it1, mem = lbfgsb_minimize_host(
    None, x0, lo, hi, value_and_grad=vag, return_memory=True
)
print(f"cold: outer iters {int(it1)}, vag evals {count['n']}",
      file=sys.stderr, flush=True)

# "next EM iteration": perturb the objective a little by perturbing x0
count["n"] = 0
x2, f2, it2, _ = lbfgsb_minimize_host(
    None, x1, lo, hi, value_and_grad=vag, warm=mem, return_memory=True
)
print(f"warm re-solve: outer iters {int(it2)}, vag evals {count['n']}",
      file=sys.stderr, flush=True)

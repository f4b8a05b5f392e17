"""Dev probe: decompose the ~6.6 ms SERIAL latency of one fused
value-and-grad evaluation at 1M x 100 (kernel stream vs cross-block
combine/assembly). Each part is timed as a dependency CHAIN (output
feeds the next call's params) so pipelining cannot hide latency.
Run: PS=1000000 PN=100 python dev/probe_vag_parts.py
"""
import functools
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

dt = jnp.float32


@jax.jit
def synth(key):
    u = jax.random.uniform(key, (S, N, 3), dt, 1e-6, 1.0)
    e = -jnp.log(u)
    return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))


gl = synth(jax.random.PRNGKey(0))
dist = jnp.full((S,), 0.05, dt)
state = init_state(gl, jnp.full((S,), 0.2, dt), jnp.full((N,), 0.2, dt),
                   jnp.full((N,), 0.05, dt))
bs = hmm_pallas.pick_block_size(S, N)
prep_fn = jax.jit(lambda e, d: hmm_pallas.prepare_inputs(e, d, bs=bs))
prep = dict(prep_fn(state.e_prob, dist))
for _k in ("S", "N", "bs", "nb", "L", "Lp", "C", "R", "bs_pad"):
    prep[_k] = int(prep[_k])


def sync(x):
    return float(np.asarray(jnp.sum(x)))


sync(prep["e0"])
print(f"nb={prep['nb']} bs={prep['bs']} C={prep['C']} R={prep['R']}",
      file=sys.stderr, flush=True)


def chain(label, fn, k=12):
    """fn(F, alpha) -> (F', alpha') serially inside one jit. Timed at
    two chain lengths (k and 3k); the difference cancels the ~27ms
    scalar-sync RTT that a single (total/k) would smear over the reps
    (+2.7ms/step at k=10 -- the round-3 numbers carried this bias)."""
    jf = jax.jit(lambda e0, e1, d, F, a, reps: jax.lax.fori_loop(
        0, reps, lambda i, c: fn(dict(prep, e0=e0, e1=e1, d=d), c[0], c[1]),
        (F, a)), static_argnames=("reps",))
    F0 = jnp.full((N,), 0.2, dt)
    a0 = jnp.full((N,), 0.05, dt)
    call = functools.partial(jf, prep["e0"], prep["e1"], prep["d"])

    def run(reps):
        out = call(F0, a0, reps)
        sync(out[0])
        t0 = time.perf_counter()
        out = call(F0, a0, reps)
        sync(out[0])
        return time.perf_counter() - t0

    t_long, t_short = run(3 * k), run(k)
    dtm = (t_long - t_short) / (2 * k) * 1e3
    print(f"{label:44s} {dtm:8.2f} ms/step", file=sys.stderr, flush=True)


EPSI = 1e-7


def step_kernel_only(pr, F, a):
    # fused transfer+tangent stream, NO combine: consume via a cheap sum
    A_g = hmm_pallas.transfer_grad_pallas(F, a, pr)
    z = jnp.sum(A_g) * EPSI
    return F + z, a + z


def step_kernel_primal(pr, F, a):
    # primal-only block-transfer stream (what one forward costs)
    A_r = hmm_pallas.block_transfers_pallas(F[None], a[None], pr)
    z = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(A_r)) * EPSI
    return F + z, a + z


def step_full_vag(pr, F, a):
    L, gF, ga = hmm_pallas.loglik_value_and_grad_pallas(F, a, pr)
    z = jnp.sum(L) * EPSI
    return F + z + gF * 0.0, a + z


def step_fwd_ll(pr, F, a):
    ll = hmm_pallas.forward_loglik_pallas(F[None], a[None], pr)[0]
    z = jnp.sum(ll) * EPSI
    return F + z, a + z


chain("block_transfers (primal kernel only)", step_kernel_primal)
chain("transfer_grad kernel only (no combine)", step_kernel_only)
chain("forward_loglik (primal + combine)", step_fwd_ll)
chain("full value_and_grad (kernel + assembly)", step_full_vag)

"""Dev probe: est_maf_pallas cost attribution + macro-schedule sweep at
1M x 100 on the v5e. Chained two-length timing.

Run: PS=1000000 PN=100 python dev/probe_maf.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

S = int(os.environ.get("PS", 1_000_000))
N = int(os.environ.get("PN", 100))
REPS = int(os.environ.get("REPS", 8))

import jax
import jax.numpy as jnp

from ngsf_hmm_tpu.ops.maf_pallas import (
    est_maf_pallas, prepare_gl_tiles, prepare_p_tiles, _run_macro, _run,
)

dt = jnp.float32


@jax.jit
def synth(key):
    k1, k2, k3 = jax.random.split(key, 3)
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
    return gl


gl = synth(jax.random.PRNGKey(0))
tiles = jax.jit(lambda g: prepare_gl_tiles(jnp.exp(g)))(gl)
p_ibd = jax.jit(lambda g: jnp.clip(
    jnp.exp(g[..., 2]) * 0.9, 0.0, 1.0))(gl)  # plausible [S, N] posterior
p_tiles = jax.jit(prepare_p_tiles)(p_ibd)


def sync(x):
    return float(np.asarray(jnp.sum(x)))


sync(p_tiles)


def chain(label, step, consts, x0, k=REPS):
    @partial(jax.jit, static_argnames=("reps",))
    def chained(cs, x, reps):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(cs, c), x)

    def run(reps):
        o = chained(consts, x0, reps)
        sync(o)
        t0 = time.perf_counter()
        o = chained(consts, x0, reps)
        sync(o)
        return time.perf_counter() - t0

    t_long, t_short = run(3 * k), run(k)
    dtm = (t_long - t_short) / (2 * k) * 1e3
    print(f"{label:46s} {dtm:8.2f} ms", file=sys.stderr, flush=True)


E = 1e-30

ONLY = set(os.environ.get("ONLY", "prep,full,k816").split(","))

if "prep" in ONLY:
    chain("prepare_p_tiles ([S,N] -> tiles)",
          lambda cs, p: p + jnp.mean(prepare_p_tiles(p)) * E,
          None, p_ibd)

if "full" in ONLY:
    chain("est_maf_pallas macro (incl p tiling)",
          lambda cs, p: p + jnp.sum(
              est_maf_pallas(cs, p, S, macro=True)) * E,
          tiles, p_ibd)

SCHEDS = {"k816": (8, 16), "k832": (8, 32), "k416": (4, 16),
          "k432": (4, 32), "k464": (4, 64), "k1616": (16, 16)}
from ngsf_hmm_tpu.ops.maf import macro_rounds

for key, (K0, M) in SCHEDS.items():
    if key in ONLY:
        chain(f"_run_macro kernel only K0={K0} M={M}",
              lambda cs, p, K0=K0, M=M: p + jnp.sum(
                  _run_macro(cs[0], cs[1], cs[2], p, N, K0,
                             macro_rounds(K0, M))) * E,
              tiles, p_tiles)

if "exact" in ONLY:
    chain("_run exact damped kernel only",
          lambda cs, p: p + jnp.sum(_run(cs[0], cs[1], cs[2], p, N)) * E,
          tiles, p_tiles, k=4)

if "slab" in ONLY:
    from ngsf_hmm_tpu.models.hmm_pallas import (
        prepare_gl_inputs, pack_sites2,
    )
    from ngsf_hmm_tpu.ops.maf_pallas import est_maf_slab

    gl_lin = jax.jit(jnp.exp)(gl)
    prep2 = prepare_gl_inputs(gl_lin, jnp.full((S,), 1e-5, jnp.float32))
    p_slab = jax.jit(lambda p: pack_sites2(p, prep2))(p_ibd)
    sync(p_slab)
    # slabs must ride as jit ARGUMENTS (CLAUDE.md gotcha: closed-over
    # device arrays bake into the HLO and blow the tunneled compile)
    meta = {k: prep2[k] for k in
            ("S", "N", "bs", "nb", "nb_p", "G", "Np", "C", "bs_pad")}

    def _slab_step(cs, p):
        pr = dict(meta, g0=cs[0], g2=cs[1], dc=None)
        f = est_maf_slab(pr, p)
        return p + jnp.sum(f) * E

    chain("est_maf_slab (v2 slabs, no relayout)", _slab_step,
          (prep2["g0"], prep2["g2"]), p_slab)

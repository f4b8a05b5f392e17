"""Dev probe: where does the block-transfer kernel's VPU time go?

Times self-contained variants of hmm_pallas._k_block_transfer at
1M x 100 (B=1): the production kernel, one with exp(-a*d) replaced by a
cheap polynomial (bounds the transcendental cost), one skipping the
per-level tree rescale (bounds the rescale cost), a direct 2-site leaf
build (halves tree combines below level 1), and a pure-stream kernel
that only sums the slabs (the DMA floor).

Run: PS=1000000 PN=100 python dev/probe_kernel_flops.py
"""
import os
import sys
import time

import numpy as np

S = int(os.environ.get("PS", 1_000_000))
N = int(os.environ.get("PN", 100))
REPS = int(os.environ.get("REPS", 24))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ngsf_hmm_tpu.models import hmm_pallas as hp
from ngsf_hmm_tpu.models.hmm_pallas import (
    _CPARAMS, _SUB, _TINY, _LN2, _full, _imap_fwd, _interpret,
    _mat_mul4, _max4, _pow2_rescale, _add4, _t_elems,
)
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
bs = hp.pick_block_size(S, N)
prep_fn = jax.jit(lambda e, d: hp.prepare_inputs(e, d, bs=bs))
prep = dict(prep_fn(state.e_prob, dist))
for _k in ("S", "N", "bs", "nb", "L", "Lp", "C", "R", "bs_pad"):
    prep[_k] = int(prep[_k])
C, bs_pad, Lp = prep["C"], prep["bs_pad"], prep["Lp"]
R = hp._rows_for(Lp, 14, bs_pad, "TRANSFER")
print(f"nb={prep['nb']} bs={prep['bs']} C={C} bs_pad={bs_pad} R={R}",
      file=sys.stderr, flush=True)
F1 = jnp.full((1, N), 0.2, dt)
a1 = jnp.full((1, N), 0.05, dt)
Fr, ar = hp._rep_params(F1, a1, prep)
Fr, ar = Fr[0], ar[0]


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def timeit(label, fn):
    """fn(e0, e1, d, Fr, ar) -> array. Reps are chained INSIDE one jit
    (each rep's output perturbs the next rep's Fr) -- queued independent
    calls are unreliable on this backend (results whose values are never
    demanded can be elided; see probe_vag_parts)."""

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def chained(e0, e1, d, F, a, k):
        def body(i, c):
            F_, a_ = c
            out = fn(e0, e1, d, F_, a_)
            z = jnp.sum(out) * 1e-30
            return (F_ + z, a_ + z)

        return jax.lax.fori_loop(0, k, body, (F, a))

    def run(k):
        out = chained(e0s, e1s, ds, Fr, ar, k)
        sync(out[0])
        t0 = time.perf_counter()
        out = chained(e0s, e1s, ds, Fr, ar, k)
        sync(out[0])
        return time.perf_counter() - t0

    # two chain lengths: the difference cancels sync RTT + dispatch
    t_long, t_short = run(3 * REPS), run(REPS)
    dtm = (t_long - t_short) / (2 * REPS) * 1e3
    print(f"{label:46s} {dtm:8.2f} ms", file=sys.stderr, flush=True)
    return dtm


def tree_product_v(m, rescale_mask):
    """Tree product; rescale only at levels where rescale_mask[lvl]."""
    ex_tot = None
    lvl = 0
    while m[0].shape[0] > 1:
        k = m[0].shape[0] // 2
        pairs = tuple(x.reshape(k, 2, *x.shape[1:]) for x in m)
        a = tuple(x[:, 0] for x in pairs)
        b = tuple(x[:, 1] for x in pairs)
        q = _mat_mul4(a, b)
        if rescale_mask(lvl, k):
            mx = jnp.maximum(_max4(q), _TINY)
            sc, ex = _pow2_rescale(mx)
            m = tuple(x * sc for x in q)
            e = ex.sum(0)
            ex_tot = e if ex_tot is None else ex_tot + e
        else:
            m = q
        lvl += 1
    prod = tuple(x[0] for x in m)
    if ex_tot is None:
        ex_tot = jnp.zeros_like(prod[0])
    return prod, ex_tot


def make_transfer(leaf_fn, rescale_mask, Rk):
    nsteps = bs_pad // Rk

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, out_ref,
               c00, c01, c10, c11, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            c00[:] = jnp.ones((1, _SUB, C), jnp.float32)
            c01[:] = jnp.zeros((1, _SUB, C), jnp.float32)
            c10[:] = jnp.zeros((1, _SUB, C), jnp.float32)
            c11[:] = jnp.ones((1, _SUB, C), jnp.float32)
            acc[:] = jnp.zeros((1, _SUB, C), jnp.float32)

        e0, e1, d = e0_ref[:], e1_ref[:], d_ref[:]
        F, a = Fr_ref[0], ar_ref[0]
        m = leaf_fn(F, a, d, e0, e1)
        g, ex_t = tree_product_v(m, rescale_mask)
        n = _mat_mul4((c00[0], c01[0], c10[0], c11[0]), g)
        mx = jnp.maximum(_max4(n), _TINY)
        sc, ex = _pow2_rescale(mx)
        c00[0] = n[0] * sc
        c01[0] = n[1] * sc
        c10[0] = n[2] * sc
        c11[0] = n[3] * sc
        acc[0] = acc[0] + ex + ex_t

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[0] = c00[:]
            out_ref[1] = c01[:]
            out_ref[2] = c10[:]
            out_ref[3] = c11[:]
            out_ref[4] = acc[:] * _LN2

    stream = lambda: pl.BlockSpec(
        (Rk, _SUB, C), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((5, 1, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[stream(), stream(), stream(),
                  _full(1, _SUB, C), _full(1, _SUB, C)],
        out_specs=_full(5, 1, _SUB, C),
        scratch_shapes=[pltpu.VMEM((1, _SUB, C), jnp.float32)] * 5,
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def leaf_std(F, a, d, e0, e1):
    t00, t01, t10, t11 = _t_elems(F, a, d)
    return (t00 * e0, t01 * e1, t10 * e0, t11 * e1)


def leaf_noexp(F, a, d, e0, e1):
    x = 1.0 - a * d  # WRONG math; same op shape minus the transcendental
    onem = 1.0 - x
    t00 = onem * (1.0 - F) + x
    t01 = onem * F
    t10 = onem * (1.0 - F)
    t11 = onem * F + x
    return (t00 * e0, t01 * e1, t10 * e0, t11 * e1)


def leaf_pair2(F, a, d, e0, e1):
    """Direct 2-site products: [R,8,C] -> [R/2,8,C] leaf, one less tree
    level, no rescale between the pair."""
    x = jnp.exp(-a * d)
    onem = 1.0 - x
    p = onem * (1.0 - F) * e0
    r = onem * F * e1
    A = p + x * e0
    D = r + x * e1
    pr = lambda v: v.reshape(v.shape[0] // 2, 2, *v.shape[1:])
    p1, p2 = pr(p)[:, 0], pr(p)[:, 1]
    r1, r2 = pr(r)[:, 0], pr(r)[:, 1]
    A1, A2 = pr(A)[:, 0], pr(A)[:, 1]
    D1, D2 = pr(D)[:, 0], pr(D)[:, 1]
    return (
        A1 * A2 + r1 * p2,
        A1 * r2 + r1 * D2,
        p1 * A2 + D1 * p2,
        p1 * r2 + D1 * D2,
    )


def make_stream_floor(Rk):
    """Pure-DMA floor: read the 3 slabs, one multiply-accumulate."""
    nsteps = bs_pad // Rk

    def kernel(e0_ref, e1_ref, d_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros((_SUB, C), jnp.float32)

        acc[:] = acc[:] + (e0_ref[:] * e1_ref[:] + d_ref[:]).sum(0)

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[:] = acc[:]

    stream = lambda: pl.BlockSpec(
        (Rk, _SUB, C), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[stream(), stream(), stream()],
        out_specs=_full(_SUB, C),
        scratch_shapes=[pltpu.VMEM((_SUB, C), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


always = lambda lvl, k: True
alternate = lambda lvl, k: lvl % 2 == 1
never = lambda lvl, k: False

e0s, e1s, ds = prep["e0"], prep["e1"], prep["d"]

# slabs MUST be jit arguments, not closure captures: a 0-arg jit bakes
# the 1.6GB slabs into the HLO as constants (hangs the tunneled compile)
variants = [
    ("stream floor (3 slabs, 1 fma)",
     jax.jit(lambda e0, e1, d, F, a: make_stream_floor(R)(e0, e1, d))),
    ("production kernel (hp._k_block_transfer)",
     jax.jit(lambda e0, e1, d, F, a: hp._k_block_transfer(
         1, C, bs_pad, R)(e0, e1, d, F[None], a[None]))),
    ("variant: rescale alternate levels",
     jax.jit(lambda e0, e1, d, F, a: make_transfer(leaf_std, alternate, R)(
         e0, e1, d, F[None], a[None]))),
    ("variant: no tree rescale (carry only)",
     jax.jit(lambda e0, e1, d, F, a: make_transfer(leaf_std, never, R)(
         e0, e1, d, F[None], a[None]))),
    ("variant: no exp (poly placeholder)",
     jax.jit(lambda e0, e1, d, F, a: make_transfer(leaf_noexp, always, R)(
         e0, e1, d, F[None], a[None]))),
    ("variant: 2-site leaf + alternate rescale",
     jax.jit(lambda e0, e1, d, F, a: make_transfer(leaf_pair2, alternate, R)(
         e0, e1, d, F[None], a[None]))),
    ("variant: 2-site leaf, no tree rescale",
     jax.jit(lambda e0, e1, d, F, a: make_transfer(leaf_pair2, never, R)(
         e0, e1, d, F[None], a[None]))),
]

only = os.environ.get("VARIANTS")  # e.g. "0,1" to probe a subset
idx = [int(i) for i in only.split(",")] if only else range(len(variants))
for i in idx:
    label, fn = variants[i]
    timeit(f"[{i}] {label}", fn)

"""Dev probe: what does a streamed chunk's gl-slab REBUILD actually cost?

The 50M rung's residual over the in-HBM rate is the non-pinned chunks'
per-pass slab rebuild (round-4 VERDICT ask #2). Decomposes the rebuild:

  synth     -- the bench's device GL synthesis (stands in for a real
               host fetch's h2d landing)
  exp       -- jnp.exp(gl) alone ([cs, N, 3] read+write)
  slabs     -- hmm_pallas.gl_slabs(gl_lin) alone (fold relayout)
  exp+slabs -- one jit of both (what _chunk_glslabs runs)
  fcomp     -- the freq compact (tiny, for reference)

Two-length chained differencing; arrays as jit args.
Run: PS=1000000 PN=100 python -u dev/probe_relayout.py
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

dt = jnp.float32


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def chain_time(fn, args, k_short=2, k_long=6):
    def chain(k):
        def f(*a):
            s = jnp.float32(0.0)
            for _ in range(k):
                o = fn(s, *a)
                # sum a FULL output array (a slice would let XLA
                # partially DCE the producer); costs a ~1-2 ms read,
                # identical across variants
                s = s + (jnp.sum(o[0]) if isinstance(o, tuple)
                         else jnp.sum(o))
            return s
        return jax.jit(f)

    c_s, c_l = chain(k_short), chain(k_long)
    sync(c_s(*args))
    sync(c_l(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(c_s(*args))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(c_l(*args))
        t_l = time.perf_counter() - t0
        ts.append((t_l - t_s) / (k_long - k_short))
    return float(np.median(ts))


def main():
    dev = jax.devices()[0]
    print(f"[relayout] {dev.platform}:{dev.device_kind} S={S} N={N}",
          flush=True)

    @jax.jit
    def synth(key):
        u = jax.random.uniform(key, (S, N, 3), dt, 1e-6, 1.0)
        e = -jnp.log(u)
        return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))

    gl = synth(jax.random.PRNGKey(7))
    sync(gl[0])
    bs, nb_p = hp.pick_geom2(S, N)
    print(f"[relayout] geom bs={bs} nb_p={nb_p}", flush=True)
    cells_gb = S * N * 4 / 1e9

    t = chain_time(
        lambda s, g: synth(jax.random.fold_in(
            jax.random.PRNGKey(0), (0 * s).astype(jnp.int32))) ,
        (gl,))
    print(f"[relayout] synth     {t * 1e3:7.2f} ms", flush=True)

    t = chain_time(lambda s, g: jnp.exp(g * (1.0 + 0.0 * s)), (gl,))
    print(f"[relayout] exp       {t * 1e3:7.2f} ms  "
          f"({6 * cells_gb / t:.0f} GB/s over r+w)", flush=True)

    gl_lin = jax.jit(jnp.exp)(gl)
    sync(gl_lin[0])

    t = chain_time(
        lambda s, g: hp.gl_slabs(g * (1.0 + 0.0 * s), bs, nb_p), (gl_lin,))
    print(f"[relayout] slabs     {t * 1e3:7.2f} ms  "
          f"({5 * cells_gb / t:.0f} GB/s over r+w)", flush=True)

    t = chain_time(
        lambda s, g: hp.gl_slabs(jnp.exp(g * (1.0 + 0.0 * s)), bs, nb_p),
        (gl,))
    print(f"[relayout] exp+slabs {t * 1e3:7.2f} ms  (the _chunk_glslabs "
          f"path)", flush=True)

    t = chain_time(
        lambda s, f: hp.site_compact(f * (1.0 + 0.0 * s), bs, nb_p, 2.0),
        (jnp.full((S,), 0.2, dt),))
    print(f"[relayout] fcomp     {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Dev probe (round-4 VERDICT ask #5): where does est_maf_slab's time go?

The slab kernel reads (g0, g2, p) ONCE per grid step and runs the whole
macro fixed point in VMEM, so its bytes floor is ~12 B/cell (~2 ms at
1M x 100) -- the 20-24 ms measured is COMPUTE. This probe times the
production kernel against variants with modified schedules to decompose
per-real-pass, per-grad-window and fixed costs:

  full      -- production (K0=8 real + (12,24,57) grad windows)
  real4     -- K0=4, same grad windows       (4 fewer real passes)
  nograd    -- K0=8, zero grad windows       (grad-window cost)
  real1     -- K0=1, zero grad windows       (fixed + 1-pass cost)
  stream    -- read-only sum over (g0, g2, p) (DMA floor)

Two-length chained timing throughout. Run:
  PS=1000000 PN=100 python dev/probe_maf_slab.py
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
from ngsf_hmm_tpu.ops import maf_pallas as mp  # noqa: E402

dt = jnp.float32


def sync(x):
    return float(np.asarray(jnp.sum(x)))


@jax.jit
def synth(key):
    u = jax.random.uniform(key, (S, N, 3), dt, 1e-6, 1.0)
    e = -jnp.log(u)
    return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))


def chain_time(make_call, big_args, k_short=2, k_long=6):
    """Big device arrays are jit ARGUMENTS (a 0-arg closure bakes them
    into the HLO as constants and the tunneled compile hangs)."""
    def chain(k):
        def f(*args):
            s = jnp.float32(0.0)
            for _ in range(k):
                o = make_call(s, *args)
                s = s + jnp.sum(o)
            return s
        return jax.jit(f)

    c_s = chain(k_short)
    c_l = chain(k_long)
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


def main():
    dev = jax.devices()[0]
    print(f"[mafslab] {dev.platform}:{dev.device_kind} S={S} N={N}",
          flush=True)
    gl = synth(jax.random.PRNGKey(2))
    dist = jnp.full((S,), 0.05, dt)
    prep2 = hp.prepare_gl_inputs(jnp.exp(gl), dist)
    p = jax.random.uniform(jax.random.PRNGKey(3), (S, N), dt, 0.0, 0.95)
    p_slab = jax.jit(lambda x: hp.pack_sites2(x, prep2))(p)
    sync(p_slab[0])
    print(f"[mafslab] C={prep2['C']} nb_p={prep2['nb_p']} G={prep2['G']} "
          f"bs_pad={prep2['bs_pad']} slab_ok="
          f"{mp.slab_geom_ok(S, N, prep2['bs'], prep2['nb_p'])}",
          flush=True)

    big = (prep2["g0"], prep2["g2"], p_slab)

    def run_sched(K0, Ms):
        def f(s, g0, g2, ps0):
            # serialize through the posterior slab (a cheap full-width
            # multiply keeps a real data dep; 0*s is not folded)
            ps = ps0 * (1.0 + 0.0 * s)
            return mp._run_macro_slab(
                g0, g2, ps,
                prep2["C"], prep2["nb_p"], prep2["G"], prep2["bs"],
                prep2["nb"], S, N, prep2["bs_pad"], K0, Ms,
            )
        return f

    from ngsf_hmm_tpu.ops.maf import macro_rounds, macro_schedule

    K0p, Mp = macro_schedule(N)
    Msp = macro_rounds(K0p, Mp)
    print(f"[mafslab] production schedule K0={K0p} Ms={Msp}", flush=True)

    variants = [
        ("full", K0p, Msp),
        ("real4", 4, Msp),
        ("nograd", K0p, ()),
        ("real1", 1, ()),
    ]
    times = {}
    for label, K0, Ms in variants:
        t = chain_time(run_sched(K0, Ms), big)
        times[label] = t
        print(f"[mafslab] {label:7s} {t * 1e3:7.2f} ms", flush=True)

    # decomposition
    per_real = (times["full"] - times["real4"]) / (K0p - 4)
    grad_cost = times["full"] - times["nograd"]
    fixed = times["real1"] - per_real
    print(f"[mafslab] per-real-pass {per_real * 1e3:.2f} ms; grad windows "
          f"total {grad_cost * 1e3:.2f} ms; fixed+stream "
          f"{fixed * 1e3:.2f} ms", flush=True)
    bytes_in = (3 * prep2["bs_pad"] * 8 * prep2["C"] * 4)
    print(f"[mafslab] bytes floor at 600 GB/s: "
          f"{bytes_in / 600e9 * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

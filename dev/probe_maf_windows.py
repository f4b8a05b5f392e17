"""Dev probe (round-5 VERDICT ask #5): split est_maf_slab's 12.2 ms
grad-window cost into (a) the 3 sums_grad evaluations and (b) the
serial in-kernel virtual-step recursions.

Schedule variants of _run_macro_slab (all K0 = 8):
  full   (12, 24, 57)  -- production: 3 sums_grad + 93 virtual steps
  one    (93,)         -- 1 sums_grad + the same 93 virtual steps
  tiny   (1, 1, 1)     -- 3 sums_grad + 3 virtual steps

full - one  = 2 extra sums_grad evaluations
full - tiny = 90 virtual steps' serial latency

Two-length chained timing. Run: PS=1000000 PN=100 python dev/probe_maf_windows.py
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
    def chain(k):
        def f(*args):
            s = jnp.float32(0.0)
            for _ in range(k):
                o = make_call(s, *args)
                s = s + jnp.sum(o)
            return s
        return jax.jit(f)

    c_s, c_l = chain(k_short), chain(k_long)
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
    print(f"[mafwin] {dev.platform}:{dev.device_kind} S={S} N={N}",
          flush=True)
    gl = synth(jax.random.PRNGKey(2))
    dist = jnp.full((S,), 0.05, dt)
    prep2 = hp.prepare_gl_inputs(jnp.exp(gl), dist)
    p = jax.random.uniform(jax.random.PRNGKey(3), (S, N), dt, 0.0, 0.95)
    p_slab = jax.jit(lambda x: hp.pack_sites2(x, prep2))(p)
    sync(p_slab[:1, :1, :8])

    big = (prep2["g0"], prep2["g2"], p_slab)

    def run_sched(K0, Ms):
        def f(s, g0, g2, ps0):
            ps = ps0 * (1.0 + 0.0 * s)
            return mp._run_macro_slab(
                g0, g2, ps,
                prep2["C"], prep2["nb_p"], prep2["G"], prep2["bs"],
                prep2["nb"], S, N, prep2["bs_pad"], K0, Ms,
            )
        return f

    times = {}
    for label, Ms in (("full", (12, 24, 57)), ("one", (93,)),
                      ("tiny", (1, 1, 1))):
        t = chain_time(run_sched(8, Ms), big)
        times[label] = t
        print(f"[mafwin] {label:5s} {t * 1e3:7.2f} ms", flush=True)

    per_sg = (times["full"] - times["one"]) / 2
    steps90 = times["full"] - times["tiny"]
    print(f"[mafwin] per sums_grad eval {per_sg * 1e3:.2f} ms; "
          f"90 virtual steps {steps90 * 1e3:.2f} ms "
          f"({steps90 / 90 * 1e6:.1f} us/step)", flush=True)


if __name__ == "__main__":
    main()

"""Attribute the streamed EM iteration's wall-clock at 10M x 100.

bench.py's stream leg measures ~11.1 s/EM-iter (10 chunks of 1M); the
resident engine runs 1M x 100 at ~107 ms, so a naive 10x scale-up would
be ~1.1 s.  This probe times each phase of StreamingEM._stream_iteration
(pass A transfers, chain assembly, pass B estep+est_maf, M-step evals)
with explicit syncs, and counts the per-iteration calls of each chunk
kernel, so the gap is attributed instead of guessed.

Run: PS=10000000 PN=100 CS=1000000 python dev/probe_stream_phases.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ngsf_hmm_tpu.models import streaming
from ngsf_hmm_tpu.models.em import EMOptions
from ngsf_hmm_tpu.models.streaming import StreamingEM

Ss = int(os.environ.get("PS", 10_000_000))
Ns = int(os.environ.get("PN", 100))
cs = int(os.environ.get("CS", 1_000_000))
dt = jnp.float32


@jax.jit
def synth_chunk(key):
    u = jax.random.uniform(key, (cs, Ns, 3), dt, 1e-6, 1.0)
    e = -jnp.log(u)
    return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))


class _Shape:
    shape = (Ss, Ns, 3)

    def __getitem__(self, _):
        raise RuntimeError("device-synth only")


rng = np.random.default_rng(5)
dist = rng.integers(100, 200_000, size=Ss).astype(np.float64) / 1e6


class _DeviceSynthStream(StreamingEM):
    def _chunk(self, c):
        lo = c * self.cs
        hi = min(lo + self.cs, self.S)
        gl_c = synth_chunk(jax.random.PRNGKey(c))
        d_c = self.dist[lo:hi].astype(np.float32)
        if hi - lo < self.cs:
            d_c = np.pad(d_c, (0, self.cs - (hi - lo)))
        return gl_c, lo, hi, d_c


def sync():
    # one tiny device op + pull: orders behind all queued work
    return float(np.asarray(jnp.sum(jnp.zeros(8, jnp.float32))))


counts = {}
for name in ("_chunk_transfer", "_chunk_estep", "_chunk_transfer_grad"):
    fn = getattr(streaming, name)

    def wrap(fn=fn, name=name):
        def g(*a, **k):
            counts[name] = counts.get(name, 0) + 1
            return fn(*a, **k)
        return g

    setattr(streaming, name, wrap())

se = _DeviceSynthStream(_Shape(), dist, chunk_sites=cs)
opts = EMOptions(numerics="pallas", min_iters=1, max_iters=2,
                 min_epsilon=1e-9)

freq = np.full(Ss, 0.2)
F = np.full(Ns, 0.2)
alpha = np.full(Ns, 0.05)

t0 = time.perf_counter()
freq_d = se._freq_pad_dev(freq)
out = se._stream_iteration(freq_d, F, alpha, opts)
print(f"warmup+compile {time.perf_counter() - t0:.1f}s  counts={counts}")

# ---- full iteration baseline
counts.clear()
sync()
t0 = time.perf_counter()
out = se._stream_iteration(out[0], out[1], out[2], opts)
t_full = time.perf_counter() - t0
print(f"full iteration: {t_full * 1e3:.0f} ms  counts={counts}")

freq_w, F_w, a_w = out[0], out[1], out[2]

# ---- phase A: transfers + assembly
sync()
t0 = time.perf_counter()
Ts, ss = se._transfers(freq_w, F_w, a_w)
t_passA = time.perf_counter() - t0
t0 = time.perf_counter()
v0, wT, ll_f, ll_b = streaming._assemble_chain(Ts, ss, F_w)
t_asm = time.perf_counter() - t0
print(f"pass A (transfers, {se.C} chunks): {t_passA * 1e3:.0f} ms; "
      f"host chain assembly: {t_asm * 1e3:.1f} ms")

# ---- one M-step gradient eval (what each L-BFGS probe costs)
sync()
t0 = time.perf_counter()
se._transfers_grad(freq_w, F_w, a_w)
t_grad = time.perf_counter() - t0
print(f"one _transfers_grad eval ({se.C} chunks): {t_grad * 1e3:.0f} ms")

# ---- pass B: one synced chunk estep (with and without est_maf)
F_d = se._put(F_w, "ind", jnp.float32)
a_d = se._put(alpha, "ind", jnp.float32)
gl_c, lo, hi, d_c = se._chunk(0)
fr = se._freq_chunk(freq_w, lo, hi)
v0_d = jnp.asarray(np.ascontiguousarray(v0), jnp.float32)
wT_d = jnp.asarray(np.ascontiguousarray(wT), jnp.float32)
for with_freq, label in ((True, "estep+est_maf"), (False, "estep only")):
    sync()
    t0 = time.perf_counter()
    p_c, f_c = streaming._chunk_estep(
        se._put(gl_c, "gl"), se._put(fr, "rep"), se._put(d_c, "rep"),
        F_d, a_d, v0_d[0], wT_d[0], se._cbs, se.cs, hi - lo,
        with_freq=with_freq, maf_kernel="pallas", chain_kernel=se._ck,
    )
    sync()
    print(f"one chunk {label}: {(time.perf_counter() - t0) * 1e3:.0f} ms")

# ---- synth + prep share: one chunk fetch alone
sync()
t0 = time.perf_counter()
gl_c, lo, hi, d_c = se._chunk(1)
sync()
print(f"one chunk synth fetch: {(time.perf_counter() - t0) * 1e3:.0f} ms")

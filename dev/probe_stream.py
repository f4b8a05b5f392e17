"""Dev probe: where does a device-synth streamed EM iteration spend its
time? Run: SS=1000000 SN=32 SC=250000 python dev/probe_stream.py"""
import os
import sys
import time

import numpy as np

SS = int(os.environ.get("SS", 1_000_000))
SN = int(os.environ.get("SN", 32))
SC = int(os.environ.get("SC", 250_000))

import jax
import jax.numpy as jnp

from ngsf_hmm_tpu.models.em import EMOptions
from ngsf_hmm_tpu.models.streaming import StreamingEM


@jax.jit
def synth_chunk(key):
    k1, k2, k3 = jax.random.split(key, 3)
    err = 0.01
    depth = jax.random.poisson(k1, 2.0, (SC, SN)).astype(jnp.float32)
    truth = jax.random.randint(k2, (SC, SN), 0, 3)
    p_der = jnp.array([err, 0.5, 1 - err], jnp.float32)[truth]
    mean = depth * p_der
    sd = jnp.sqrt(jnp.maximum(depth * p_der * (1 - p_der), 1e-6))
    der = jnp.clip(jnp.round(mean + sd * jax.random.normal(k3, (SC, SN))),
                   0.0, depth)
    k = der[..., None]
    n = depth[..., None]
    p = jnp.array([err, 0.5, 1 - err], jnp.float32)[None, None, :]
    ll = k * jnp.log(p) + (n - k) * jnp.log1p(-p)
    ll = jnp.where(n == 0, 0.0, ll)
    return ll - jax.scipy.special.logsumexp(ll, axis=-1, keepdims=True)


class _Shape:
    shape = (SS, SN, 3)


rng = np.random.default_rng(5)
dist = rng.integers(100, 200_000, size=SS).astype(np.float64) / 1e6


class DS(StreamingEM):
    def _chunk(self, c):
        lo = c * self.cs
        hi = min(lo + self.cs, self.S)
        gl_c = synth_chunk(jax.random.PRNGKey(c))
        d_c = self.dist[lo:hi].astype(np.float32)
        return gl_c, lo, hi, d_c


se = DS(_Shape(), dist, chunk_sites=SC)
opts = EMOptions(numerics="pallas")
freq_d = se._freq_pad_dev(np.full(SS, 0.2))
F = np.full(SN, 0.2)
alpha = np.full(SN, 0.05)

out = se._stream_iteration(freq_d, F, alpha, opts)  # warm/compile
print("warm done", file=sys.stderr, flush=True)


def tick(label, fn, reps=3):
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:32s} {dt*1e3:9.1f} ms", file=sys.stderr, flush=True)
    return r


tick("synth_chunk + pull scalar",
     lambda: float(np.asarray(jnp.sum(synth_chunk(jax.random.PRNGKey(1))))))
tick("_transfers (pass A)", lambda: se._transfers(freq_d, F, alpha))
tick("_transfers_grad (vag pass)",
     lambda: se._transfers_grad(freq_d, F, alpha))
Ts, ss = se._transfers(freq_d, F, alpha)
from ngsf_hmm_tpu.models.streaming import _assemble_chain
v0, wT, llf, llb = _assemble_chain(Ts, ss, F)
tick("_assemble_chain (host)", lambda: _assemble_chain(Ts, ss, F))


def passB():
    import jax.numpy as jnp
    F_d = jnp.asarray(F, jnp.float32)
    a_d = jnp.asarray(alpha, jnp.float32)
    from ngsf_hmm_tpu.models.streaming import _chunk_estep
    parts = []
    for c in range(se.C):
        gl_c, lo, hi, d_c = se._chunk(c)
        p_c, f_c = _chunk_estep(
            gl_c, se._freq_chunk(freq_d, lo, hi),
            jnp.asarray(d_c), F_d, a_d,
            jnp.asarray(v0[c], jnp.float32), jnp.asarray(wT[c], jnp.float32),
            se._cbs if se._ck == "pallas" else se.bs, se.cs, hi - lo,
            maf_kernel="pallas", chain_kernel=se._ck,
        )
        parts.append(f_c)
    return float(np.asarray(jnp.sum(parts[0])))


se._ck = "pallas"
from ngsf_hmm_tpu.models import hmm_pallas
se._cbs = hmm_pallas.pick_block_size(se.cs, se.N)
tick("pass B (posteriors+maf)", passB)
tick("FULL _stream_iteration",
     lambda: se._stream_iteration(freq_d, F, alpha, opts), reps=2)

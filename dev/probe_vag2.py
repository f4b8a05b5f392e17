"""Dev probe (round-4 VERDICT ask #4): flop-probe the v2 FUSED
value-and-grad kernel with the corrected two-length chained method.

The round-4 timing correction exonerated the PRIMAL chain kernel (the
"2.6x above bytes" was sync-RTT bias) but never re-measured the 3-chain
tangent kernel (reported 7.8 ms vs 2.0-2.2 primal at 1M x 100). This
probe times, each as a two-length chained difference (output feeds the
next input inside one jit, so the ~27 ms RTT and dispatch overheads
cancel):

  stream   -- read-only sum over the same (g0, g2, fc, dc) inputs: the
              DMA floor for any kernel over these slabs
  primal   -- block_transfers_fused (B=1)
  vag      -- transfer_grad_fused (primal + dF + dalpha chains)
  vag_not  -- vag variant SKIPPING the tangent rescale multiplies
              (numerically invalid; bounds what the shared-rescale
              arithmetic costs)
  vag_lean -- vag variant with the rank-1 leaf build: exploits
              M = x*diag(e) + onem*1*[(1-F)e0, F e1] so the three leaf
              matrix 4-tuples cost fewer full-width multiplies

Run: PS=1000000 PN=100 python dev/probe_vag2.py
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ngsf_hmm_tpu.models import hmm_pallas as hp  # noqa: E402
from ngsf_hmm_tpu.models.hmm_pallas import (  # noqa: E402
    _CPARAMS, _LN2, _SUB, _TINY, _add4, _emit2, _full, _interpret,
    _mat_mul4, _max4, _pow2_rescale, _rows_for, _spec2_compact, _spec2_full,
    _tree_product_grad,
)

dt = jnp.float32


def sync(x):
    return float(np.asarray(jnp.sum(x)))


@jax.jit
def synth(key):
    u = jax.random.uniform(key, (S, N, 3), dt, 1e-6, 1.0)
    e = -jnp.log(u)
    return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))


def _k2_vag_variant(C, nb_p, G, bs_pad, R, mode):
    """transfer_grad kernel variants; mode in {"prod", "not", "lean"}."""
    nsteps = bs_pad // R

    def kernel(g0_ref, g2_ref, fc_ref, dc_ref, Fr_ref, ar_ref, out_ref,
               c_s, DF_s, Da_s, off_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            one = jnp.ones((_SUB, C), jnp.float32)
            zero = jnp.zeros((_SUB, C), jnp.float32)
            c_s[0], c_s[1], c_s[2], c_s[3] = one, zero, zero, one
            DF_s[:] = jnp.zeros((4, _SUB, C), jnp.float32)
            Da_s[:] = jnp.zeros((4, _SUB, C), jnp.float32)
            off_s[:] = jnp.zeros((_SUB, C), jnp.float32)

        F, a = Fr_ref[:], ar_ref[:]
        e0, e1, d = _emit2(g0_ref[:], g2_ref[:], fc_ref[:], dc_ref[:], G)
        x = jnp.exp(-a * d)
        onem = 1.0 - x
        dxp = jnp.where(x > 0.0, d * x, 0.0)
        if mode == "lean":
            # rank-1 + diagonal leaf: row-shared terms built once
            v0 = (1.0 - F) * e0   # shared by both rows of the rank-1 part
            v1 = F * e1
            ov0 = onem * v0
            ov1 = onem * v1
            xe0 = x * e0
            xe1 = x * e1
            mA = (ov0 + xe0, ov1, ov0, ov1 + xe1)
            oe0 = onem * e0
            oe1 = onem * e1
            mF = (-oe0, oe1, -oe0, oe1)
            fd = F * dxp
            gd = dxp - fd
            mda = (-fd * e0, fd * e1, gd * e0, -gd * e1)
        else:
            oe0 = onem * e0
            oe1 = onem * e1
            fd = F * dxp
            gd = (1.0 - F) * dxp
            mA = (
                (onem * (1.0 - F) + x) * e0,
                (onem * F) * e1,
                (onem * (1.0 - F)) * e0,
                (onem * F + x) * e1,
            )
            mF = (-oe0, oe1, -oe0, oe1)
            mda = (-fd * e0, fd * e1, gd * e0, -gd * e1)
        if mode == "not":
            # tangents WITHOUT the shared rescale (invalid numerics):
            # bounds the cost of the 8 rescale multiplies per combine
            ex_tot = None
            mAv, mFv, mav = mA, mF, mda
            while mAv[0].shape[0] > 1:
                k = mAv[0].shape[0] // 2
                pr = lambda z: z.reshape(k, 2, *z.shape[1:])
                aA = tuple(pr(z)[:, 0] for z in mAv)
                bA = tuple(pr(z)[:, 1] for z in mAv)
                aF = tuple(pr(z)[:, 0] for z in mFv)
                bF = tuple(pr(z)[:, 1] for z in mFv)
                aa = tuple(pr(z)[:, 0] for z in mav)
                ba = tuple(pr(z)[:, 1] for z in mav)
                qA = _mat_mul4(aA, bA)
                qF = _add4(_mat_mul4(aF, bA), _mat_mul4(aA, bF))
                qa = _add4(_mat_mul4(aa, bA), _mat_mul4(aA, ba))
                mx = jnp.maximum(_max4(qA), _TINY)
                sc, ex = _pow2_rescale(mx)
                mAv = tuple(z * sc for z in qA)
                mFv = qF  # <-- unscaled
                mav = qa  # <-- unscaled
                e = ex.sum(0)
                ex_tot = e if ex_tot is None else ex_tot + e
            gA = tuple(z[0] for z in mAv)
            gF = tuple(z[0] for z in mFv)
            ga = tuple(z[0] for z in mav)
            ex_t = (ex_tot if ex_tot is not None
                    else jnp.zeros_like(gA[0]))
        else:
            gA, gF, ga, ex_t = _tree_product_grad(mA, mF, mda)

        cA = (c_s[0], c_s[1], c_s[2], c_s[3])
        cF = (DF_s[0], DF_s[1], DF_s[2], DF_s[3])
        ca = (Da_s[0], Da_s[1], Da_s[2], Da_s[3])
        nA = _mat_mul4(cA, gA)
        nF = _add4(_mat_mul4(cF, gA), _mat_mul4(cA, gF))
        na = _add4(_mat_mul4(ca, gA), _mat_mul4(cA, ga))
        mx = jnp.maximum(_max4(nA), _TINY)
        sc, ex = _pow2_rescale(mx)
        c_s[0], c_s[1], c_s[2], c_s[3] = tuple(v * sc for v in nA)
        DF_s[0], DF_s[1], DF_s[2], DF_s[3] = tuple(v * sc for v in nF)
        Da_s[0], Da_s[1], Da_s[2], Da_s[3] = tuple(v * sc for v in na)
        off_s[:] = off_s[:] + ex + ex_t

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[0:4] = c_s[:]
            out_ref[4:8] = DF_s[:]
            out_ref[8:12] = Da_s[:]
            out_ref[12] = off_s[:] * _LN2

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((13, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[_spec2_full(R, C), _spec2_full(R, C),
                  _spec2_compact(R, nb_p), _spec2_compact(R, nb_p),
                  _full(_SUB, C), _full(_SUB, C)],
        out_specs=_full(13, _SUB, C),
        scratch_shapes=[
            pltpu.VMEM((4, _SUB, C), jnp.float32),
            pltpu.VMEM((4, _SUB, C), jnp.float32),
            pltpu.VMEM((4, _SUB, C), jnp.float32),
            pltpu.VMEM((_SUB, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def _k2_stream(C, nb_p, bs_pad, R):
    """Read-only floor over the same inputs."""
    nsteps = bs_pad // R

    def kernel(g0_ref, g2_ref, fc_ref, dc_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros((_SUB, C), jnp.float32)

        acc[:] = acc[:] + jnp.sum(g0_ref[:], axis=0) \
            + jnp.sum(g2_ref[:], axis=0)

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[...] = acc[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[_spec2_full(R, C), _spec2_full(R, C),
                  _spec2_compact(R, nb_p), _spec2_compact(R, nb_p)],
        out_specs=_full(_SUB, C),
        scratch_shapes=[pltpu.VMEM((_SUB, C), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def chain_time(make_call, big_args, k_short=2, k_long=6):
    """Two-length chained difference; the chain serializes through a
    scalar folded into the (F, alpha) inputs. The big device arrays are
    jit ARGUMENTS (a 0-arg closure bakes them into the HLO as constants
    and the tunneled compile hangs -- CLAUDE.md gotcha)."""
    def chain(k):
        def f(*args):
            F = jnp.full((N,), 0.2, dt)
            a = jnp.full((N,), 0.05, dt)
            s = jnp.float32(0.0)
            for _ in range(k):
                o = make_call(F + 0.0 * s, a, *args)
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
    print(f"[vag2] {dev.platform}:{dev.device_kind} S={S} N={N}",
          flush=True)
    gl = synth(jax.random.PRNGKey(1))
    dist = jnp.full((S,), 0.05, dt)
    prep2 = hp.prepare_gl_inputs(jnp.exp(gl), dist)
    fc = hp.freq_compact(jnp.full((S,), 0.2, dt), prep2)
    sync(prep2["g0"][0])
    C, nb_p, G, bs_pad = (prep2["C"], prep2["nb_p"], prep2["G"],
                          prep2["bs_pad"])
    Lp = _SUB * C
    print(f"[vag2] C={C} nb_p={nb_p} G={G} bs_pad={bs_pad}", flush=True)

    bytes_stream = 2 * bs_pad * 8 * C * 4  # g0+g2 (compacts negligible)
    ints = {k: prep2[k] for k in
            ("S", "N", "bs", "nb", "nb_p", "G", "Np", "C", "bs_pad")}
    big = (prep2["g0"], prep2["g2"], prep2["dc"], fc)

    def t_of(label, fn):
        t = chain_time(fn, big)
        gbps = bytes_stream / t / 1e9
        print(f"[vag2] {label:9s} {t * 1e3:7.2f} ms   ({gbps:.0f} GB/s "
              f"over the 2-slab bytes)", flush=True)
        return t

    R_s = _rows_for(Lp, 6, bs_pad, "PROBE_STREAM")
    k_stream = _k2_stream(C, nb_p, bs_pad, R_s)
    # the chain serializes through fc (the kernel takes no params):
    # multiplying by (1 + 0*s) keeps a real data dep -- XLA does not
    # fold 0*s (s could be NaN) and CSE cannot collapse the k calls
    t_of("stream", lambda F, a, g0, g2, dc, fc_: k_stream(
        g0, g2, fc_ * (1.0 + 0.0 * jnp.sum(F)), dc))

    def _p2(g0, g2, dc):
        return dict(ints, g0=g0, g2=g2, dc=dc)

    t_of("primal", lambda F, a, g0, g2, dc, fc_:
         hp.block_transfers_fused(
             F[None], a[None], _p2(g0, g2, dc), fc_)[0][0])

    t_of("vag", lambda F, a, g0, g2, dc, fc_:
         hp.transfer_grad_fused(F, a, _p2(g0, g2, dc), fc_))

    R_g = _rows_for(Lp, 34, bs_pad, "GRAD2")
    # correctness: the lean leaf must reproduce the production kernel
    F0 = jnp.full((N,), 0.2, dt)
    a0 = jnp.full((N,), 0.05, dt)
    ref = np.asarray(hp.transfer_grad_fused(F0, a0, prep2, fc))
    kk_lean = _k2_vag_variant(C, nb_p, G, bs_pad, R_g, "lean")
    Fr0, ar0 = hp._rep_params2(F0[None], a0[None], prep2)
    got = np.asarray(hp._unpack_A2(kk_lean(
        prep2["g0"], prep2["g2"], fc, prep2["dc"], Fr0[0], ar0[0]
    )[:, None], 1, prep2))
    rel = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-30))
    print(f"[vag2] lean-vs-prod max rel diff {rel:.2e}", flush=True)

    for mode in ("not", "lean"):
        kk = _k2_vag_variant(C, nb_p, G, bs_pad, R_g, mode)

        def call(F, a, g0, g2, dc, fc_, kk=kk):
            p2 = _p2(g0, g2, dc)
            Fr, ar = hp._rep_params2(F[None], a[None], p2)
            return kk(g0, g2, fc_, dc, Fr[0], ar[0])

        t_of(f"vag_{mode}", call)


if __name__ == "__main__":
    main()

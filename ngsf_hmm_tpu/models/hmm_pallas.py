"""Pallas TPU kernels for the blocked linear-space HMM passes.

The XLA blocked kernels (hmm_blocked.py) cut sequential depth to
O(sqrt S) but still pay ~2-3us of XLA loop overhead per scan step (the
carry round-trips HBM every step). These kernels keep every carry
resident in VMEM and stream only the per-site emission/distance slabs,
driving the per-step cost to ~0.1us -- the whole forward product over
100k sites runs in well under a millisecond on a v5e.

Data layout ("lanes" layout): the (block j, individual n) pair is
flattened into one lane axis L = nb * N (l = j * N + n), giving streamed
slabs of shape [bs, 1, L] whose trailing dims match TPU tiling rules.
Within a lane, a grid step i advances every block's within-block site i
simultaneously (the same re-association as hmm_blocked.py; reference
recursion shared/HMM.cpp:6-60). Emissions are LINEAR space with pad
sites (e = 1, d = 0) as exact no-ops; per-step max renormalisation keeps
float32 in range, with scale logs accumulated for the likelihood.

Kernel inventory:
  _k_block_transfer: grid (bs,)  per-block transfer products A + scale logs
  _k_block_combine:  grid (1,)   cross-block fwd/bwd pass: block starts,
                                 block ends, ll_f, ll_b
  _k_bw_sites:       grid (bs,)  reversed stream emitting per-site bw
  _k_fw_post:        grid (bs,)  forward stream emitting the IBD posterior
  _k_block_transfer_grad: grid (bs,)  fused transfer products + (F, alpha)
                                 forward-mode tangents (the 2-launch
                                 value-and-grad; no per-site bw needed)

Public API mirrors hmm_blocked's linear functions and is validated
against them (tests/test_hmm_pallas.py); on non-TPU backends the kernels
run in interpreter mode so CPU CI exercises identical code.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30


def _imap_fwd(i):
    """Stream index map; explicit i32 so the map stays legal under
    jax_enable_x64 (bare 0s trace as i64 and Mosaic rejects the map)."""
    z = jnp.int32(0)
    return (i, z, z)


def _imap_rev(bs):
    def imap(i):
        z = jnp.int32(0)
        return (jnp.int32(bs - 1) - i, z, z)

    return imap


def _full(*shape):
    """Whole-array VMEM block with an explicit i32 zero index map (the
    default map pallas builds uses bare ints -> i64 under x64)."""

    def imap(i):
        z = jnp.int32(0)
        return (z,) * len(shape)

    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _interpret():
    return jax.default_backend() != "tpu"


def _t_elems(F, a, d):
    x = jnp.exp(-a * d)
    onem = 1.0 - x
    t00 = onem * (1.0 - F) + x
    t01 = onem * F
    t10 = onem * (1.0 - F)
    t11 = onem * F + x
    return t00, t01, t10, t11


# ---------------------------------------------------------------------------
# layout prep
# ---------------------------------------------------------------------------


LANE_MAX = 32768  # cap on L = nb * N: the ladder kernel holds 5 scratch
                  # arrays of [B=8, L] f32 in VMEM (5*8*L*4 <= ~5MB)


def pick_block_size(S, N=1):
    """Grid steps are ~free here; prefer wider lanes (smaller nb) than the
    XLA-blocked sqrt split, but (a) keep nb >= 8 so the lane axis stays
    wide, and (b) cap nb*N at LANE_MAX so the line-search ladder kernel's
    VMEM scratch fits (observed OOM at 1M sites x 100 ind otherwise)."""
    import math

    S = max(S, 1)
    bs = max(64, int(math.sqrt(2.0 * S)))
    # the VMEM cap is hard: at huge N (> LANE_MAX/8 individuals) nb
    # degrades below 8 rather than blowing the scratch budget
    nb_max = max(1, LANE_MAX // max(N, 1))
    bs = max(bs, -(-S // nb_max))  # ceil(S / nb_max)
    return min(bs, S)


def prepare_inputs(e_prob_log, dist, bs=None):
    """(e_prob_log [S, N, 2], dist [S]) -> dict of streamed slabs.

    e0/e1: [bs, 1, L] linear emissions; d: [bs, 1, L] distances repeated
    per individual. Pad sites: e = 1, d = 0 (identity transitions).
    """
    S, N = e_prob_log.shape[0], e_prob_log.shape[1]
    if bs is None:
        bs = pick_block_size(S, N)
    nb = -(-S // bs)
    L = nb * N
    pad = nb * bs - S

    e_lin = jnp.exp(e_prob_log)
    if pad:
        e_lin = jnp.pad(e_lin, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
        d = jnp.pad(dist, (0, pad), constant_values=0.0)
    else:
        d = dist
    # [nb*bs, N, k] -> [nb, bs, N, k] -> [bs, nb, N, k] -> [bs, 1, L]
    e_lin = jnp.swapaxes(e_lin.reshape(nb, bs, N, 2), 0, 1)
    f32 = jnp.float32  # kernels are f32 (scaled-linear is f32-safe)
    e0 = e_lin[..., 0].reshape(bs, 1, L).astype(f32)
    e1 = e_lin[..., 1].reshape(bs, 1, L).astype(f32)
    d = jnp.swapaxes(d.reshape(nb, bs), 0, 1)  # [bs, nb]
    d = jnp.repeat(d, N, axis=-1).reshape(bs, 1, L).astype(f32)
    return dict(e0=e0, e1=e1, d=d, S=S, N=N, bs=bs, nb=nb, L=L)


def _rep_params(F, alpha, nb):
    """[B, N] -> [B, L] lane-repeated parameter arrays (f32)."""
    f32 = jnp.float32
    return (
        jnp.tile(F, (1, nb)).astype(f32),
        jnp.tile(alpha, (1, nb)).astype(f32),
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _k_block_transfer(B, L, bs):
    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, out_ref,
               c00, c01, c10, c11, off):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            c00[:] = jnp.ones((B, L), jnp.float32)
            c01[:] = jnp.zeros((B, L), jnp.float32)
            c10[:] = jnp.zeros((B, L), jnp.float32)
            c11[:] = jnp.ones((B, L), jnp.float32)
            off[:] = jnp.zeros((B, L), jnp.float32)

        e0, e1, d = e0_ref[0], e1_ref[0], d_ref[0]
        t00, t01, t10, t11 = _t_elems(Fr_ref[:], ar_ref[:], d)
        m00 = t00 * e0
        m01 = t01 * e1
        m10 = t10 * e0
        m11 = t11 * e1
        n00 = c00[:] * m00 + c01[:] * m10
        n01 = c00[:] * m01 + c01[:] * m11
        n10 = c10[:] * m00 + c11[:] * m10
        n11 = c10[:] * m01 + c11[:] * m11
        mx = jnp.maximum(jnp.maximum(n00, n01), jnp.maximum(n10, n11))
        mx = jnp.maximum(mx, _TINY)
        inv = 1.0 / mx
        c00[:] = n00 * inv
        c01[:] = n01 * inv
        c10[:] = n10 * inv
        c11[:] = n11 * inv
        off[:] = off[:] + jnp.log(mx)

        @pl.when(i == bs - 1)
        def _():
            out_ref[0] = c00[:]
            out_ref[1] = c01[:]
            out_ref[2] = c10[:]
            out_ref[3] = c11[:]
            out_ref[4] = off[:]

    stream = lambda: pl.BlockSpec(
        (1, 1, L), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((5, B, L), jnp.float32),
        grid=(bs,),
        in_specs=[stream(), stream(), stream(),
                  _full(B, L), _full(B, L)],
        out_specs=_full(5, B, L),
        scratch_shapes=[pltpu.VMEM((B, L), jnp.float32)] * 5,
        interpret=_interpret(),
    )


def _k_block_combine(B, N, nb):
    """Single-program cross-block pass over A_r [nb, 5, B, N].

    Outputs: starts [nb, 2, B, N] (fwd vector entering each block),
    ends [nb, 2, B, N] (bwd vector at each block's last site),
    lls [2, B, N] = (ll_f, ll_b).
    """

    def kernel(A_ref, F_ref, starts_ref, ends_ref, lls_ref):
        q1 = F_ref[:]  # [B, N]
        q0 = 1.0 - q1

        def fwd(j, carry):
            v0, v1, off = carry
            starts_ref[j, 0] = v0
            starts_ref[j, 1] = v1
            a = A_ref[j]  # [5, B, N]
            r0 = v0 * a[0] + v1 * a[2]
            r1 = v0 * a[1] + v1 * a[3]
            m = jnp.maximum(jnp.maximum(r0, r1), _TINY)
            inv = 1.0 / m
            return (r0 * inv, r1 * inv, off + jnp.log(m) + a[4])

        # i32 loop bounds: under jax_enable_x64 bare Python ints give the
        # loop an i64 counter, which Mosaic fails to legalize
        lo, hi = jnp.int32(0), jnp.int32(nb)
        z = jnp.zeros((B, N), jnp.float32)
        v0, v1, off = jax.lax.fori_loop(lo, hi, fwd, (q0, q1, z))
        lls_ref[0] = jnp.log(v0 + v1) + off

        def bwd(t, carry):
            # jnp.int32: under jax_enable_x64 the bare Python constant
            # traces as i64 and Mosaic rejects the i64-i32 subtraction
            j = jnp.int32(nb - 1) - t
            w0, w1, off = carry
            ends_ref[j, 0] = w0
            ends_ref[j, 1] = w1
            a = A_ref[j]
            r0 = a[0] * w0 + a[1] * w1
            r1 = a[2] * w0 + a[3] * w1
            m = jnp.maximum(jnp.maximum(r0, r1), _TINY)
            inv = 1.0 / m
            return (r0 * inv, r1 * inv, off + jnp.log(m) + a[4])

        o = jnp.ones((B, N), jnp.float32)
        w0, w1, off = jax.lax.fori_loop(lo, hi, bwd, (o, o, z))
        lls_ref[1] = jnp.log(q0 * w0 + q1 * w1) + off

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb, 2, B, N), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2, B, N), jnp.float32),
            jax.ShapeDtypeStruct((2, B, N), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=_interpret(),
    )


def _k_bw_sites(B, L, bs):
    """Reversed stream: emit the per-site backward vector (linear,
    max-normalised per site), both states, as [bs, 2, B?, L]... stored
    [bs, 1, L] per state with B folded into separate outputs when B>1 is
    not needed (gradient/posterior paths run at B = 1)."""
    assert B == 1

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, ends0_ref, ends1_ref,
               bw0_ref, bw1_ref, w0s, w1s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            w0s[:] = ends0_ref[:]
            w1s[:] = ends1_ref[:]

        # carry entering step i is bw at site (bs-1-i); emit it
        bw0_ref[0] = w0s[:]
        bw1_ref[0] = w1s[:]
        e0, e1, d = e0_ref[0], e1_ref[0], d_ref[0]
        t00, t01, t10, t11 = _t_elems(Fr_ref[:], ar_ref[:], d)
        b0 = t00 * e0 * w0s[:] + t01 * e1 * w1s[:]
        b1 = t10 * e0 * w0s[:] + t11 * e1 * w1s[:]
        m = jnp.maximum(jnp.maximum(b0, b1), _TINY)
        inv = 1.0 / m
        w0s[:] = b0 * inv
        w1s[:] = b1 * inv

    rev = lambda: pl.BlockSpec(
        (1, 1, L), _imap_rev(bs), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bs, 1, L), jnp.float32),
            jax.ShapeDtypeStruct((bs, 1, L), jnp.float32),
        ),
        grid=(bs,),
        in_specs=[rev(), rev(), rev()] + [_full(1, L)] * 4,
        out_specs=(rev(), rev()),
        scratch_shapes=[pltpu.VMEM((1, L), jnp.float32)] * 2,
        interpret=_interpret(),
    )


def _k_block_transfer_grad(L, bs):
    """ONE stream -> per-block transfer products AND their forward-mode
    (F, alpha) tangents, sharing the primal's per-step normalisation.

    Maintains c = M_prod/gamma, D_F = dM_prod/dF/gamma, D_a =
    dM_prod/dalpha/gamma with the SAME running scale gamma (each step
    divides primal and tangents by the primal's max), so downstream
    Fisher-identity ratios [v . D . w] / [v . c . w] equal the true
    dll/dtheta block terms with every scale cancelling (the per-site
    form of the same identity is hmm.loglik_value_and_grad; the
    per-chunk host form is streaming._grad_from_transfers).

    Output [13, 1, L]: c(4 rows), D_F(4), D_a(4), off(1).
    This single launch replaces the round-1 4-launch pipeline
    (block_transfer -> combine -> bw_sites -> fw_grad): the gradient no
    longer needs per-site backward vectors at all, so the emission slabs
    are read ONCE per evaluation and nothing site-sized is written.
    """

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, out_ref, c_s, DF_s,
               Da_s, off_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ident = jnp.stack(
                [jnp.ones((1, L), jnp.float32), jnp.zeros((1, L), jnp.float32),
                 jnp.zeros((1, L), jnp.float32), jnp.ones((1, L), jnp.float32)]
            )
            c_s[:] = ident
            DF_s[:] = jnp.zeros((4, 1, L), jnp.float32)
            Da_s[:] = jnp.zeros((4, 1, L), jnp.float32)
            off_s[:] = jnp.zeros((1, L), jnp.float32)

        e0, e1, d = e0_ref[0], e1_ref[0], d_ref[0]
        F, a = Fr_ref[:], ar_ref[:]
        x = jnp.exp(-a * d)
        onem = 1.0 - x
        # d = inf at chromosome breaks: x = 0 there, d*x must be 0
        dxp = jnp.where(x > 0.0, d * x, 0.0)

        m00 = (onem * (1.0 - F) + x) * e0
        m01 = (onem * F) * e1
        m10 = (onem * (1.0 - F)) * e0
        m11 = (onem * F + x) * e1
        # dm/dF  (dt00 = -onem, dt01 = +onem, dt10 = -onem, dt11 = +onem)
        oe0 = onem * e0
        oe1 = onem * e1
        # dm/dalpha (dt00 = -F d x, dt01 = +F d x,
        #            dt10 = +(1-F) d x, dt11 = -(1-F) d x)
        fd = F * dxp
        gd = (1.0 - F) * dxp

        c00, c01, c10, c11 = c_s[0], c_s[1], c_s[2], c_s[3]
        n00 = c00 * m00 + c01 * m10
        n01 = c00 * m01 + c01 * m11
        n10 = c10 * m00 + c11 * m10
        n11 = c10 * m01 + c11 * m11

        DF00, DF01, DF10, DF11 = DF_s[0], DF_s[1], DF_s[2], DF_s[3]
        nF00 = DF00 * m00 + DF01 * m10 + c00 * (-oe0) + c01 * (-oe0)
        nF01 = DF00 * m01 + DF01 * m11 + c00 * oe1 + c01 * oe1
        nF10 = DF10 * m00 + DF11 * m10 + c10 * (-oe0) + c11 * (-oe0)
        nF11 = DF10 * m01 + DF11 * m11 + c10 * oe1 + c11 * oe1

        Da00, Da01, Da10, Da11 = Da_s[0], Da_s[1], Da_s[2], Da_s[3]
        na00 = Da00 * m00 + Da01 * m10 + c00 * (-fd * e0) + c01 * (gd * e0)
        na01 = Da00 * m01 + Da01 * m11 + c00 * (fd * e1) + c01 * (-gd * e1)
        na10 = Da10 * m00 + Da11 * m10 + c10 * (-fd * e0) + c11 * (gd * e0)
        na11 = Da10 * m01 + Da11 * m11 + c10 * (fd * e1) + c11 * (-gd * e1)

        mx = jnp.maximum(jnp.maximum(n00, n01), jnp.maximum(n10, n11))
        mx = jnp.maximum(mx, _TINY)
        inv = 1.0 / mx
        c_s[0], c_s[1], c_s[2], c_s[3] = (
            n00 * inv, n01 * inv, n10 * inv, n11 * inv
        )
        DF_s[0], DF_s[1], DF_s[2], DF_s[3] = (
            nF00 * inv, nF01 * inv, nF10 * inv, nF11 * inv
        )
        Da_s[0], Da_s[1], Da_s[2], Da_s[3] = (
            na00 * inv, na01 * inv, na10 * inv, na11 * inv
        )
        off_s[:] = off_s[:] + jnp.log(mx)

        @pl.when(i == bs - 1)
        def _():
            out_ref[0:4] = c_s[:]
            out_ref[4:8] = DF_s[:]
            out_ref[8:12] = Da_s[:]
            out_ref[12] = off_s[:]

    stream = lambda: pl.BlockSpec(
        (1, 1, L), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((13, 1, L), jnp.float32),
        grid=(bs,),
        in_specs=[stream(), stream(), stream(),
                  _full(1, L), _full(1, L)],
        out_specs=_full(13, 1, L),
        scratch_shapes=[
            pltpu.VMEM((4, 1, L), jnp.float32),
            pltpu.VMEM((4, 1, L), jnp.float32),
            pltpu.VMEM((4, 1, L), jnp.float32),
            pltpu.VMEM((1, L), jnp.float32),
        ],
        interpret=_interpret(),
    )


def _k_fw_post(L, bs):
    """Forward stream emitting the per-site IBD posterior
    p1 = fw1 bw1 / (fw0 bw0 + fw1 bw1)."""

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, starts0_ref,
               starts1_ref, bw0_ref, bw1_ref, p_ref, v0s, v1s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            v0s[:] = starts0_ref[:]
            v1s[:] = starts1_ref[:]

        e0, e1, d = e0_ref[0], e1_ref[0], d_ref[0]
        t00, t01, t10, t11 = _t_elems(Fr_ref[:], ar_ref[:], d)
        n0 = (v0s[:] * t00 + v1s[:] * t10) * e0
        n1 = (v0s[:] * t01 + v1s[:] * t11) * e1
        m = jnp.maximum(jnp.maximum(n0, n1), _TINY)
        minv = 1.0 / m
        v0s[:] = n0 * minv
        v1s[:] = n1 * minv
        x0 = v0s[:] * bw0_ref[0]
        x1 = v1s[:] * bw1_ref[0]
        p_ref[0] = x1 / jnp.maximum(x0 + x1, _TINY)

    stream = lambda: pl.BlockSpec(
        (1, 1, L), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs, 1, L), jnp.float32),
        grid=(bs,),
        in_specs=[stream(), stream(), stream()]
        + [_full(1, L)] * 4
        + [stream(), stream()],
        out_specs=stream(),
        scratch_shapes=[pltpu.VMEM((1, L), jnp.float32)] * 2,
        interpret=_interpret(),
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _block_pipeline(F, alpha, prep):
    """Shared A + cross-block pass. F/alpha [B, N]."""
    F = jnp.asarray(F, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    B, N, nb, bs, L = F.shape[0], prep["N"], prep["nb"], prep["bs"], prep["L"]
    Fr, ar = _rep_params(F, alpha, nb)
    A = _k_block_transfer(B, L, bs)(prep["e0"], prep["e1"], prep["d"], Fr, ar)
    # [5, B, L] -> [nb, 5, B, N] for per-block access
    A_r = jnp.transpose(A.reshape(5, B, nb, N), (2, 0, 1, 3))
    starts, ends, lls = _k_block_combine(B, N, nb)(A_r, F)
    return starts, ends, lls, (Fr, ar)


def forward_loglik_pallas(F, alpha, prep):
    """Per-individual loglik; F/alpha [B, N] (B = line-search candidates).
    Returns [B, N]."""
    _, _, lls, _ = _block_pipeline(F, alpha, prep)
    return lls[0]


def _bw_sites(F, alpha, prep, ends, reps):
    nb, N, bs, L = prep["nb"], prep["N"], prep["bs"], prep["L"]
    Fr, ar = reps
    # ends [nb, 2, 1, N] -> [1, L] per state
    e0 = jnp.transpose(ends[:, 0], (1, 0, 2)).reshape(1, L)
    e1 = jnp.transpose(ends[:, 1], (1, 0, 2)).reshape(1, L)
    return _k_bw_sites(1, L, bs)(
        prep["e0"], prep["e1"], prep["d"], Fr, ar, e0, e1
    )


def _starts_flat(starts, prep):
    L = prep["L"]
    s0 = jnp.transpose(starts[:, 0], (1, 0, 2)).reshape(1, L)
    s1 = jnp.transpose(starts[:, 1], (1, 0, 2)).reshape(1, L)
    return s0, s1


def loglik_value_and_grad_pallas(F, alpha, prep):
    """(ll, dL/dF, dL/dalpha), each [N]; F/alpha [N].

    TWO launches: the fused transfer+tangent stream
    (_k_block_transfer_grad, one pass over the emission slabs, nothing
    site-sized written) and the tiny cross-block combine; the gradient
    assembles from per-block Fisher-identity ratios
      dll/dtheta = sum_j [v_j . dM_j . w_j] / [v_j . M_j . w_j]
    plus the initial-distribution dq/dF term on block 0 (round 1's
    4-launch bw-materialising pipeline is gone)."""
    N, nb, bs, L = prep["N"], prep["nb"], prep["bs"], prep["L"]
    f32 = jnp.float32
    F2, a2 = F[None, :].astype(f32), alpha[None, :].astype(f32)
    Fr, ar = _rep_params(F2, a2, nb)
    out = _k_block_transfer_grad(L, bs)(
        prep["e0"], prep["e1"], prep["d"], Fr, ar
    )
    # [13, 1, L] -> [nb, 13, 1, N] per-block blocks
    A_r = jnp.transpose(out.reshape(13, 1, nb, N), (2, 0, 1, 3))
    A_prim = jnp.concatenate([A_r[:, 0:4], A_r[:, 12:13]], axis=1)
    starts, ends, lls = _k_block_combine(1, N, nb)(A_prim, F2)

    v0, v1 = starts[:, 0, 0], starts[:, 1, 0]  # [nb, N] entering block j
    w0, w1 = ends[:, 0, 0], ends[:, 1, 0]  # [nb, N] at block j's end
    T = A_r[:, 0:4, 0]  # [nb, 4, N] (c, shared normalisation with D)
    DF = A_r[:, 4:8, 0]
    Da = A_r[:, 8:12, 0]

    def quad(M):
        return v0 * (M[:, 0] * w0 + M[:, 1] * w1) + v1 * (
            M[:, 2] * w0 + M[:, 3] * w1
        )

    inv = 1.0 / jnp.maximum(quad(T), _TINY)
    gF = (quad(DF) * inv).sum(0)
    ga = (quad(Da) * inv).sum(0)

    # Initial-distribution term (block 0): X_k = (T_0 . w_0)_k,
    # d log(q . X)/dF with dq/dF = (-1, +1); scales cancel in the ratio.
    X0 = T[0, 0] * w0[0] + T[0, 1] * w1[0]
    X1 = T[0, 2] * w0[0] + T[0, 3] * w1[0]
    q1 = F2[0]
    tot = (1.0 - q1) * X0 + q1 * X1
    gF = gF + (X1 - X0) / jnp.maximum(tot, _TINY)
    return lls[0, 0], gF, ga


def posteriors_pallas(F, alpha, prep):
    """(p_ibd [S, N], ll_f [N], ll_b [N]); F/alpha [N]."""
    N, nb, bs, L, S = prep["N"], prep["nb"], prep["bs"], prep["L"], prep["S"]
    F2, a2 = F[None, :], alpha[None, :]
    starts, ends, lls, reps = _block_pipeline(F2, a2, prep)
    bw0, bw1 = _bw_sites(F2, a2, prep, ends, reps)
    s0, s1 = _starts_flat(starts, prep)
    p = _k_fw_post(L, bs)(
        prep["e0"], prep["e1"], prep["d"], reps[0], reps[1], s0, s1, bw0, bw1
    )
    # [bs, 1, L] -> [S, N]
    p = jnp.swapaxes(p.reshape(bs, nb, N), 0, 1).reshape(nb * bs, N)[:S]
    return p, lls[0, 0], lls[1, 0]

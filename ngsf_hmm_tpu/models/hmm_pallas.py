"""Pallas TPU kernels for the blocked linear-space HMM passes.

The XLA blocked kernels (hmm_blocked.py) cut sequential depth to
O(sqrt S) but still pay ~2-3us of XLA loop overhead per scan step (the
carry round-trips HBM every step). These kernels keep every carry
resident in VMEM and stream only the per-site emission/distance slabs.

Data layout ("lanes" layout): the (block j, individual n) pair is
flattened into one lane axis L = nb * N (l = j * N + n), then L is
padded and folded into a (8, C) sublane x lane tile (l = sub * C + c) so
every vector op runs on full (8, 128) native tiles -- a flat [1, L]
layout would use 1 of 8 sublanes and cap the VPU at 12.5%. Streamed
slabs are [bs_pad, 8, C]; a grid step advances R consecutive sites of
every block at once (R rows per DMA), amortising the per-step grid +
DMA-latency overhead that dominates [1, ...]-row streams (measured
~5us/step at 1M x 100 against ~0.5us of HBM traffic). Within a lane,
grid steps advance every block's within-block site simultaneously (the
same re-association as hmm_blocked.py; reference recursion
shared/HMM.cpp:6-60). Emissions are LINEAR space with pad sites
(e = 1, d = 0) as exact no-op transfers; pad lanes are sliced away on
unpack.

f32 range safety: instead of dividing the carries by their per-site max
and accumulating log(max) (a transcendental + a division per site),
every site's carry is rescaled by an exact power of two derived from the
max's EXPONENT FIELD (bitcast >> 23), and the integer exponents are
summed; the final offset is exponent_sum * ln2 with the residual
mantissa left in the carry. Power-of-two scaling is exact in binary
floating point, so this is both cheaper and rounding-free; the carry
magnitude stays in [1, 2) x residual instead of exactly 1.

Kernel inventory:
  _k_block_transfer: grid (bs_pad/R,) per-block transfer products A +
                                 exponent-sum scale offsets
  _k_block_combine:  grid (1,)   cross-block fwd/bwd pass: block starts,
                                 block ends, ll_f, ll_b
  _k_bw_sites:       grid (bs_pad/R,) reversed stream emitting per-site bw
  _k_fw_post:        grid (bs_pad/R,) forward stream emitting the IBD
                                 posterior
  _k_block_transfer_grad: grid (bs_pad/R,) fused transfer products +
                                 (F, alpha) forward-mode tangents (the
                                 2-launch value-and-grad; no per-site bw
                                 needed)

Public API mirrors hmm_blocked's linear functions and is validated
against them (tests/test_hmm_pallas.py); on non-TPU backends the kernels
run in interpreter mode so CPU CI exercises identical code paths.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30
_LN2 = 0.6931471805599453


def _imap_fwd(i):
    """Stream index map; explicit i32 so the map stays legal under
    jax_enable_x64 (bare 0s trace as i64 and Mosaic rejects the map)."""
    z = jnp.int32(0)
    return (i, z, z)


def _imap_rev(nsteps):
    def imap(i):
        z = jnp.int32(0)
        return (jnp.int32(nsteps - 1) - i, z, z)

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


# The XLA default scoped-vmem cap is 16MB; the v5e core has 128MB of
# VMEM. The streamed kernels trade VMEM headroom for fewer, larger DMAs
# (R rows per grid step), so raise the ceiling for them.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _t_elems(F, a, d):
    x = jnp.exp(-a * d)
    onem = 1.0 - x
    t00 = onem * (1.0 - F) + x
    t01 = onem * F
    t10 = onem * (1.0 - F)
    t11 = onem * F + x
    return t00, t01, t10, t11


def _pow2_rescale(mx):
    """(scale, exponent): scale = 2^-e with e = floor(log2(mx)), both
    derived from mx's f32 exponent field. Multiplying the carries by
    `scale` is EXACT; summing `exponent` (as f32 counts, integers up to
    ~2^24 are exact) replaces the per-site log accumulation."""
    i32 = jnp.int32
    bits = jax.lax.bitcast_convert_type(mx, i32)
    full = jnp.full(mx.shape, i32(23), i32)
    exb = jax.lax.shift_right_logical(bits, full)  # biased exponent, 0..254
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(i32(254) - exb, full), jnp.float32
    )
    return scale, (exb - i32(127)).astype(jnp.float32)


def _mat_mul4(a, b):
    """2x2 row-major products, elementwise over any leading dims."""
    a00, a01, a10, a11 = a
    b00, b01, b10, b11 = b
    return (
        a00 * b00 + a01 * b10,
        a00 * b01 + a01 * b11,
        a10 * b00 + a11 * b10,
        a10 * b01 + a11 * b11,
    )


def _add4(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _max4(m):
    return jnp.maximum(jnp.maximum(m[0], m[1]), jnp.maximum(m[2], m[3]))


def _tree_product(m):
    """Ordered product of R site matrices by pairwise tree reduction.

    m: 4-tuple of [R, ...] arrays (site-major). Each tree level combines
    adjacent pairs VECTORIZED over the halved site axis -- the serial
    per-site chain has only log2(R) sequential matrix products, and all
    elementwise work runs on full-width tiles. A power-of-two rescale
    per level (instead of per site) keeps f32 in range: entries are
    bounded by ~2 per matrix, and one level halves the dynamic range
    budget, so per-level rescaling bounds magnitudes just as tightly.

    Returns (4-tuple of [...] product, exponent total [...]).
    """
    ex_tot = None
    while m[0].shape[0] > 1:
        # pair adjacent sites via reshape + static index (a [0::2] stride
        # would lower to a gather, which Mosaic supports only in 2D)
        k = m[0].shape[0] // 2
        pairs = tuple(x.reshape(k, 2, *x.shape[1:]) for x in m)
        a = tuple(x[:, 0] for x in pairs)
        b = tuple(x[:, 1] for x in pairs)
        q = _mat_mul4(a, b)
        mx = jnp.maximum(_max4(q), _TINY)
        sc, ex = _pow2_rescale(mx)
        m = tuple(x * sc for x in q)
        e = ex.sum(0)
        ex_tot = e if ex_tot is None else ex_tot + e
    prod = tuple(x[0] for x in m)
    if ex_tot is None:
        ex_tot = jnp.zeros_like(prod[0])
    return prod, ex_tot


def _tree_product_grad(mA, mF, ma):
    """Tree product with (F, alpha) forward-mode tangents via the
    product rule d(AB) = dA.B + A.dB at every pair combine; tangents
    share the primal's per-level rescale so downstream Fisher ratios
    cancel every scale."""
    ex_tot = None
    while mA[0].shape[0] > 1:
        k = mA[0].shape[0] // 2
        pr = lambda x: x.reshape(k, 2, *x.shape[1:])
        aA = tuple(pr(x)[:, 0] for x in mA)
        bA = tuple(pr(x)[:, 1] for x in mA)
        aF = tuple(pr(x)[:, 0] for x in mF)
        bF = tuple(pr(x)[:, 1] for x in mF)
        aa = tuple(pr(x)[:, 0] for x in ma)
        ba = tuple(pr(x)[:, 1] for x in ma)
        qA = _mat_mul4(aA, bA)
        qF = _add4(_mat_mul4(aF, bA), _mat_mul4(aA, bF))
        qa = _add4(_mat_mul4(aa, bA), _mat_mul4(aA, ba))
        mx = jnp.maximum(_max4(qA), _TINY)
        sc, ex = _pow2_rescale(mx)
        mA = tuple(x * sc for x in qA)
        mF = tuple(x * sc for x in qF)
        ma = tuple(x * sc for x in qa)
        e = ex.sum(0)
        ex_tot = e if ex_tot is None else ex_tot + e
    out = tuple(x[0] for x in mA + mF + ma)
    if ex_tot is None:
        ex_tot = jnp.zeros_like(out[0])
    return out[0:4], out[4:8], out[8:12], ex_tot


# ---------------------------------------------------------------------------
# layout prep
# ---------------------------------------------------------------------------


LANE_MAX = 32768  # cap on L = nb * N. Wider lanes shrink the grid, but
                  # streamed slabs are [R, 8, L/8], so lane width trades
                  # directly against sites/step (R) under the per-kernel
                  # VMEM budget (_rows_for); per-candidate carries
                  # ([B, 8, C] each) also scale with L on the B>1
                  # candidate-batch path.

SLAB_MAF_LANES = 24000  # tighter v2 C cap so the slab est_maf kernel's
                        # ~15 hoisted [RB=8, 8, C] coefficient planes fit
                        # its 88 MB VMEM budget (ops/maf_pallas.py
                        # slab_geom_ok: C <= 88 MiB / (15*8*8*4) = 24030).
                        # Without it the depth-balancing nb_p pick pushes
                        # C past the budget at wide N (N=1000, S=1M ->
                        # C=32000) and silently disables the slab route,
                        # forcing the tiles fallback and its full-size gl
                        # copy. Binding only when G*128 ranges above it
                        # (N >~ 380 at the sqrt split) -- geometry at the
                        # benched N <= 100 shapes is unchanged.

_SUB = 8          # sublane fold of the lane axis
_LANE_TILE = 8 * 128  # L padded to a multiple of one (8, 128) tile
_R_PAD = 64       # bs_pad multiple: every kernel's R (a power of two
                  # <= _R_PAD) divides it, so one slab layout serves
                  # kernels running DIFFERENT sites-per-step
_STREAM_VMEM = 64 << 20  # per-kernel budget for R-scaled VMEM arrays
                         # (streams double-buffered + leaf/tree work);
                         # the v5e core has 128MB, _CPARAMS caps 100MB


def pick_block_size(S, N=1):
    """Grid steps are cheap here; prefer wider lanes (smaller nb) than
    the XLA-blocked sqrt split, but (a) keep nb >= 8 so the lane axis
    stays wide, and (b) cap nb*N at LANE_MAX so the streamed slabs keep
    a useful sites-per-step under the VMEM budget (see LANE_MAX)."""
    import math

    S = max(S, 1)
    bs = max(64, int(math.sqrt(2.0 * S)))
    # the VMEM cap is hard: at huge N (> LANE_MAX/8 individuals) nb
    # degrades below 8 rather than blowing the scratch budget
    nb_max = max(1, LANE_MAX // max(N, 1))
    bs = max(bs, -(-S // nb_max))  # ceil(S / nb_max)
    return min(bs, S)


def _rows_for(Lp, copies, bs_pad, env_key=None):
    """Sites per grid step for ONE kernel: the largest power of two
    <= _R_PAD whose `copies` live [R, 8, C] f32 arrays (double-buffered
    streamed blocks + leaf/tree working set, counted by the caller) fit
    the stream VMEM budget. Fewer grid steps amortise the fixed
    per-step cost (grid dispatch + DMA latency + the cross-step carry
    combine), which dominated the old one-size R: at 1M x 100 the
    6-stream worst case forced R = 4 -> 765 steps per launch.

    env_key: probe override (NGSF_PALLAS_R_<KEY>, then NGSF_PALLAS_R).
    """
    import os

    for k in ((f"NGSF_PALLAS_R_{env_key}",) if env_key else ()) + (
        "NGSF_PALLAS_R",
    ):
        v = os.environ.get(k)
        if v:
            return max(1, min(int(v), bs_pad, _R_PAD))
    R = _R_PAD
    while R > 1 and copies * R * Lp * 4 > _STREAM_VMEM:
        R //= 2
    return min(R, bs_pad)


def _geom(S, N, bs):
    nb = -(-S // bs)
    L = nb * N
    Lp = -(-L // _LANE_TILE) * _LANE_TILE
    C = Lp // _SUB
    bs_pad = -(-bs // _R_PAD) * _R_PAD
    # prep["R"] is kept for layout compatibility/reporting only; each
    # kernel wrapper picks its own sites-per-step via _rows_for
    R = min(_R_PAD, bs_pad)
    return nb, L, Lp, C, R, bs_pad


def _to_slab(rows, bs, bs_pad, L, Lp, pad_value):
    """[bs, L] -> [bs_pad, 8, C] with pad rows/lanes = pad_value."""
    rows = jnp.pad(
        rows, ((0, bs_pad - bs), (0, Lp - L)), constant_values=pad_value
    )
    return rows.reshape(bs_pad, _SUB, Lp // _SUB)


def _lane_fold(flat, L, Lp, pad_value):
    """[B, L] -> [B, 8, C]."""
    B = flat.shape[0]
    flat = jnp.pad(flat, ((0, 0), (0, Lp - L)), constant_values=pad_value)
    return flat.reshape(B, _SUB, Lp // _SUB)


def _lane_unfold(folded, L):
    """[..., 8, C] -> [..., L]."""
    return folded.reshape(*folded.shape[:-2], -1)[..., :L]


def emission_slabs(e_lin, bs):
    """[S, N, 2] LINEAR emissions -> (e0, e1) streamed slabs
    [bs_pad, 8, C]. Pad sites/lanes: e = 1 (identity, exact no-op)."""
    S, N = e_lin.shape[0], e_lin.shape[1]
    nb, L, Lp, C, R, bs_pad = _geom(S, N, bs)
    pad = nb * bs - S
    if pad:
        e_lin = jnp.pad(e_lin, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
    # [nb*bs, N, k] -> [nb, bs, N, k] -> [bs, nb, N] -> [bs, L] -> slab
    e_lin = jnp.swapaxes(e_lin.reshape(nb, bs, N, 2), 0, 1)
    f32 = jnp.float32  # kernels are f32 (scaled-linear is f32-safe)
    e0 = _to_slab(e_lin[..., 0].reshape(bs, L).astype(f32),
                  bs, bs_pad, L, Lp, 1.0)
    e1 = _to_slab(e_lin[..., 1].reshape(bs, L).astype(f32),
                  bs, bs_pad, L, Lp, 1.0)
    return e0, e1


def dist_slab(dist, N, bs):
    """[S] distances -> [bs_pad, 8, C] slab (repeated per individual,
    constant across EM iterations -- build once, thread through).
    Pad sites/lanes: d = 0 (identity transitions)."""
    S = dist.shape[0]
    nb, L, Lp, C, R, bs_pad = _geom(S, N, bs)
    pad = nb * bs - S
    if pad:
        dist = jnp.pad(dist, (0, pad), constant_values=0.0)
    d = jnp.swapaxes(dist.reshape(nb, bs), 0, 1)  # [bs, nb]
    d = jnp.repeat(d, N, axis=-1).reshape(bs, L).astype(jnp.float32)
    return _to_slab(d, bs, bs_pad, L, Lp, 0.0)


def make_prep(e0, e1, d, S, N, bs):
    """Assemble the prep dict from already-laid-out slabs plus the
    statically-known geometry (S, N, bs must match the slabs' layout).
    Lets callers thread loop-invariant slabs (d) and fused emission
    slabs through jit boundaries without retracing on the int fields."""
    nb, L, Lp, C, R, bs_pad = _geom(S, N, bs)
    return dict(e0=e0, e1=e1, d=d, S=S, N=N, bs=bs, nb=nb, L=L,
                Lp=Lp, C=C, R=R, bs_pad=bs_pad)


def prepare_inputs(e_prob_log, dist, bs=None):
    """(e_prob_log [S, N, 2], dist [S]) -> dict of streamed slabs.

    e0/e1: [bs_pad, 8, C] linear emissions; d: same-shaped distances
    repeated per individual. Pad sites/lanes: e = 1, d = 0 (identity
    transitions, exact no-ops).
    """
    S, N = e_prob_log.shape[0], e_prob_log.shape[1]
    if bs is None:
        bs = pick_block_size(S, N)
    e0, e1 = emission_slabs(jnp.exp(e_prob_log), bs)
    d = dist_slab(dist, N, bs)
    return make_prep(e0, e1, d, S, N, bs)


def _rep_params(F, alpha, prep):
    """[B, N] -> [B, 8, C] lane-repeated parameter arrays (f32).
    Pad lanes get F = 0.5, a = 1 (pad sites have d = 0, so transitions
    are identity for ANY finite parameters; these just avoid inf/nan)."""
    nb, L, Lp = prep["nb"], prep["L"], prep["Lp"]
    f32 = jnp.float32
    return (
        _lane_fold(jnp.tile(F, (1, nb)).astype(f32), L, Lp, 0.5),
        _lane_fold(jnp.tile(alpha, (1, nb)).astype(f32), L, Lp, 1.0),
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _k_block_transfer(B, C, bs_pad, R):
    nsteps = bs_pad // R

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, out_ref,
               c00, c01, c10, c11, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            c00[:] = jnp.ones((B, _SUB, C), jnp.float32)
            c01[:] = jnp.zeros((B, _SUB, C), jnp.float32)
            c10[:] = jnp.zeros((B, _SUB, C), jnp.float32)
            c11[:] = jnp.ones((B, _SUB, C), jnp.float32)
            acc[:] = jnp.zeros((B, _SUB, C), jnp.float32)

        e0, e1, d = e0_ref[:], e1_ref[:], d_ref[:]  # (R, 8, C)
        for b in range(B):  # static; candidate chains are independent
            F, a = Fr_ref[b], ar_ref[b]
            t00, t01, t10, t11 = _t_elems(F, a, d)  # broadcast over R
            m = (t00 * e0, t01 * e1, t10 * e0, t11 * e1)
            g, ex_t = _tree_product(m)
            n = _mat_mul4((c00[b], c01[b], c10[b], c11[b]), g)
            mx = jnp.maximum(_max4(n), _TINY)
            sc, ex = _pow2_rescale(mx)
            c00[b] = n[0] * sc
            c01[b] = n[1] * sc
            c10[b] = n[2] * sc
            c11[b] = n[3] * sc
            acc[b] = acc[b] + ex + ex_t

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[0] = c00[:]
            out_ref[1] = c01[:]
            out_ref[2] = c10[:]
            out_ref[3] = c11[:]
            out_ref[4] = acc[:] * _LN2

    stream = lambda: pl.BlockSpec(
        (R, _SUB, C), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((5, B, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[stream(), stream(), stream(),
                  _full(B, _SUB, C), _full(B, _SUB, C)],
        out_specs=_full(5, B, _SUB, C),
        scratch_shapes=[pltpu.VMEM((B, _SUB, C), jnp.float32)] * 5,
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def _comb(a, b):
    """Rescaled 2x2 product combine for the cross-block scans."""
    a4, ae = a
    b4, be = b
    c = _mat_mul4(a4, b4)
    mx = jnp.maximum(_max4(c), _TINY)
    sc, ex = _pow2_rescale(mx)
    return (tuple(x * sc for x in c), ae + be + ex * _LN2)


def _comb_rev(a, b):
    # reverse=True folds elements in reversed index order, so the
    # matrix product must be flipped to keep suffixes in FORWARD
    # site order: suf[j] = A_j . A_{j+1} ... A_{nb-1}
    a4, ae = a
    b4, be = b
    c = _mat_mul4(b4, a4)
    mx = jnp.maximum(_max4(c), _TINY)
    sc, ex = _pow2_rescale(mx)
    return (tuple(x * sc for x in c), ae + be + ex * _LN2)


def _combine_blocks(A_r, F, v0=None, wT=None):
    """Cross-block pass as PLAIN XLA associative scans (no kernel): the
    per-block transfer products compose under the same rescaled 2x2
    product as _tree_product, so the nb-long sequential chain becomes a
    log2(nb)-depth prefix scan (forward) + suffix scan (backward),
    vectorized over (B, N) -- the serial fori version ran two nb-step
    loops of (B, N)-shaped ops, which dominated at nb ~ several hundred.

    A_r [nb, 5, B, N] (4 product entries + log-offset); F [B, N].
    v0 / wT [B, N, 2]: boundary carries when these blocks are one
    site-shard of a longer chain (parallel/site_sharded.py) -- the
    normalised forward vector entering block 0 and backward vector at
    the last block's last site. Defaults ((1-F, F), ones) make this the
    whole chain. With carries the returned lls are SHARD-LOCAL values
    (normalisation of the carries drops the other shards' scales);
    sharded callers take the global likelihood from the transfer-product
    gather instead and posterior/gradient ratios cancel every scale.
    Returns (starts [nb, 2, B, N]: fwd vector entering each block,
    ends [nb, 2, B, N]: bwd vector at each block's last site,
    lls [2, B, N] = (ll_f, ll_b)).
    """
    mats = (A_r[:, 0], A_r[:, 1], A_r[:, 2], A_r[:, 3])
    offs = A_r[:, 4]

    pre4, pre_off = jax.lax.associative_scan(_comb, (mats, offs))
    suf4, suf_off = jax.lax.associative_scan(_comb_rev, (mats, offs),
                                             reverse=True)

    if v0 is None:
        q1 = jnp.asarray(F, jnp.float32)
        q0 = 1.0 - q1
    else:
        q0 = jnp.asarray(v0[..., 0], jnp.float32)
        q1 = jnp.asarray(v0[..., 1], jnp.float32)
    if wT is None:
        w0 = w1 = None
    else:
        w0 = jnp.asarray(wT[..., 0], jnp.float32)
        w1 = jnp.asarray(wT[..., 1], jnp.float32)

    # fwd vector entering block j: v0 . (A_0 ... A_{j-1}); block 0 gets v0
    s0 = q0[None] * pre4[0] + q1[None] * pre4[2]  # [nb, B, N] (inclusive)
    s1 = q0[None] * pre4[1] + q1[None] * pre4[3]
    starts0 = jnp.concatenate([q0[None], s0[:-1]])
    starts1 = jnp.concatenate([q1[None], s1[:-1]])

    # bwd vector at block j's END: (A_{j+1} ... A_{nb-1}) . wT
    if w0 is None:
        e0 = suf4[0] + suf4[1]  # [nb, B, N] (inclusive from the right)
        e1 = suf4[2] + suf4[3]
        last0 = jnp.ones_like(e0[:1])
        last1 = jnp.ones_like(e1[:1])
        ll_f = jnp.log(s0[-1] + s1[-1]) + pre_off[-1]
    else:
        e0 = suf4[0] * w0[None] + suf4[1] * w1[None]
        e1 = suf4[2] * w0[None] + suf4[3] * w1[None]
        last0 = w0[None]
        last1 = w1[None]
        ll_f = jnp.log(s0[-1] * w0 + s1[-1] * w1) + pre_off[-1]
    ends0 = jnp.concatenate([e0[1:], last0])
    ends1 = jnp.concatenate([e1[1:], last1])
    ll_b = jnp.log(q0 * e0[0] + q1 * e1[0]) + suf_off[0]

    starts = jnp.stack([starts0, starts1], axis=1)
    ends = jnp.stack([ends0, ends1], axis=1)
    lls = jnp.stack([ll_f, ll_b])
    return starts, ends, lls


def _k_bw_sites(C, bs_pad, R):
    """Reversed stream: emit the per-site backward vector (linear,
    rescaled; the posterior consumes bw only through the scale-invariant
    ratio fw1*bw1 / (fw0*bw0 + fw1*bw1), and both states share every
    rescale, so no offset bookkeeping is needed)."""
    nsteps = bs_pad // R

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, ends0_ref, ends1_ref,
               bw0_ref, bw1_ref, w0s, w1s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            w0s[:] = ends0_ref[:]
            w1s[:] = ends1_ref[:]

        F, a = Fr_ref[:], ar_ref[:]
        e0, e1, d = e0_ref[:], e1_ref[:], d_ref[:]  # (R, 8, C)
        t00, t01, t10, t11 = _t_elems(F, a, d)  # vectorized over R
        k00 = t00 * e0
        k01 = t01 * e1
        k10 = t10 * e0
        k11 = t11 * e1
        w0, w1 = w0s[:], w1s[:]
        out0, out1 = [], []
        for r in range(R - 1, -1, -1):  # static unroll, 2-vector carry
            # carry entering this site is bw at the site; emit it
            out0.append(w0)
            out1.append(w1)
            b0 = k00[r] * w0 + k01[r] * w1
            b1 = k10[r] * w0 + k11[r] * w1
            mx = jnp.maximum(jnp.maximum(b0, b1), _TINY)
            sc, _ = _pow2_rescale(mx)
            w0 = b0 * sc
            w1 = b1 * sc
        # ONE vector store per grid step (per-site ref stores both defeat
        # Mosaic vectorisation and blow up interpret-mode XLA compiles)
        bw0_ref[:] = jnp.stack(out0[::-1])
        bw1_ref[:] = jnp.stack(out1[::-1])
        w0s[:] = w0
        w1s[:] = w1

    rev = lambda: pl.BlockSpec(
        (R, _SUB, C), _imap_rev(nsteps), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bs_pad, _SUB, C), jnp.float32),
            jax.ShapeDtypeStruct((bs_pad, _SUB, C), jnp.float32),
        ),
        grid=(nsteps,),
        in_specs=[rev(), rev(), rev()] + [_full(_SUB, C)] * 4,
        out_specs=(rev(), rev()),
        scratch_shapes=[pltpu.VMEM((_SUB, C), jnp.float32)] * 2,
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def _k_block_transfer_grad(C, bs_pad, R):
    """ONE stream -> per-block transfer products AND their forward-mode
    (F, alpha) tangents, sharing the primal's per-step rescale.

    Maintains c = M_prod/gamma, D_F = dM_prod/dF/gamma, D_a =
    dM_prod/dalpha/gamma with the SAME running scale gamma (each step
    rescales primal and tangents by the primal max's power-of-two), so
    downstream Fisher-identity ratios [v . D . w] / [v . c . w] equal
    the true dll/dtheta block terms with every scale cancelling (the
    per-site form of the same identity is hmm.loglik_value_and_grad; the
    per-chunk host form is streaming._grad_from_transfers).

    Output [13, 8, C]: c(4 rows), D_F(4), D_a(4), off(1).
    This single launch replaces the round-1 4-launch pipeline
    (block_transfer -> combine -> bw_sites -> fw_grad): the gradient no
    longer needs per-site backward vectors at all, so the emission slabs
    are read ONCE per evaluation and nothing site-sized is written.
    """
    nsteps = bs_pad // R

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, out_ref, c_s, DF_s,
               Da_s, off_s):
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
        e0, e1, d = e0_ref[:], e1_ref[:], d_ref[:]  # (R, 8, C)
        x = jnp.exp(-a * d)
        onem = 1.0 - x
        # d = inf at chromosome breaks: x = 0 there, d*x must be 0
        dxp = jnp.where(x > 0.0, d * x, 0.0)
        oe0 = onem * e0
        oe1 = onem * e1
        fd = F * dxp
        gd = (1.0 - F) * dxp
        # per-site M, dM/dF, dM/dalpha (row-major 2x2), all [R, 8, C]
        mA = (
            (onem * (1.0 - F) + x) * e0,
            (onem * F) * e1,
            (onem * (1.0 - F)) * e0,
            (onem * F + x) * e1,
        )
        mF = (-oe0, oe1, -oe0, oe1)
        mda = (-fd * e0, fd * e1, gd * e0, -gd * e1)
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

    stream = lambda: pl.BlockSpec(
        (R, _SUB, C), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((13, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[stream(), stream(), stream(),
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


def _k_fw_post(C, bs_pad, R):
    """Forward stream emitting the per-site IBD posterior
    p1 = fw1 bw1 / (fw0 bw0 + fw1 bw1)."""
    nsteps = bs_pad // R

    def kernel(e0_ref, e1_ref, d_ref, Fr_ref, ar_ref, starts0_ref,
               starts1_ref, bw0_ref, bw1_ref, p_ref, v0s, v1s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            v0s[:] = starts0_ref[:]
            v1s[:] = starts1_ref[:]

        F, a = Fr_ref[:], ar_ref[:]
        e0, e1, d = e0_ref[:], e1_ref[:], d_ref[:]  # (R, 8, C)
        t00, t01, t10, t11 = _t_elems(F, a, d)  # vectorized over R
        k00 = t00 * e0
        k10 = t10 * e0
        k01 = t01 * e1
        k11 = t11 * e1
        bw0, bw1 = bw0_ref[:], bw1_ref[:]
        v0, v1 = v0s[:], v1s[:]
        fw0, fw1 = [], []
        for r in range(R):  # static unroll, 2-vector carry
            n0 = v0 * k00[r] + v1 * k10[r]
            n1 = v0 * k01[r] + v1 * k11[r]
            mx = jnp.maximum(jnp.maximum(n0, n1), _TINY)
            sc, _ = _pow2_rescale(mx)
            v0 = n0 * sc
            v1 = n1 * sc
            fw0.append(v0)
            fw1.append(v1)
        # posterior math vectorized over R; ONE store per grid step
        x0 = jnp.stack(fw0) * bw0
        x1 = jnp.stack(fw1) * bw1
        p_ref[:] = x1 / jnp.maximum(x0 + x1, _TINY)
        v0s[:] = v0
        v1s[:] = v1

    stream = lambda: pl.BlockSpec(
        (R, _SUB, C), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[stream(), stream(), stream()]
        + [_full(_SUB, C)] * 4
        + [stream(), stream()],
        out_specs=stream(),
        scratch_shapes=[pltpu.VMEM((_SUB, C), jnp.float32)] * 2,
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _unpack_A(A, B, prep):
    """[K, B, 8, C] -> [nb, K, B, N] per-block view."""
    K = A.shape[0]
    nb, N, L = prep["nb"], prep["N"], prep["L"]
    flat = _lane_unfold(A, L)  # [K, B, L]
    return jnp.transpose(flat.reshape(K, B, nb, N), (2, 0, 1, 3))


def block_transfers_pallas(F, alpha, prep):
    """Per-block transfer products for [B, N] params: ONE streamed pass.

    Returns (A_r [nb, 5, B, N] (4 rescaled product entries + log-offset
    row), reps): the raw material for fold_transfers_pallas /
    _combine_blocks; reps are the lane-folded params, reused by the
    per-site posterior kernels."""
    F = jnp.asarray(F, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    B = F.shape[0]
    C, bs_pad = prep["C"], prep["bs_pad"]
    # live R-arrays: 3 streams double-buffered + per-candidate leaf m(4)
    # and tree temps(4) (transient across the static b loop)
    R = _rows_for(prep["Lp"], 14, bs_pad, "TRANSFER")
    Fr, ar = _rep_params(F, alpha, prep)
    A = _k_block_transfer(B, C, bs_pad, R)(
        prep["e0"], prep["e1"], prep["d"], Fr, ar
    )
    return _unpack_A(A, B, prep), (Fr, ar)


def fold_transfers_pallas(A_r):
    """[nb, 5, B, N] block products -> the whole-slab transfer product
    (T [B, N, 2, 2] rescaled row-major, s [B, N] log scale): the
    quantity site-sharded runs all_gather to assemble the global chain
    (parallel/site_sharded._gather_chain; blocked-linear analog is
    hmm_blocked.fold_transfer_lin)."""
    mats = (A_r[:, 0], A_r[:, 1], A_r[:, 2], A_r[:, 3])
    offs = A_r[:, 4]
    pre4, pre_off = jax.lax.associative_scan(_comb, (mats, offs))
    T = jnp.stack([x[-1] for x in pre4], axis=-1)  # [B, N, 4]
    return T.reshape(*T.shape[:-1], 2, 2), pre_off[-1]


def _block_pipeline(F, alpha, prep, v0=None, wT=None, A_reps=None):
    """Shared A + cross-block pass. F/alpha [B, N]; v0/wT [B, N, 2]
    optional shard boundary carries (see _combine_blocks)."""
    F = jnp.asarray(F, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    if A_reps is None:
        A_reps = block_transfers_pallas(F, alpha, prep)
    A_r, reps = A_reps
    starts, ends, lls = _combine_blocks(A_r, F, v0, wT)
    return starts, ends, lls, reps


def forward_loglik_pallas(F, alpha, prep):
    """Per-individual loglik; F/alpha [B, N] (B = line-search candidates).
    Returns [B, N]."""
    _, _, lls, _ = _block_pipeline(F, alpha, prep)
    return lls[0]


def _ends_fold(vecs, prep):
    """[nb, 2, 1, N] block vectors -> two [8, C] lane-folded arrays."""
    L, Lp = prep["L"], prep["Lp"]
    f0 = jnp.transpose(vecs[:, 0], (1, 0, 2)).reshape(1, L)
    f1 = jnp.transpose(vecs[:, 1], (1, 0, 2)).reshape(1, L)
    return (
        _lane_fold(f0, L, Lp, 0.5)[0],
        _lane_fold(f1, L, Lp, 0.5)[0],
    )


def _bw_sites(prep, ends, reps):
    C, bs_pad = prep["C"], prep["bs_pad"]
    # 3 in-streams + 2 out-streams double-buffered + k(4) + out stacks(2)
    R = _rows_for(prep["Lp"], 16, bs_pad, "BW")
    Fr, ar = reps
    e0, e1 = _ends_fold(ends, prep)
    return _k_bw_sites(C, bs_pad, R)(
        prep["e0"], prep["e1"], prep["d"], Fr[0], ar[0], e0, e1
    )


def transfer_grad_pallas(F, alpha, prep):
    """ONE fused stream -> per-block transfer products AND their (F,
    alpha) forward-mode tangents: A_g [nb, 13, 1, N] (rows 0:4 primal,
    4:8 dF, 8:12 dalpha, 12 log-offset; tangents share the primal's
    rescale). F/alpha [N]."""
    C, bs_pad = prep["C"], prep["bs_pad"]
    # 3 streams double-buffered + leaf mA/mF/mda(12) + tree temps(12)
    R = _rows_for(prep["Lp"], 30, bs_pad, "GRAD")
    f32 = jnp.float32
    F2, a2 = F[None, :].astype(f32), alpha[None, :].astype(f32)
    Fr, ar = _rep_params(F2, a2, prep)
    out = _k_block_transfer_grad(C, bs_pad, R)(
        prep["e0"], prep["e1"], prep["d"], Fr[0], ar[0]
    )
    return _unpack_A(out[:, None], 1, prep)


def fold_primal_pallas(A_g):
    """transfer_grad_pallas output -> the slab's primal transfer product
    (T [N, 2, 2], s [N]) for the cross-shard gather."""
    A_prim = jnp.concatenate([A_g[:, 0:4], A_g[:, 12:13]], axis=1)
    T, s = fold_transfers_pallas(A_prim)
    return T[0], s[0]


def fold_grad_pallas(A_g):
    """transfer_grad_pallas output -> the slab transfer product AND its
    (F, alpha) tangents, folded to one matrix each: (T [N, 2, 2],
    s [N], D_F [N, 2, 2], D_a [N, 2, 2]).

    The tangents share T's rescale (product rule at every combine, the
    scan analog of _tree_product_grad), so a consumer's Fisher ratio
    [v . D . w] / [v . T . w] equals the true d log-scale-free term with
    every normalisation cancelling -- the streamed host chain passes
    these as (dT, ds=0) to its _grad_from_transfers assembly."""
    mats = (A_g[:, 0], A_g[:, 1], A_g[:, 2], A_g[:, 3])
    dF = (A_g[:, 4], A_g[:, 5], A_g[:, 6], A_g[:, 7])
    da = (A_g[:, 8], A_g[:, 9], A_g[:, 10], A_g[:, 11])
    offs = A_g[:, 12]

    def comb(a, b):
        a4, aF, aa, ae = a
        b4, bF, ba, be = b
        c = _mat_mul4(a4, b4)
        cF = _add4(_mat_mul4(aF, b4), _mat_mul4(a4, bF))
        ca = _add4(_mat_mul4(aa, b4), _mat_mul4(a4, ba))
        mx = jnp.maximum(_max4(c), _TINY)
        sc, ex = _pow2_rescale(mx)
        return (
            tuple(x * sc for x in c),
            tuple(x * sc for x in cF),
            tuple(x * sc for x in ca),
            ae + be + ex * _LN2,
        )

    pre4, preF, prea, pre_off = jax.lax.associative_scan(
        comb, (mats, dF, da, offs)
    )

    def last22(t4):
        m = jnp.stack([x[-1] for x in t4], axis=-1)  # [B, N, 4]
        return m.reshape(*m.shape[:-1], 2, 2)

    B_ax = pre_off.shape[1]
    assert B_ax == 1
    return (
        last22(pre4)[0],
        pre_off[-1, 0],
        last22(preF)[0],
        last22(prea)[0],
    )


def grad_from_carries_pallas(A_g, F, v0=None, wT=None, with_init_term=1.0):
    """Fisher-identity (ll_local, dL/dF, dL/dalpha) from the fused
    stream's block tangents, each [N].

    v0/wT [N, 2]: shard boundary carries (None = whole chain, where
    ll_local IS the chain loglik). with_init_term: traced 0/1 weight on
    the initial-distribution dq/dF term -- the whole chain's site 0
    belongs to shard 0 only (q is baked into its v0, so the term's
    algebra is unchanged there).

      dll/dtheta = sum_j [v_j . dM_j . w_j] / [v_j . M_j . w_j]
    """
    F2 = jnp.asarray(F, jnp.float32)[None, :]
    A_prim = jnp.concatenate([A_g[:, 0:4], A_g[:, 12:13]], axis=1)
    v0b = None if v0 is None else v0[None]
    wTb = None if wT is None else wT[None]
    starts, ends, lls = _combine_blocks(A_prim, F2, v0b, wTb)

    v0_, v1_ = starts[:, 0, 0], starts[:, 1, 0]  # [nb, N] entering block j
    w0_, w1_ = ends[:, 0, 0], ends[:, 1, 0]  # [nb, N] at block j's end
    T = A_g[:, 0:4, 0]  # [nb, 4, N] (c, shared normalisation with D)
    DF = A_g[:, 4:8, 0]
    Da = A_g[:, 8:12, 0]

    def quad(M):
        return v0_ * (M[:, 0] * w0_ + M[:, 1] * w1_) + v1_ * (
            M[:, 2] * w0_ + M[:, 3] * w1_
        )

    inv = 1.0 / jnp.maximum(quad(T), _TINY)
    gF = (quad(DF) * inv).sum(0)
    ga = (quad(Da) * inv).sum(0)

    # Initial-distribution term (block 0): X_k = (T_0 . w_0)_k,
    # d log(q . X)/dF with dq/dF = (-1, +1); scales cancel in the ratio.
    X0 = T[0, 0] * w0_[0] + T[0, 1] * w1_[0]
    X1 = T[0, 2] * w0_[0] + T[0, 3] * w1_[0]
    q1 = F2[0]
    tot = (1.0 - q1) * X0 + q1 * X1
    gF = gF + with_init_term * (X1 - X0) / jnp.maximum(tot, _TINY)
    return lls[0, 0], gF, ga


def loglik_value_and_grad_pallas(F, alpha, prep):
    """(ll, dL/dF, dL/dalpha), each [N]; F/alpha [N].

    TWO launches: the fused transfer+tangent stream
    (_k_block_transfer_grad, one pass over the emission slabs, nothing
    site-sized written) and the tiny cross-block combine; the gradient
    assembles from per-block Fisher-identity ratios plus the
    initial-distribution dq/dF term on block 0."""
    A_g = transfer_grad_pallas(F, alpha, prep)
    return grad_from_carries_pallas(A_g, F)


# ===========================================================================
# v2: GL-fused kernels ("gl layout")
#
# The v1 kernels stream per-cell EMISSION slabs (e0, e1: 8 B/cell) plus a
# per-cell distance slab (4 B/cell) that repeats each site's distance once
# per individual. Rebuilding the emission slabs whenever freq changes is a
# full [S, N, 2] relayout (~25 ms/EM-iteration at 1M x 100; 90% of every
# streamed chunk-pass at 10M x 100, round-3 VERDICT Weak #1).
#
# v2 changes the lane fold so that per-SITE quantities stream as N x
# smaller compacts, and computes emissions IN-KERNEL from the genotype
# likelihoods (reference math: shared/HMM.cpp:144-154 + the HWE priors of
# gen_func.cpp:938-957 folded into linear space):
#
#   lane fold:  individual n -> (octet g = n // 8 -> lane group,
#                                sublane  = n % 8)
#               block j      -> lane j within each group
#               cell (row r, sub, lane g*nb_p + j); C = G * nb_p
#   streams:    gl0, gl2 slabs   [bs_pad, 8, C]   (8 B/cell, built ONCE
#               per run -- gl is constant; gl1 = 1 - gl0 - gl2 because
#               readers normalise the linear GLs to sum 1)
#               freq/dist compacts [bs_pad, 1, nb_p] (4 B/SITE: broadcast
#               across sublanes + tiled across lane groups in VMEM)
#   pad rule:   pad sites AND pad lanes carry freq = 2.0 (a sentinel:
#               emissions forced to exactly 1) and d = 0 (identity
#               transitions), so pads are exact no-ops regardless of the
#               gl pad bytes.
#
# Emissions never depend on (F, alpha), so the gradient algebra of the
# fused transfer+tangent kernel is unchanged. The cross-block combines,
# folds and Fisher assembly are layout-independent ([nb, K, B, N] after
# unpack) and shared with v1.
# ===========================================================================


_HET_FLOOR = 1e-15  # linear het floor, calc_HWE F==1 (gen_func.cpp:946-956)


def pick_geom2(S, N):
    """(bs, nb_p) for the v2 layout: nb_p is a multiple of 128 near the
    depth-balancing sqrt(S/2) split, capped so C = G * nb_p stays within
    min(LANE_MAX, SLAB_MAF_LANES) lanes (the tighter slab-est_maf VMEM
    cap only binds at wide N; see SLAB_MAF_LANES)."""
    import math

    S = max(S, 1)
    G = -(-max(N, 1) // _SUB)
    cap = min(LANE_MAX, SLAB_MAF_LANES)
    nb_t = max(128, int(round(math.sqrt(S / 2.0) / 128.0)) * 128)
    while G * nb_t > cap and nb_t > 128:
        nb_t -= 128
    bs = max(-(-S // nb_t), 1)
    return bs, nb_t


def _geom2(S, N, bs, nb_p):
    nb = -(-S // bs)
    if nb > nb_p:
        raise ValueError(f"nb {nb} exceeds nb_p {nb_p}")
    G = -(-N // _SUB)
    Np = G * _SUB
    C = G * nb_p
    bs_pad = -(-bs // _R_PAD) * _R_PAD
    return nb, G, Np, C, bs_pad


def gl_slabs(gl_lin, bs, nb_p, dtype=jnp.float32):
    """[S, N, 3] LINEAR gls -> (gl0, gl2) [bs_pad, 8, C] v2 slabs.

    Built once per run (gl is constant across EM iterations). Pad cells
    get 1/3 (any finite value works: the freq-compact sentinel forces
    pad emissions to 1).

    dtype: slab storage dtype. jnp.bfloat16 HALVES the slabs' HBM
    footprint and every v2 pass's dominant stream bytes (XLA stores
    [*, 8, C] bf16 unpadded -- measured via compile memory_analysis);
    kernels upcast to f32 at load, so only the gl INPUT is quantised
    (~2^-9 relative). The whole chain math stays f32."""
    S, N = gl_lin.shape[0], gl_lin.shape[1]
    nb, G, Np, C, bs_pad = _geom2(S, N, bs, nb_p)
    f32 = jnp.float32

    def one(ch):
        x = gl_lin[..., ch].astype(f32)  # [S, N]
        x = jnp.pad(x, ((0, nb * bs - S), (0, Np - N)),
                    constant_values=1.0 / 3.0)
        x = jnp.swapaxes(x.reshape(nb, bs, Np), 0, 1)  # [bs, nb, Np]
        x = jnp.pad(x, ((0, bs_pad - bs), (0, nb_p - nb), (0, 0)),
                    constant_values=1.0 / 3.0)
        # [bs_pad, nb_p, G, 8] -> [bs_pad, 8, G, nb_p] -> [bs_pad, 8, C]
        x = x.reshape(bs_pad, nb_p, G, _SUB)
        x = jnp.transpose(x, (0, 3, 2, 1)).reshape(bs_pad, _SUB, C)
        return x.astype(dtype)

    return one(0), one(2)


def site_compact(vec, bs, nb_p, pad_value, valid=None):
    """[S] per-site vector -> [bs_pad, 1, nb_p] v2 compact slab.

    valid: sites >= valid (before padding) also get pad_value -- the
    streaming engine's last-chunk masking."""
    S = vec.shape[0]
    f32 = jnp.float32
    nb = -(-S // bs)
    bs_pad = -(-bs // _R_PAD) * _R_PAD
    x = vec.astype(f32)
    if valid is not None:
        x = jnp.where(jnp.arange(S) >= valid, f32(pad_value), x)
    x = jnp.pad(x, (0, nb * bs - S), constant_values=pad_value)
    x = jnp.swapaxes(x.reshape(nb, bs), 0, 1)  # [bs, nb]
    x = jnp.pad(x, ((0, bs_pad - bs), (0, nb_p - nb)),
                constant_values=pad_value)
    return x[:, None, :]


def make_prep2(g0, g2, dc, S, N, bs, nb_p):
    """prep2 dict from laid-out slabs + static geometry (thread slabs
    through jit boundaries without retracing on the int fields)."""
    nb, G, Np, C, bs_pad = _geom2(S, N, bs, nb_p)
    return dict(g0=g0, g2=g2, dc=dc, S=S, N=N, bs=bs, nb=nb, nb_p=nb_p,
                G=G, Np=Np, C=C, bs_pad=bs_pad)


def prepare_gl_inputs(gl_lin, dist, bs=None, nb_p=None,
                      gl_dtype=jnp.float32):
    """(gl_lin [S, N, 3] LINEAR, dist [S]) -> prep2 dict. Run-constant:
    build once, thread everywhere. freq enters separately per iteration
    via freq_compact. gl_dtype: slab storage dtype (gl_slabs
    docstring; jnp.bfloat16 halves slab HBM + stream bytes)."""
    S, N = gl_lin.shape[0], gl_lin.shape[1]
    if bs is None or nb_p is None:
        bs, nb_p = pick_geom2(S, N)
    g0, g2 = gl_slabs(gl_lin, bs, nb_p, dtype=gl_dtype)
    dc = site_compact(jnp.asarray(dist), bs, nb_p, 0.0)
    return make_prep2(g0, g2, dc, S, N, bs, nb_p)


def freq_compact(freq, prep2, valid=None):
    """Per-iteration freq -> compact slab; pad sentinel 2.0 forces pad
    emissions to exactly 1 (identity together with d = 0)."""
    return site_compact(jnp.asarray(freq), prep2["bs"], prep2["nb_p"],
                        2.0, valid=valid)


def _emit2(g0, g2, fc, dc, G):
    """In-kernel emission prologue: (e0, e1, d) full-width from the gl
    slab blocks [R, 8, C] + compact blocks [R, 1, nb_p].

    e_k = sum_g gl_g * P(g | f, F=k) with state-0 HWE and state-1 full-
    IBD priors (HMM.cpp:144-154, gen_func.cpp:938-957); gl1 reconstructed
    from normalisation. The sentinel f > 1 marks pad cells -> e = 1.

    The priors depend on the SITE only, so they are evaluated once as
    [R, 1, nb_p] coefficient compacts (pad sites folded in: zeroed
    prior coefficients + a one indicator, so pad e == 1 exactly
    regardless of the gl pad bytes) and applied per lane group with
    sublane-broadcast FMAs -- ~9 full-width VPU ops per cell instead of
    ~17 for the former full-width prior evaluation; this prologue is
    paid by EVERY v2 chain/posterior/tangent pass."""
    R_ = fc.shape[0]
    nbp = fc.shape[2]
    f = fc
    pad = f > 1.0
    zero = jnp.zeros_like(f)
    one = jnp.ones_like(f)
    one_m = 1.0 - f
    pq = one_m * f
    i0 = jnp.where(pad, one, zero)
    pr0 = jnp.where(pad, zero, one_m * one_m)
    pq2 = jnp.where(pad, zero, 2.0 * pq)
    pr2 = jnp.where(pad, zero, f * f)
    s10 = jnp.where(pad, zero, pr0 + pq)
    het = jnp.where(pad, zero, jnp.full_like(f, _HET_FLOOR))
    s12 = jnp.where(pad, zero, pr2 + pq)
    parts0, parts1 = [], []
    f32 = jnp.float32
    for g in range(G):
        sl = (slice(None), slice(None), slice(g * nbp, (g + 1) * nbp))
        # bf16 slabs upcast per lane-group slice (keeps the f32 VMEM
        # peak at one group, not the whole block); no-op for f32
        g0g, g2g = g0[sl].astype(f32), g2[sl].astype(f32)
        g1g = 1.0 - g0g - g2g
        parts0.append(i0 + g0g * pr0 + g1g * pq2 + g2g * pr2)
        parts1.append(i0 + g0g * s10 + g1g * het + g2g * s12)
    e0 = jnp.concatenate(parts0, axis=2)
    e1 = jnp.concatenate(parts1, axis=2)
    d = jnp.tile(jnp.broadcast_to(dc, (R_, _SUB, nbp)), (1, 1, G))
    return e0, e1, d


def _spec2_full(R, C):
    return pl.BlockSpec((R, _SUB, C), _imap_fwd, memory_space=pltpu.VMEM)


def _spec2_compact(R, nb_p):
    return pl.BlockSpec((R, 1, nb_p), _imap_fwd, memory_space=pltpu.VMEM)


def _k2_block_transfer(B, C, nb_p, G, bs_pad, R):
    """v2 analog of _k_block_transfer: streams gl slabs + compacts,
    emissions in VMEM."""
    nsteps = bs_pad // R

    def kernel(g0_ref, g2_ref, fc_ref, dc_ref, Fr_ref, ar_ref, out_ref,
               c00, c01, c10, c11, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            c00[:] = jnp.ones((B, _SUB, C), jnp.float32)
            c01[:] = jnp.zeros((B, _SUB, C), jnp.float32)
            c10[:] = jnp.zeros((B, _SUB, C), jnp.float32)
            c11[:] = jnp.ones((B, _SUB, C), jnp.float32)
            acc[:] = jnp.zeros((B, _SUB, C), jnp.float32)

        e0, e1, d = _emit2(g0_ref[:], g2_ref[:], fc_ref[:], dc_ref[:], G)
        for b in range(B):  # static; candidate chains are independent
            F, a = Fr_ref[b], ar_ref[b]
            t00, t01, t10, t11 = _t_elems(F, a, d)
            m = (t00 * e0, t01 * e1, t10 * e0, t11 * e1)
            g, ex_t = _tree_product(m)
            n = _mat_mul4((c00[b], c01[b], c10[b], c11[b]), g)
            mx = jnp.maximum(_max4(n), _TINY)
            sc, ex = _pow2_rescale(mx)
            c00[b] = n[0] * sc
            c01[b] = n[1] * sc
            c10[b] = n[2] * sc
            c11[b] = n[3] * sc
            acc[b] = acc[b] + ex + ex_t

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[0] = c00[:]
            out_ref[1] = c01[:]
            out_ref[2] = c10[:]
            out_ref[3] = c11[:]
            out_ref[4] = acc[:] * _LN2

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((5, B, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[_spec2_full(R, C), _spec2_full(R, C),
                  _spec2_compact(R, nb_p), _spec2_compact(R, nb_p),
                  _full(B, _SUB, C), _full(B, _SUB, C)],
        out_specs=_full(5, B, _SUB, C),
        scratch_shapes=[pltpu.VMEM((B, _SUB, C), jnp.float32)] * 5,
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def _k2_block_transfer_grad(C, nb_p, G, bs_pad, R):
    """v2 analog of _k_block_transfer_grad (fused transfer + (F, alpha)
    tangents); emissions are (F, alpha)-free so the tangent algebra is
    identical."""
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


def _k2_bw_sites(C, nb_p, G, bs_pad, R):
    """v2 reversed stream emitting the per-site backward RATIO
    r = bw1 / (bw0 + bw1) -- one slab instead of two (the posterior is
    scale-free in bw, so the ratio carries everything fw_post needs:
    p = fw1*r / (fw0*(1-r) + fw1*r); halves this pass's writes and
    fw_post's bw reads)."""
    nsteps = bs_pad // R

    def kernel(g0_ref, g2_ref, fc_ref, dc_ref, Fr_ref, ar_ref,
               ends0_ref, ends1_ref, bwr_ref, w0s, w1s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            w0s[:] = ends0_ref[:]
            w1s[:] = ends1_ref[:]

        F, a = Fr_ref[:], ar_ref[:]
        e0, e1, d = _emit2(g0_ref[:], g2_ref[:], fc_ref[:], dc_ref[:], G)
        t00, t01, t10, t11 = _t_elems(F, a, d)
        k00 = t00 * e0
        k01 = t01 * e1
        k10 = t10 * e0
        k11 = t11 * e1
        w0, w1 = w0s[:], w1s[:]
        out0, out1 = [], []
        for r in range(R - 1, -1, -1):  # static unroll, 2-vector carry
            out0.append(w0)
            out1.append(w1)
            b0 = k00[r] * w0 + k01[r] * w1
            b1 = k10[r] * w0 + k11[r] * w1
            mx = jnp.maximum(jnp.maximum(b0, b1), _TINY)
            sc, _ = _pow2_rescale(mx)
            w0 = b0 * sc
            w1 = b1 * sc
        s0 = jnp.stack(out0[::-1])
        s1 = jnp.stack(out1[::-1])
        bwr_ref[:] = s1 / jnp.maximum(s0 + s1, _TINY)
        w0s[:] = w0
        w1s[:] = w1

    rev_full = pl.BlockSpec((R, _SUB, C), _imap_rev(nsteps),
                            memory_space=pltpu.VMEM)
    rev_c = pl.BlockSpec((R, 1, nb_p), _imap_rev(nsteps),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[rev_full, rev_full, rev_c, rev_c] + [_full(_SUB, C)] * 4,
        out_specs=rev_full,
        scratch_shapes=[pltpu.VMEM((_SUB, C), jnp.float32)] * 2,
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def _k2_fw_post(C, nb_p, G, bs_pad, R):
    """v2 forward stream emitting the per-site IBD posterior from the
    backward RATIO slab: p = fw1*r / (fw0*(1-r) + fw1*r)."""
    nsteps = bs_pad // R

    def kernel(g0_ref, g2_ref, fc_ref, dc_ref, Fr_ref, ar_ref,
               starts0_ref, starts1_ref, bwr_ref, p_ref, v0s, v1s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            v0s[:] = starts0_ref[:]
            v1s[:] = starts1_ref[:]

        F, a = Fr_ref[:], ar_ref[:]
        e0, e1, d = _emit2(g0_ref[:], g2_ref[:], fc_ref[:], dc_ref[:], G)
        t00, t01, t10, t11 = _t_elems(F, a, d)
        k00 = t00 * e0
        k10 = t10 * e0
        k01 = t01 * e1
        k11 = t11 * e1
        bwr = bwr_ref[:]
        v0, v1 = v0s[:], v1s[:]
        fw0, fw1 = [], []
        for r in range(R):  # static unroll, 2-vector carry
            n0 = v0 * k00[r] + v1 * k10[r]
            n1 = v0 * k01[r] + v1 * k11[r]
            mx = jnp.maximum(jnp.maximum(n0, n1), _TINY)
            sc, _ = _pow2_rescale(mx)
            v0 = n0 * sc
            v1 = n1 * sc
            fw0.append(v0)
            fw1.append(v1)
        x0 = jnp.stack(fw0) * (1.0 - bwr)
        x1 = jnp.stack(fw1) * bwr
        p_ref[:] = x1 / jnp.maximum(x0 + x1, _TINY)
        v0s[:] = v0
        v1s[:] = v1

    full = _spec2_full(R, C)
    comp = _spec2_compact(R, nb_p)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, _SUB, C), jnp.float32),
        grid=(nsteps,),
        in_specs=[full, full, comp, comp]
        + [_full(_SUB, C)] * 4
        + [full],
        out_specs=full,
        scratch_shapes=[pltpu.VMEM((_SUB, C), jnp.float32)] * 2,
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )


def _rep_params2(F, alpha, prep2):
    """[B, N] -> [B, 8, C] v2 lane-repeated parameter arrays (f32):
    value at (sub, g*nb_p + j) = param[8g + sub] for every j."""
    G, Np, nb_p = prep2["G"], prep2["Np"], prep2["nb_p"]
    N = prep2["N"]
    f32 = jnp.float32

    def rep(x, pad_v):
        x = jnp.pad(x.astype(f32), ((0, 0), (0, Np - N)),
                    constant_values=pad_v)
        x = jnp.transpose(x.reshape(-1, G, _SUB), (0, 2, 1))  # [B, 8, G]
        return jnp.repeat(x, nb_p, axis=-1)  # [B, 8, C]

    return rep(F, 0.5), rep(alpha, 1.0)


def _unpack_A2(A, B, prep2):
    """[K, B, 8, C] -> [nb, K, B, N] per-block view (v2 lane mapping)."""
    K = A.shape[0]
    nb, G, Np, nb_p = prep2["nb"], prep2["G"], prep2["Np"], prep2["nb_p"]
    N = prep2["N"]
    x = A.reshape(K, B, _SUB, G, nb_p)
    x = jnp.transpose(x, (4, 0, 1, 3, 2))  # [nb_p, K, B, G, 8]
    return x.reshape(nb_p, K, B, Np)[:nb, :, :, :N]


def _ends_fold2(vecs, prep2):
    """[nb, 2, 1, N] block vectors -> two [8, C] v2 lane-folded arrays."""
    nb, G, Np, nb_p = prep2["nb"], prep2["G"], prep2["Np"], prep2["nb_p"]
    N = prep2["N"]
    f32 = jnp.float32

    def fold(v):  # [nb, N]
        v = jnp.pad(v.astype(f32), ((0, nb_p - nb), (0, Np - N)),
                    constant_values=0.5)
        v = jnp.transpose(v.reshape(nb_p, G, _SUB), (2, 1, 0))  # [8, G, nb_p]
        return v.reshape(_SUB, G * nb_p)

    return fold(vecs[:, 0, 0]), fold(vecs[:, 1, 0])


def pack_sites2(x, prep2, pad_value=0.0):
    """[S, N] -> [bs_pad, 8, C] v2 slab (inverse of _unpack_sites2).
    Pad cells get pad_value."""
    S, N = prep2["S"], prep2["N"]
    nb, G, Np, nb_p = prep2["nb"], prep2["G"], prep2["Np"], prep2["nb_p"]
    bs, bs_pad = prep2["bs"], prep2["bs_pad"]
    f32 = jnp.float32
    x = jnp.pad(x.astype(f32), ((0, nb * bs - S), (0, Np - N)),
                constant_values=pad_value)
    x = jnp.swapaxes(x.reshape(nb, bs, Np), 0, 1)  # [bs, nb, Np]
    x = jnp.pad(x, ((0, bs_pad - bs), (0, nb_p - nb), (0, 0)),
                constant_values=pad_value)
    x = x.reshape(bs_pad, nb_p, G, _SUB)
    return jnp.transpose(x, (0, 3, 2, 1)).reshape(bs_pad, _SUB, G * nb_p)


def _unpack_sites2(p, prep2):
    """[bs_pad, 8, C] per-site kernel output -> [S, N]."""
    nb, G, Np, nb_p = prep2["nb"], prep2["G"], prep2["Np"], prep2["nb_p"]
    S, N, bs = prep2["S"], prep2["N"], prep2["bs"]
    x = p.reshape(p.shape[0], _SUB, G, nb_p)
    x = jnp.transpose(x, (3, 0, 2, 1))  # [nb_p, bs_pad, G, 8]
    x = x.reshape(nb_p, p.shape[0], Np)[:nb, :bs, :N]
    return x.reshape(nb * bs, N)[:S]


def block_transfers_fused(F, alpha, prep2, fc):
    """v2 per-block transfer products for [B, N] params: one streamed
    pass over the gl slabs with in-kernel emissions. Returns
    (A_r [nb, 5, B, N], reps) exactly like block_transfers_pallas."""
    F = jnp.asarray(F, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    B = F.shape[0]
    C, nb_p, G, bs_pad = (prep2["C"], prep2["nb_p"], prep2["G"],
                          prep2["bs_pad"])
    Lp = _SUB * C
    # live R-arrays: 2 full streams dbl(4) + emission temps(~6) + leaf(4)
    # + tree temps(4)
    R = _rows_for(Lp, 18, bs_pad, "TRANSFER2")
    Fr, ar = _rep_params2(F, alpha, prep2)
    A = _k2_block_transfer(B, C, nb_p, G, bs_pad, R)(
        prep2["g0"], prep2["g2"], fc, prep2["dc"], Fr, ar
    )
    return _unpack_A2(A, B, prep2), (Fr, ar)


def transfer_grad_fused(F, alpha, prep2, fc):
    """v2 fused transfer+tangent stream; output as transfer_grad_pallas
    ([nb, 13, 1, N])."""
    C, nb_p, G, bs_pad = (prep2["C"], prep2["nb_p"], prep2["G"],
                          prep2["bs_pad"])
    Lp = _SUB * C
    # 2 full streams dbl(4) + emission(6) + leaf mA/mF/mda(12) + tree(12)
    R = _rows_for(Lp, 34, bs_pad, "GRAD2")
    f32 = jnp.float32
    F2, a2 = F[None, :].astype(f32), alpha[None, :].astype(f32)
    Fr, ar = _rep_params2(F2, a2, prep2)
    out = _k2_block_transfer_grad(C, nb_p, G, bs_pad, R)(
        prep2["g0"], prep2["g2"], fc, prep2["dc"], Fr[0], ar[0]
    )
    return _unpack_A2(out[:, None], 1, prep2)


def forward_loglik_fused(F, alpha, prep2, fc):
    """Per-individual loglik; F/alpha [B, N] (B = candidates)."""
    A_r, _ = block_transfers_fused(F, alpha, prep2, fc)
    _, _, lls = _combine_blocks(A_r, jnp.asarray(F, jnp.float32))
    return lls[0]


def transfer_grad_reps_fused(F, alpha, prep2, fc):
    """ONE fused transfer+tangent stream serving BOTH the E-step and
    the M-step's first evaluation (the monolithic analog of streaming's
    pass-A/f0 merge, models/streaming.py:_stream_iteration).

    Returns (A_g [nb, 13, 1, N], A_reps) where A_reps = (primal rows of
    A_g, lane-repeated params) is exactly block_transfers_fused's B=1
    output: the grad kernel's primal shares the transfer kernel's op
    order (its mA leaves are _t_elems x emissions term-for-term,
    _k2_block_transfer_grad:1227-1232, and _tree_product_grad's
    qA/rescale path is _tree_product's), so a
    posteriors_fused(A_reps=...) call reproduces the separate transfer
    pass's values while grad_from_carries_pallas(A_g, F) yields the
    M-step's first (value, gradient) with no extra stream."""
    F = jnp.asarray(F, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    A_g = transfer_grad_fused(F, alpha, prep2, fc)
    reps = _rep_params2(F[None], alpha[None], prep2)
    A_r = jnp.concatenate([A_g[:, 0:4], A_g[:, 12:13]], axis=1)
    return A_g, (A_r, reps)


def loglik_value_and_grad_fused(F, alpha, prep2, fc):
    """(ll, dL/dF, dL/dalpha), each [N]; F/alpha [N]."""
    A_g = transfer_grad_fused(F, alpha, prep2, fc)
    return grad_from_carries_pallas(A_g, F)


def posteriors_fused(F, alpha, prep2, fc, v0=None, wT=None, A_reps=None,
                     return_slab=False, return_p=True):
    """v2 (p_ibd [S, N], ll_f [N], ll_b [N]); F/alpha [N]. Same contract
    as posteriors_pallas (boundary carries for site shards / streaming
    chunks; A_reps reuse). return_slab=True appends the RAW [bs_pad, 8,
    C] posterior slab (pre-unpack) -- the slab-layout est_maf kernel
    (ops/maf_pallas.est_maf_slab) consumes it with no relayout.
    return_p=False skips the slab -> [S, N] unpack relayout entirely
    (first tuple element is then None): the streaming freq pass
    consumes ONLY the raw slab, and outside a jit nothing dead-codes
    the eager unpack."""
    C, nb_p, G, bs_pad = (prep2["C"], prep2["nb_p"], prep2["G"],
                          prep2["bs_pad"])
    Lp = _SUB * C
    F2, a2 = F[None, :], alpha[None, :]
    if A_reps is None:
        A_reps = block_transfers_fused(F2, a2, prep2, fc)
    A_r, reps = A_reps
    v0b = None if v0 is None else v0[None]
    wTb = None if wT is None else wT[None]
    starts, ends, lls = _combine_blocks(
        A_r, jnp.asarray(F2, jnp.float32), v0b, wTb
    )
    # backward per-site stream (emits the scale-free bw RATIO slab)
    R_bw = _rows_for(Lp, 20, bs_pad, "BW2")
    e0, e1 = _ends_fold2(ends, prep2)
    bwr = _k2_bw_sites(C, nb_p, G, bs_pad, R_bw)(
        prep2["g0"], prep2["g2"], fc, prep2["dc"], reps[0][0], reps[1][0],
        e0, e1
    )
    s0, s1 = _ends_fold2(starts, prep2)
    R_po = _rows_for(Lp, 22, bs_pad, "POST2")
    p = _k2_fw_post(C, nb_p, G, bs_pad, R_po)(
        prep2["g0"], prep2["g2"], fc, prep2["dc"], reps[0][0], reps[1][0],
        s0, s1, bwr
    )
    p_out = _unpack_sites2(p, prep2) if return_p else None
    if return_slab:
        return p_out, lls[0, 0], lls[1, 0], p
    return p_out, lls[0, 0], lls[1, 0]


def posteriors_pallas(F, alpha, prep, v0=None, wT=None, A_reps=None):
    """(p_ibd [S, N], ll_f [N], ll_b [N]); F/alpha [N].

    v0/wT [N, 2]: boundary carries when this slab is one site-shard of a
    longer chain (the lls are then shard-local values -- sharded callers
    use the transfer-product gather's global likelihood instead).
    A_reps: block_transfers_pallas output to reuse (one streamed
    transfer pass per EM iteration on the sharded path)."""
    N, nb, bs, S = prep["N"], prep["nb"], prep["bs"], prep["S"]
    C, bs_pad = prep["C"], prep["bs_pad"]
    # 5 in-streams + 1 out-stream double-buffered + k(4) + fw stacks(2)
    R = _rows_for(prep["Lp"], 18, bs_pad, "POST")
    F2, a2 = F[None, :], alpha[None, :]
    v0b = None if v0 is None else v0[None]
    wTb = None if wT is None else wT[None]
    starts, ends, lls, reps = _block_pipeline(
        F2, a2, prep, v0b, wTb, A_reps=A_reps
    )
    bw0, bw1 = _bw_sites(prep, ends, reps)
    s0, s1 = _ends_fold(starts, prep)
    p = _k_fw_post(C, bs_pad, R)(
        prep["e0"], prep["e1"], prep["d"], reps[0][0], reps[1][0],
        s0, s1, bw0, bw1
    )
    # [bs_pad, 8, C] -> [bs, L] -> [S, N]
    p = _lane_unfold(p, prep["L"])[:bs]
    p = jnp.swapaxes(p.reshape(bs, nb, N), 0, 1).reshape(nb * bs, N)[:S]
    return p, lls[0, 0], lls[1, 0]

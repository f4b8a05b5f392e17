"""Pallas TPU kernel for the est_maf damped fixed point.

The XLA est_maf (ops/maf.py) re-reads the full [S, N, 3] genotype-
likelihood tensor from HBM on every fixed-point pass (up to 101 passes,
~12-16ms at 100k x 32). Here sites are tiled into [N, TS] lanes: each
grid step loads its tile's GLs into VMEM ONCE and iterates the damped
fixed point (reference: gen_func.cpp:974-1009, including the
never-reset num/den accumulators, SURVEY.md S3.6b) entirely on-chip
with a per-tile early exit -- cost follows the tile's own convergence,
not the global worst site.

Roofline note: on REALISTIC low-coverage GLs the damped accumulators
step like ~freq/k at pass k, which never drops below EPSILON=1e-5
within ITER_MAX=100 -- measured on Poisson-depth-2 synthetic data,
100% of sites run all 101 passes. The kernel is therefore pure
compute: ~15 [N, TS] vector ops + 1 divide per pass (pass-invariant
planes hoisted, cd via the (2-F)+pp1*F identity), ~2.5e3 flops per
HMM cell per EM iteration -- est_maf, not fwd-bwd, is the flop
ceiling of the whole EM at scale (as in the reference, where it is
the single-threaded bottleneck, EM.cpp:224-271). The early exit only
pays on near-certain/padded tiles.

Only the single-chip linear path runs here; the sharded path (psum over
the individual mesh axis each pass) stays in ops/maf.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import EPSILON, ITER_MAX

TS = 1024  # sites per tile: measured best on v5e (smaller tiles lose
           # more to per-pass inefficiency than they gain from early
           # exit; 512/256/128 were 8.7/11.8/19.2ms vs 8.1ms at 100k x 32)


def _interpret():
    return jax.default_backend() != "tpu"


def _imap_fwd(i):
    """Tile index map; explicit i32 so the map stays legal under
    jax_enable_x64 (bare 0s trace as i64 and Mosaic rejects the map)."""
    z = jnp.int32(0)
    return (i, z, z)



def prepare_gl_tiles(gl_lin):
    """[S, N, 3] linear GLs -> (gl0, gl1, gl2) [n_tiles, N, TS] f32.

    Pad sites use gl = 1 (uniform likelihood): their fixed point is a
    damped identity that converges in a few passes, so they never hold a
    tile's early exit hostage.
    """
    S, N = gl_lin.shape[0], gl_lin.shape[1]
    n_tiles = -(-S // TS)
    pad = n_tiles * TS - S
    if pad:
        gl_lin = jnp.pad(
            gl_lin, ((0, pad), (0, 0), (0, 0)), constant_values=1.0
        )
    # [n_tiles*TS, N, 3] -> [n_tiles, TS, N, 3] -> per-genotype [n_tiles, N, TS]
    g = gl_lin.reshape(n_tiles, TS, N, 3).astype(jnp.float32)
    g = jnp.transpose(g, (0, 2, 1, 3))  # [n_tiles, N, TS, 3]
    return g[..., 0], g[..., 1], g[..., 2]


def prepare_p_tiles(p_ibd):
    """[S, N] IBD posteriors -> [n_tiles, N, TS] f32 (pad F = 0)."""
    S, N = p_ibd.shape[0], p_ibd.shape[1]
    n_tiles = -(-S // TS)
    pad = n_tiles * TS - S
    if pad:
        p_ibd = jnp.pad(p_ibd, ((0, pad), (0, 0)), constant_values=0.0)
    p = p_ibd.reshape(n_tiles, TS, N).astype(jnp.float32)
    return jnp.transpose(p, (0, 2, 1))


@partial(jax.jit, static_argnames=("n_ind",))
def _run(gl0, gl1, gl2, p, n_ind):
    n_tiles = gl0.shape[0]
    N = n_ind

    def kernel(g0_ref, g1_ref, g2_ref, p_ref, freq_ref):
        g0, g1, g2 = g0_ref[0], g1_ref[0], g2_ref[0]  # [N, TS]
        F = p_ref[0]
        # Pass-invariant planes, hoisted out of the fixed point. On
        # realistic GLs the damped 1/k steps never drop below EPSILON,
        # so every site runs all ITER_MAX+1 passes and the loop body IS
        # the kernel's flop bill (~15 [N, TS] vector ops + 1 divide per
        # pass after this hoisting, down from ~21): pr1's 2(1-F) factor,
        # calc_HWE's F==1 heterozygote-floor mask (gen_func.cpp:946-956;
        # without the floor a het-certain GL at p_ibd==1 divides by
        # zero), and the cd identity below.
        two_m_F = 2.0 - F
        tn1 = 2.0 - 2.0 * F  # pr1 = pq * 2(1-F)
        het_floor = F == 1.0
        # cd identity: pp0+pp1+pp2 == 1 after normalisation, so the
        # reference's 2*pp1 + (pp0+pp2)*(2-F) == (2-F) + pp1*F exactly
        # (gen_func.cpp:997-999); sum(2-F) is pass-invariant.
        T_row = jnp.sum(two_m_F, axis=0, keepdims=True)  # [1, TS]

        # The active mask is carried as f32 (0/1): Mosaic cannot yet
        # legalize i1 vectors in while_loop carries on this toolchain.
        def cond(st):
            return jnp.sum(st[3]) > 0.0

        def body(st):
            freq, num, den, active, passes = st
            prev = freq
            pq = (1.0 - freq) * freq
            a = pq * F
            pr0 = (1.0 - freq) * (1.0 - freq) + a
            # jnp.float32: a bare 1e-15 commits to f64 under
            # jax_enable_x64 and Mosaic cannot legalize the f64->f32 trunc
            pr1 = jnp.where(het_floor, jnp.float32(1e-15), pq * tn1)
            pr2 = freq * freq + a
            n0 = g0 * pr0
            n1 = g1 * pr1
            n2 = g2 * pr2
            inv = 1.0 / (n0 + n1 + n2)
            pp1 = n1 * inv
            pp2 = n2 * inv
            cn = jnp.sum(pp1 + pp2 * two_m_F, axis=0, keepdims=True)
            cd = T_row + jnp.sum(pp1 * F, axis=0, keepdims=True)
            num = num + active * cn
            den = den + active * cd
            freq = freq + active * (num / den - freq)
            passes = passes + 1
            moved = (jnp.abs(prev - freq) > EPSILON).astype(jnp.float32)
            inside = jnp.float32(1.0) * (passes <= ITER_MAX)
            active = active * moved * inside
            return (freq, num, den, active, passes)

        z = jnp.zeros((1, gl0.shape[2]), jnp.float32)
        init = (
            jnp.full((1, gl0.shape[2]), 0.01, jnp.float32),
            z,
            z,
            jnp.ones((1, gl0.shape[2]), jnp.float32),
            jnp.zeros((), jnp.int32),
        )
        out = jax.lax.while_loop(cond, body, init)
        freq_ref[0] = out[0]

    tile = lambda: pl.BlockSpec(
        (1, N, TS), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, TS), jnp.float32),
        grid=(n_tiles,),
        in_specs=[tile(), tile(), tile(), tile()],
        out_specs=pl.BlockSpec(
            (1, 1, TS), _imap_fwd, memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(gl0, gl1, gl2, p)


@partial(jax.jit, static_argnames=("n_ind", "K0", "Ms"))
def _run_macro(gl0, gl1, gl2, p, n_ind, K0, Ms):
    """Macro-stepping kernel (ops/maf.py module docstring): K0 real
    damped passes, then rounds of ONE gradient-augmented evaluation
    (~2x a pass) + M virtual passes of per-site scalar math on the
    linearised accumulator model. ~K0 + 2*ceil((101-K0)/M) full-width
    pass-equivalents instead of 101; trajectory error vs the exact
    damped iterate ~1e-5 (test_maf.py gates 1e-4).

    The per-pass math is restructured into pass-invariant HORNER
    coefficient planes (hoisted): every per-individual term is a
    quadratic in f evaluated with two FMAs against a broadcast (f, f^2),
      denom_i  = d0 + d1 f + d2 f^2     (d0=A+K, d1=B-2A, d2=A-B+C)
      cn_num_i = K  + P  f + (Q-P) f^2
      cd_num_i = KF + R (f - f^2)
    (equivalent to the u=(1-f)^2, v=f(1-f), w=f^2 basis of the XLA path,
    ~2x fewer VPU slots per cell per pass), the divide is an approximate
    VPU reciprocal refined by one Newton step (rel err ~1e-9, far under
    the 2e-5 pallas-vs-XLA gate), and each macro round evaluates the
    freq-DERIVATIVE of the accumulator sums analytically from the same
    planes -- quotient rule against the already-computed cn_i/cd_i, so a
    gradient round costs ~1.5x a plain pass instead of jvp's 2x.
    K = [F==1] g1 * 1e-15 carries calc_HWE's heterozygote floor
    (gen_func.cpp:946-956) as a freq-constant term, so the analytic
    freq-derivatives are exact for floored individuals too."""
    n_tiles = gl0.shape[0]
    N = n_ind

    def kernel(g0_ref, g1_ref, g2_ref, p_ref, freq_ref):
        g0, g1, g2 = g0_ref[0], g1_ref[0], g2_ref[0]  # [N, TS]
        F = p_ref[0]
        two_m_F = 2.0 - F
        het = F == 1.0
        zero = jnp.zeros_like(F)
        tn1 = jnp.where(het, zero, 2.0 - 2.0 * F)
        K = jnp.where(het, g1 * jnp.float32(1e-15), zero)
        B = g1 * tn1 + (g0 + g2) * F
        P = g1 * tn1 + g2 * F * two_m_F
        R = g1 * tn1 * F
        KF = K * F
        # Horner planes (module docstring): quadratics in f
        d0 = g0 + K
        d1 = B - 2.0 * g0
        d2 = g0 - B + g2
        QmP = g2 * two_m_F - P
        T_row = jnp.sum(two_m_F, axis=0, keepdims=True)  # [1, TS]

        def _recip(D):
            r = pl.reciprocal(D, approx=True)
            return r * (2.0 - D * r)  # one Newton step

        def sums(freq):
            f2 = freq * freq
            v = freq - f2
            inv = _recip(d0 + d1 * freq + d2 * f2)
            cn = jnp.sum((K + P * freq + QmP * f2) * inv,
                         axis=0, keepdims=True)
            cd = T_row + jnp.sum((KF + R * v) * inv, axis=0, keepdims=True)
            return cn, cd

        def sums_grad(freq):
            f2 = freq * freq
            v = freq - f2
            dv = 1.0 - 2.0 * freq
            inv = _recip(d0 + d1 * freq + d2 * f2)
            dD = d1 + 2.0 * d2 * freq
            cni = (K + P * freq + QmP * f2) * inv
            cdi = (KF + R * v) * inv
            cn = jnp.sum(cni, axis=0, keepdims=True)
            cd = T_row + jnp.sum(cdi, axis=0, keepdims=True)
            dcn = jnp.sum((P + 2.0 * QmP * freq - cni * dD) * inv,
                          axis=0, keepdims=True)
            dcd = jnp.sum((R * dv - cdi * dD) * inv,
                          axis=0, keepdims=True)
            return cn, cd, dcn, dcd

        def advance(st, cn, cd):
            freq, num, den, active, passes = st
            prev = freq
            num = num + active * cn
            den = den + active * cd
            freq = freq + active * (num / den - freq)
            passes = passes + 1
            moved = (jnp.abs(prev - freq) > EPSILON).astype(jnp.float32)
            inside = jnp.float32(1.0) * (passes <= ITER_MAX)
            return (freq, num, den, active * moved * inside, passes)

        z = jnp.zeros((1, gl0.shape[2]), jnp.float32)
        init = (
            jnp.full((1, gl0.shape[2]), 0.01, jnp.float32),
            z,
            z,
            jnp.ones((1, gl0.shape[2]), jnp.float32),
            jnp.zeros((), jnp.int32),
        )

        def real_cond(st):
            return (jnp.sum(st[3]) > 0.0) & (st[4] < K0)

        def real_body(st):
            cn, cd = sums(st[0])
            return advance(st, cn, cd)

        st = jax.lax.while_loop(real_cond, real_body, init)

        def macro_body(st, M_r):
            cn, cd, dcn, dcd = sums_grad(st[0])
            f0 = st[0]
            # The virtual passes are per-site scalar math. As [1, TS]
            # vectors they use 1/8 of the VPU's sublanes (measured ~45%
            # of each macro round's cost); packing sites into full
            # [8, TS//8] vregs for the loop -- identical elementwise
            # math, pure relayout -- runs them at full width.
            pack = lambda x: x.reshape(8, TS // 8)
            cnp_, cdp_, dcnp_, dcdp_, f0p = map(
                pack, (cn, cd, dcn, dcd, f0)
            )

            def vstep(st2):
                df = st2[0] - f0p
                return advance(st2, cnp_ + dcnp_ * df, cdp_ + dcdp_ * df)

            outp = (pack(st[0]), pack(st[1]), pack(st[2]), pack(st[3]),
                    st[4])
            for _ in range(M_r):  # static unroll: per-step work is one
                outp = vstep(outp)  # vreg; loop overhead would dominate
            unpack = lambda x: x.reshape(1, TS)
            return (unpack(outp[0]), unpack(outp[1]), unpack(outp[2]),
                    unpack(outp[3]), outp[4])

        # static round list (ops/maf.py macro_rounds): converged or
        # past-ITER_MAX states advance as masked no-ops, so this equals
        # the former any(active) while-loop round-for-round
        for M_r in Ms:
            st = macro_body(st, M_r)
        freq_ref[0] = st[0]

    tile = lambda: pl.BlockSpec(
        (1, N, TS), _imap_fwd, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, TS), jnp.float32),
        grid=(n_tiles,),
        in_specs=[tile(), tile(), tile(), tile()],
        out_specs=pl.BlockSpec(
            (1, 1, TS), _imap_fwd, memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(gl0, gl1, gl2, p)


def est_maf_pallas(gl_tiles, p_ibd, S, macro=False):
    """Per-site MAF from pre-tiled linear GLs + current IBD posterior.

    gl_tiles: prepare_gl_tiles output (cache it: gl is constant across EM
    iterations). macro: linearised macro-stepping speed mode (True =
    (MACRO_K0, MACRO_MS) from ops/maf.py; or an explicit (K0, M) pair);
    False runs every damped pass at full width. Returns freq [S] f32.
    """
    gl0, gl1, gl2 = gl_tiles
    p = prepare_p_tiles(p_ibd)
    if macro is True:
        from .maf import macro_schedule

        macro = macro_schedule(gl0.shape[1])
    if macro:
        from .maf import macro_rounds

        K0, M = macro
        freq = _run_macro(gl0, gl1, gl2, p, gl0.shape[1], K0,
                          macro_rounds(K0, M))
    else:
        freq = _run(gl0, gl1, gl2, p, gl0.shape[1])
    return freq.reshape(-1)[:S]


# ===========================================================================
# v2 slab-layout est_maf ("gl layout", models/hmm_pallas.py v2 section)
#
# The tiles kernels above need their own [n_tiles, N, TS] copies of gl
# (~[S, N, 3] f32 of extra HBM) plus a [S, N] -> tiles transpose of the
# IBD posterior EVERY EM iteration (~5 ms at 1M x 100, ~150 GB/s
# effective).  When the EM loop already runs the v2 GL-fused chain
# kernels, the gl slabs (g0, g2; g1 = 1 - g0 - g2 by normalisation) are
# resident run constants and the posterior comes OUT of the fused
# posterior kernel in the same slab layout -- so the fixed point can run
# directly on those, reading each cell once into VMEM with NO relayout
# and NO duplicate gl storage:
#
#   slab cell (row r, sublane n % 8, lane (n // 8) * nb_p + j)
#     = site s = j * bs + r, individual n
#   per-site state: [RB, nb_p] blocks -- fully-packed vregs, so the
#     damped `advance` and the macro virtual passes run at full VPU
#     width with no [1, L] sublane starvation and no repacking
#   cross-individual reduction: G static lane-group slices + a sublane
#     sum; per-site broadcast: the _emit2-style broadcast + lane tile
#   pad rule: individuals n >= N are masked INTO the hoisted planes
#     (zero contributions, denominator 1 -- zero per-pass cost); sites
#     outside [0, S) compute garbage freely and are overwritten with the
#     v2 freq-compact pad sentinel 2.0 on output
#
# Math and schedule are identical to _run_macro (Horner planes, refined
# approx reciprocal, analytic macro gradients): the two kernels agree to
# f32 rounding and both sit under the 2e-5 pallas-vs-XLA macro gate.
# ===========================================================================

_SLAB_RB = 8  # rows per grid step: [8, nb_p] state = fully-packed vregs
_SLAB_VMEM_BUDGET = 88 * 1024 * 1024  # geometry-feasibility budget at
#                                       the baseline RB=8 (slab_geom_ok)
_SLAB_VMEM_LIMIT = 98 * 1024 * 1024  # actual per-kernel scoped-vmem cap
#                                      (v5e core: 128 MB, Mosaic cap 100)


def slab_geom_ok(S, N, bs=None, nb_p=None):
    """True when the slab est_maf kernel's VMEM working set (inputs +
    ~11 hoisted coefficient planes at [RB, 8, C]) fits the budget for
    this problem's v2 geometry."""
    from ..models.hmm_pallas import pick_geom2, _geom2

    if bs is None or nb_p is None:
        bs, nb_p = pick_geom2(S, N)
    _, G, _, C, _ = _geom2(S, N, bs, nb_p)
    plane = _SLAB_RB * 8 * C * 4
    return 15 * plane <= _SLAB_VMEM_BUDGET


@partial(jax.jit, static_argnames=(
    "C", "nb_p", "G", "bs", "nb", "S", "N", "bs_pad", "K0", "Ms"))
def _run_macro_slab(g0s, g2s, ps, C, nb_p, G, bs, nb, S, N, bs_pad, K0, Ms):
    # RB=16/32 row blocks were tried (round 5) on the hypothesis that
    # the ~93-step unrolled advance chain is latency-bound per grid
    # step: MEASURED WORSE (26.5 vs 21.9 ms at 1M x 100; per-real-pass
    # 0.83 -> 1.03 ms) -- the wider working set hurts more than the
    # step amortisation helps. Keep RB=8.
    RB = _SLAB_RB
    nsteps = bs_pad // RB
    f32 = jnp.float32

    def kernel(g0_ref, g2_ref, p_ref, out_ref):
        i = pl.program_id(0)
        # gl slabs may be stored bf16 (hmm_pallas.gl_slabs dtype):
        # upcast at load; all fixed-point math stays f32
        g0 = g0_ref[...].astype(f32)
        g2 = g2_ref[...].astype(f32)
        F = p_ref[...]  # [RB, 8, C]
        g1 = 1.0 - g0 - g2
        # individual-validity mask -> folded into the planes (module
        # header): n = 8 * (lane // nb_p) + sublane
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, C), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, C), 2)
        vm = (8 * (lane // nb_p) + sub) < N
        zero = jnp.zeros_like(F)
        two_m_F = 2.0 - F
        het = F == 1.0
        tn1 = jnp.where(het, zero, 2.0 - 2.0 * F)
        K = jnp.where(het, g1 * f32(1e-15), zero)
        B = g1 * tn1 + (g0 + g2) * F
        P = g1 * tn1 + g2 * F * two_m_F
        R = g1 * tn1 * F
        KF = K * F
        d0 = jnp.where(vm, g0 + K, jnp.ones_like(F))
        d1 = jnp.where(vm, B - 2.0 * g0, zero)
        d2 = jnp.where(vm, g0 - B + g2, zero)
        QmP = jnp.where(vm, g2 * two_m_F - P, zero)
        K = jnp.where(vm, K, zero)
        P = jnp.where(vm, P, zero)
        R = jnp.where(vm, R, zero)
        KF = jnp.where(vm, KF, zero)

        def _reduce(x):  # [RB, 8, C] -> [RB, nb_p]
            acc = x[:, :, 0:nb_p]
            for g in range(1, G):
                acc = acc + x[:, :, g * nb_p:(g + 1) * nb_p]
            # static middle-index slices, NOT jnp.sum(axis=1): the
            # replicated-sublane layout a middle-axis reduce produces
            # cannot relayout into the while-loop carries (Mosaic
            # "Invalid relayout ... replicated in destination")
            out = acc[:, 0, :]
            for k in range(1, 8):
                out = out + acc[:, k, :]
            return out

        T_row = _reduce(jnp.where(vm, two_m_F, zero))

        def _recip(D):
            r = pl.reciprocal(D, approx=True)
            return r * (2.0 - D * r)

        def _sub_sum(x):  # [RB, 8, nb_p] -> [RB, nb_p] (static slices)
            out = x[:, 0, :]
            for k in range(1, 8):
                out = out + x[:, k, :]
            return out

        def _gsl(x, g):  # lane-group slice of a plane
            return x[:, :, g * nb_p:(g + 1) * nb_p]

        # Per-pass evaluation walks the G lane groups with static plane
        # slices against a sublane-broadcast freq [RB, 1, nb_p] -- no
        # full-width tile materialisation, and the lane-group reduce IS
        # the accumulation.
        def sums(freq):
            f3 = freq[:, None, :]
            a_cn = a_cd = None
            for g in range(G):
                inv = _recip(_gsl(d0, g) + (_gsl(d1, g)
                                            + _gsl(d2, g) * f3) * f3)
                cn_g = (_gsl(K, g) + (_gsl(P, g)
                                      + _gsl(QmP, g) * f3) * f3) * inv
                cd_g = (_gsl(KF, g) + (_gsl(R, g) * (1.0 - f3)) * f3) * inv
                a_cn = cn_g if a_cn is None else a_cn + cn_g
                a_cd = cd_g if a_cd is None else a_cd + cd_g
            return _sub_sum(a_cn), T_row + _sub_sum(a_cd)

        def sums_grad(freq):
            f3 = freq[:, None, :]
            a_cn = a_cd = a_dcn = a_dcd = None
            for g in range(G):
                d1g, d2g = _gsl(d1, g), _gsl(d2, g)
                Pg, QmPg, Rg = _gsl(P, g), _gsl(QmP, g), _gsl(R, g)
                inv = _recip(_gsl(d0, g) + (d1g + d2g * f3) * f3)
                dD = d1g + (d2g + d2g) * f3
                cni = (_gsl(K, g) + (Pg + QmPg * f3) * f3) * inv
                cdi = (_gsl(KF, g) + (Rg * (1.0 - f3)) * f3) * inv
                dcn_g = (Pg + (QmPg + QmPg) * f3 - cni * dD) * inv
                dcd_g = (Rg * (1.0 - (f3 + f3)) - cdi * dD) * inv
                a_cn = cni if a_cn is None else a_cn + cni
                a_cd = cdi if a_cd is None else a_cd + cdi
                a_dcn = dcn_g if a_dcn is None else a_dcn + dcn_g
                a_dcd = dcd_g if a_dcd is None else a_dcd + dcd_g
            return (_sub_sum(a_cn), T_row + _sub_sum(a_cd),
                    _sub_sum(a_dcn), _sub_sum(a_dcd))

        def advance(st, cn, cd):
            freq, num, den, active, passes = st
            prev = freq
            num = num + active * cn
            den = den + active * cd
            freq = freq + active * (num / den - freq)
            passes = passes + 1
            moved = (jnp.abs(prev - freq) > EPSILON).astype(f32)
            inside = f32(1.0) * (passes <= ITER_MAX)
            return (freq, num, den, active * moved * inside, passes)

        z = jnp.zeros((RB, nb_p), f32)
        init = (
            jnp.full((RB, nb_p), 0.01, f32),
            z,
            z,
            jnp.ones((RB, nb_p), f32),
            jnp.zeros((), jnp.int32),
        )

        def real_cond(st):
            return (jnp.sum(st[3]) > 0.0) & (st[4] < K0)

        def real_body(st):
            cn, cd = sums(st[0])
            return advance(st, cn, cd)

        st = jax.lax.while_loop(real_cond, real_body, init)

        # static round list (ops/maf.py macro_rounds); see tiles note
        for M_r in Ms:
            cn, cd, dcn, dcd = sums_grad(st[0])
            f0 = st[0]
            for _ in range(M_r):  # static unroll (one-vreg-deep steps)
                df = st[0] - f0
                st = advance(st, cn + dcn * df, cd + dcd * df)
        out = st
        # pad sites -> the v2 freq-compact sentinel
        r_loc = jax.lax.broadcasted_iota(jnp.int32, (RB, nb_p), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (RB, nb_p), 1)
        r_glob = i * RB + r_loc
        valid = (r_glob < bs) & (j_idx < nb) & (j_idx * bs + r_glob < S)
        out_ref[...] = jnp.where(valid, out[0], f32(2.0))[:, None, :]

    slab = pl.BlockSpec((RB, 8, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, 1, nb_p), jnp.float32),
        grid=(nsteps,),
        in_specs=[slab, slab, slab],
        out_specs=pl.BlockSpec((RB, 1, nb_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SLAB_VMEM_LIMIT
        ),
    )(g0s, g2s, ps)


# ---------------------------------------------------------------------------
# round-5 split: virtual windows OUT of the kernel (VERDICT ask #5)
#
# The in-kernel macro windows are SERIAL per grid step: bs_pad/RB ~ 163
# sequential 31-step recursions on [RB, nb_p] state cost ~52 us/step
# (~10 ms of the 21.5 ms total at 1M x 100, dev/probe_maf_windows.py) --
# pure dependency-chain latency, not flops. Split instead:
#   kernel A  (_run_state_grad_slab): K0 real passes + the first
#             sums_grad, VMEM-resident -- one slab stream
#   XLA       (_virtual_window): the damped virtual recursion,
#             static-unrolled at FULL [bs_pad, nb_p] width (~1M sites in
#             parallel, one fused elementwise chain -- the serial-latency
#             problem vanishes); `inside` is static per unrolled step
#   kernel B  (_run_sums_grad_slab): rounds 2+ re-stream the slabs for
#             one sums_grad at the advanced freq (~2 ms each; the
#             probe's 0.7-2.3 ms in-kernel evals trade against it)
# Math and op order are UNCHANGED (same planes, same advance formula),
# so the 2e-5 slab-vs-XLA gates hold; only scheduling moved.
# ---------------------------------------------------------------------------


def _slab_planes(g0, g2, F, nb_p, G, N, C):
    """Hoisted Horner coefficient planes (+ validity fold) from loaded
    [RB, 8, C] blocks; returns (planes dict, T_row [RB, nb_p]).
    Identical math to _run_macro_slab's prologue."""
    f32 = jnp.float32
    g0 = g0.astype(f32)
    g2 = g2.astype(f32)
    g1 = 1.0 - g0 - g2
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, C), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, C), 2)
    vm = (8 * (lane // nb_p) + sub) < N
    zero = jnp.zeros_like(F)
    two_m_F = 2.0 - F
    het = F == 1.0
    tn1 = jnp.where(het, zero, 2.0 - 2.0 * F)
    K = jnp.where(het, g1 * f32(1e-15), zero)
    B = g1 * tn1 + (g0 + g2) * F
    P = g1 * tn1 + g2 * F * two_m_F
    R = g1 * tn1 * F
    KF = K * F
    pl_ = dict(
        d0=jnp.where(vm, g0 + K, jnp.ones_like(F)),
        d1=jnp.where(vm, B - 2.0 * g0, zero),
        d2=jnp.where(vm, g0 - B + g2, zero),
        QmP=jnp.where(vm, g2 * two_m_F - P, zero),
        K=jnp.where(vm, K, zero),
        P=jnp.where(vm, P, zero),
        R=jnp.where(vm, R, zero),
        KF=jnp.where(vm, KF, zero),
    )

    def _reduce(x):  # [RB, 8, C] -> [RB, nb_p] (static slices; see
        acc = x[:, :, 0:nb_p]  # _run_macro_slab's Mosaic relayout note)
        for g in range(1, G):
            acc = acc + x[:, :, g * nb_p:(g + 1) * nb_p]
        out = acc[:, 0, :]
        for k in range(1, 8):
            out = out + acc[:, k, :]
        return out

    T_row = _reduce(jnp.where(vm, two_m_F, zero))
    return pl_, T_row


def _slab_sums_grad(pls, T_row, freq, nb_p, G):
    """(cn, cd, dcn, dcd) [RB, nb_p] at `freq` from the hoisted planes
    -- _run_macro_slab's sums_grad, shared by both split kernels."""
    def _recip(D):
        r = pl.reciprocal(D, approx=True)
        return r * (2.0 - D * r)

    def _sub_sum(x):
        out = x[:, 0, :]
        for k in range(1, 8):
            out = out + x[:, k, :]
        return out

    def _gsl(x, g):
        return x[:, :, g * nb_p:(g + 1) * nb_p]

    f3 = freq[:, None, :]
    a_cn = a_cd = a_dcn = a_dcd = None
    for g in range(G):
        d1g, d2g = _gsl(pls["d1"], g), _gsl(pls["d2"], g)
        Pg, QmPg, Rg = (_gsl(pls["P"], g), _gsl(pls["QmP"], g),
                        _gsl(pls["R"], g))
        inv = _recip(_gsl(pls["d0"], g) + (d1g + d2g * f3) * f3)
        dD = d1g + (d2g + d2g) * f3
        cni = (_gsl(pls["K"], g) + (Pg + QmPg * f3) * f3) * inv
        cdi = (_gsl(pls["KF"], g) + (Rg * (1.0 - f3)) * f3) * inv
        dcn_g = (Pg + (QmPg + QmPg) * f3 - cni * dD) * inv
        dcd_g = (Rg * (1.0 - (f3 + f3)) - cdi * dD) * inv
        a_cn = cni if a_cn is None else a_cn + cni
        a_cd = cdi if a_cd is None else a_cd + cdi
        a_dcn = dcn_g if a_dcn is None else a_dcn + dcn_g
        a_dcd = dcd_g if a_dcd is None else a_dcd + dcd_g
    return (_sub_sum(a_cn), T_row + _sub_sum(a_cd),
            _sub_sum(a_dcn), _sub_sum(a_dcd))


@partial(jax.jit, static_argnames=("C", "nb_p", "G", "N", "bs_pad", "K0"))
def _run_state_grad_slab(g0s, g2s, ps, C, nb_p, G, N, bs_pad, K0):
    """Kernel A: K0 real damped passes + the first sums_grad, one slab
    stream. Output [bs_pad, 8, nb_p] rows =
    (freq, num, den, active, cn, cd, dcn, dcd)."""
    RB = _SLAB_RB
    nsteps = bs_pad // RB
    f32 = jnp.float32

    def kernel(g0_ref, g2_ref, p_ref, out_ref):
        pls, T_row = _slab_planes(
            g0_ref[...], g2_ref[...], p_ref[...], nb_p, G, N, C)

        def _recip(D):
            r = pl.reciprocal(D, approx=True)
            return r * (2.0 - D * r)

        def _sub_sum(x):
            out = x[:, 0, :]
            for k in range(1, 8):
                out = out + x[:, k, :]
            return out

        def _gsl(x, g):
            return x[:, :, g * nb_p:(g + 1) * nb_p]

        def sums(freq):
            f3 = freq[:, None, :]
            a_cn = a_cd = None
            for g in range(G):
                inv = _recip(_gsl(pls["d0"], g) + (_gsl(pls["d1"], g)
                             + _gsl(pls["d2"], g) * f3) * f3)
                cn_g = (_gsl(pls["K"], g) + (_gsl(pls["P"], g)
                        + _gsl(pls["QmP"], g) * f3) * f3) * inv
                cd_g = (_gsl(pls["KF"], g)
                        + (_gsl(pls["R"], g) * (1.0 - f3)) * f3) * inv
                a_cn = cn_g if a_cn is None else a_cn + cn_g
                a_cd = cd_g if a_cd is None else a_cd + cd_g
            return _sub_sum(a_cn), T_row + _sub_sum(a_cd)

        def advance(st, cn, cd):
            freq, num, den, active, passes = st
            prev = freq
            num = num + active * cn
            den = den + active * cd
            freq = freq + active * (num / den - freq)
            passes = passes + 1
            moved = (jnp.abs(prev - freq) > EPSILON).astype(f32)
            inside = f32(1.0) * (passes <= ITER_MAX)
            return (freq, num, den, active * moved * inside, passes)

        z = jnp.zeros((RB, nb_p), f32)
        init = (
            jnp.full((RB, nb_p), 0.01, f32), z, z,
            jnp.ones((RB, nb_p), f32), jnp.zeros((), jnp.int32),
        )

        st = jax.lax.while_loop(
            lambda st: (jnp.sum(st[3]) > 0.0) & (st[4] < K0),
            lambda st: advance(st, *sums(st[0])),
            init,
        )
        cn, cd, dcn, dcd = _slab_sums_grad(pls, T_row, st[0], nb_p, G)
        out_ref[...] = jnp.stack(
            [st[0], st[1], st[2], st[3], cn, cd, dcn, dcd], axis=1)

    slab = pl.BlockSpec((RB, 8, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, 8, nb_p), jnp.float32),
        grid=(nsteps,),
        in_specs=[slab, slab, slab],
        out_specs=pl.BlockSpec((RB, 8, nb_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SLAB_VMEM_LIMIT
        ),
    )(g0s, g2s, ps)


@partial(jax.jit, static_argnames=("C", "nb_p", "G", "N", "bs_pad"))
def _run_sums_grad_slab(g0s, g2s, ps, fq, C, nb_p, G, N, bs_pad):
    """Kernel B: one sums_grad evaluation at the [bs_pad, nb_p] freq
    (rounds 2+ of the split schedule). Output [bs_pad, 4, nb_p] =
    (cn, cd, dcn, dcd)."""
    RB = _SLAB_RB
    nsteps = bs_pad // RB

    def kernel(g0_ref, g2_ref, p_ref, fq_ref, out_ref):
        pls, T_row = _slab_planes(
            g0_ref[...], g2_ref[...], p_ref[...], nb_p, G, N, C)
        cn, cd, dcn, dcd = _slab_sums_grad(
            pls, T_row, fq_ref[:, 0, :], nb_p, G)
        out_ref[...] = jnp.stack([cn, cd, dcn, dcd], axis=1)

    slab = pl.BlockSpec((RB, 8, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, 4, nb_p), jnp.float32),
        grid=(nsteps,),
        in_specs=[slab, slab, slab,
                  pl.BlockSpec((RB, 1, nb_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RB, 4, nb_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SLAB_VMEM_LIMIT
        ),
    )(g0s, g2s, ps, fq)


def _virtual_window(st, grads, passes0, M_r):
    """M_r virtual damped passes on the linearised accumulator model,
    static-unrolled XLA elementwise math on [bs_pad, nb_p] arrays.

    Identical op order to the kernels' `advance`; `inside` is STATIC
    per unrolled step (the pass schedule is fixed), and once all sites
    in a block converge the kernels' early-exit passes values only ever
    gate already-inactive sites -- so assuming passes0 = K0 + prior
    windows is trajectory-identical (ops/maf.py macro_rounds note)."""
    freq, num, den, active = st
    cn0, cd0, dcn, dcd = grads
    f0 = freq
    for k in range(M_r):
        inside = (passes0 + k + 1) <= ITER_MAX
        df = freq - f0
        cn = cn0 + dcn * df
        cd = cd0 + dcd * df
        prev = freq
        num = num + active * cn
        den = den + active * cd
        freq = freq + active * (num / den - freq)
        moved = (jnp.abs(prev - freq) > EPSILON).astype(freq.dtype)
        active = active * moved if inside else active * 0.0
    return freq, num, den, active


def est_maf_slab(prep2, p_slab, macro=True):
    """Per-site MAF directly from the v2 gl slabs + raw posterior slab.

    prep2: models/hmm_pallas.prepare_gl_inputs output (the run-constant
    gl slabs). p_slab: the [bs_pad, 8, C] posterior slab a
    posteriors_fused(..., return_slab=True) call emitted (pre-unpack).
    Returns freq [S] f32. Caller gates on slab_geom_ok + a non-None
    macro_schedule(N).

    Round-5 split pipeline (see the section header above): kernel A
    runs the real passes + first sums_grad; the macro virtual windows
    run as full-width XLA unrolls; rounds 2+ re-evaluate sums_grad with
    kernel B. 21.5 -> ~15 ms at 1M x 100 (the in-kernel serial windows
    were latency-bound).

    Note: p_slab is the UNSNAPPED kernel output -- the state's p_ibd
    gets check_interv's within-EPSILON {0,1} snap (gen_func.cpp:55-70)
    but this speed tier reads the raw values: a <= EPSILON=1e-5 input
    perturbation, inside the macro tier's 1e-4 drift envelope (the
    het floor still engages on exact 1.0s, which the fw_post kernel
    produces by construction for certain posteriors). Compat/exact
    tiers consume the snapped p_ibd."""
    from .maf import macro_rounds, macro_schedule

    S, N = prep2["S"], prep2["N"]
    if macro is True:
        macro = macro_schedule(N)
    if not macro:
        raise ValueError("est_maf_slab requires a macro schedule")
    K0, M = macro
    Ms = macro_rounds(K0, M)
    C, nb_p, G, bs_pad = (prep2["C"], prep2["nb_p"], prep2["G"],
                          prep2["bs_pad"])
    st8 = _run_state_grad_slab(
        prep2["g0"], prep2["g2"], p_slab, C, nb_p, G, N, bs_pad, K0)
    st = tuple(st8[:, k, :] for k in range(4))
    grads = tuple(st8[:, k, :] for k in range(4, 8))
    passes = K0
    for r, M_r in enumerate(Ms):
        if r > 0:
            s4 = _run_sums_grad_slab(
                prep2["g0"], prep2["g2"], p_slab, st[0][:, None, :],
                C, nb_p, G, N, bs_pad)
            grads = tuple(s4[:, k, :] for k in range(4))
        st = _virtual_window(st, grads, passes, M_r)
        passes += M_r
    v = jnp.swapaxes(st[0], 0, 1)[: prep2["nb"], : prep2["bs"]]
    return v.reshape(-1)[:S]

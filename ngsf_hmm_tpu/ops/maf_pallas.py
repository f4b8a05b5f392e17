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


@partial(jax.jit, static_argnames=("n_ind", "K0", "M"))
def _run_macro(gl0, gl1, gl2, p, n_ind, K0, M):
    """Macro-stepping kernel (ops/maf.py module docstring): K0 real
    damped passes, then rounds of ONE gradient-augmented evaluation
    (~2x a pass) + M virtual passes of per-site scalar math on the
    linearised accumulator model. ~K0 + 2*ceil((101-K0)/M) full-width
    pass-equivalents instead of 101; trajectory error vs the exact
    damped iterate ~1e-5 (test_maf.py gates 1e-4).

    The per-pass math is restructured into pass-invariant POLYNOMIAL
    coefficient planes (hoisted): with u=(1-f)^2, v=f(1-f), w=f^2,
      denom_i  = A u + B v + C w + K
      cn_num_i = P v + Q w + K
      cd_num_i = R v + K F
    where K = [F==1] g1 * 1e-15 carries calc_HWE's heterozygote floor
    (gen_func.cpp:946-956) as a freq-constant term, so the analytic
    freq-derivatives below are exact for floored individuals too."""
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
        A = g0
        B = g1 * tn1 + (g0 + g2) * F
        C = g2
        P = g1 * tn1 + g2 * F * two_m_F
        Q = g2 * two_m_F
        R = g1 * tn1 * F
        KF = K * F
        T_row = jnp.sum(two_m_F, axis=0, keepdims=True)  # [1, TS]

        def sums(freq):
            u = (1.0 - freq) * (1.0 - freq)
            v = freq * (1.0 - freq)
            w = freq * freq
            inv = 1.0 / (A * u + B * v + C * w + K)
            cn = jnp.sum((P * v + Q * w + K) * inv, axis=0, keepdims=True)
            cd = T_row + jnp.sum((R * v + KF) * inv, axis=0, keepdims=True)
            return cn, cd

        def sums_grad(freq):
            u = (1.0 - freq) * (1.0 - freq)
            v = freq * (1.0 - freq)
            w = freq * freq
            du = -2.0 * (1.0 - freq)
            dv = 1.0 - 2.0 * freq
            dw = 2.0 * freq
            inv = 1.0 / (A * u + B * v + C * w + K)
            dD = A * du + B * dv + C * dw
            cni = (P * v + Q * w + K) * inv
            cdi = (R * v + KF) * inv
            cn = jnp.sum(cni, axis=0, keepdims=True)
            cd = T_row + jnp.sum(cdi, axis=0, keepdims=True)
            dcn = jnp.sum((P * dv + Q * dw - cni * dD) * inv,
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

        def macro_cond(st):
            return jnp.sum(st[3]) > 0.0

        def macro_body(st):
            cn, cd, dcn, dcd = sums_grad(st[0])
            f0 = st[0]

            def vstep(_, st2):
                df = st2[0] - f0
                return advance(st2, cn + dcn * df, cd + dcd * df)

            return jax.lax.fori_loop(0, M, vstep, st)

        out = jax.lax.while_loop(macro_cond, macro_body, st)
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


def est_maf_pallas(gl_tiles, p_ibd, S, macro=False):
    """Per-site MAF from pre-tiled linear GLs + current IBD posterior.

    gl_tiles: prepare_gl_tiles output (cache it: gl is constant across EM
    iterations). macro: linearised macro-stepping speed mode (True =
    (MACRO_K0, MACRO_M) from ops/maf.py; or an explicit (K0, M) tuple);
    False runs every damped pass at full width. Returns freq [S] f32.
    """
    gl0, gl1, gl2 = gl_tiles
    p = prepare_p_tiles(p_ibd)
    if macro is True:
        from .maf import macro_schedule

        macro = macro_schedule(gl0.shape[1])
    if macro:
        K0, M = macro
        freq = _run_macro(gl0, gl1, gl2, p, gl0.shape[1], K0, M)
    else:
        freq = _run(gl0, gl1, gl2, p, gl0.shape[1])
    return freq.reshape(-1)[:S]

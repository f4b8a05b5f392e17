"""Batched box-constrained L-BFGS for the per-individual (F, alpha) M-step.

The reference hands each individual's 2-parameter problem to a serial
L-BFGS-B 2.1 (f2c) with central-difference gradients, re-running a full
forward pass per function evaluation (reference: EM.cpp:423-439,
shared/bfgs.cpp:83-138, MVAL=10 / FACTR=1e6 / PGTOL=1e-3 at bfgs.h:23-25).

TPU-native redesign: ALL individuals are optimised simultaneously by one
projected L-BFGS whose state carries a batch axis -- every line-search
probe is a single batched objective evaluation (one HMM scan over all
individuals), and gradients come from autodiff instead of 2n extra forward
passes. Individuals converge independently via masking.

Algorithmic notes vs upstream L-BFGS-B: this uses gradient projection with
an active-set-masked two-loop recursion and a projected-path backtracking
Armijo search rather than the exact generalized-Cauchy-point + subspace
minimisation of Byrd/Lu/Nocedal/Zhu; stopping criteria (projected-gradient
inf-norm <= pgtol, relative f-decrease <= factr * eps_mach) match. For
n=2 smooth problems both converge to the same box-constrained optimum.

Fixed parameters (--indF_fixed / --alpha_fixed) are expressed exactly as
the reference does -- by pinning lower == upper == x0 (EM.cpp:429-436).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

MVAL = 10
FACTR = 1e6
PGTOL = 1e-3
EPS_MACH = 2.220446049250313e-16
MAX_LS = 25
ARMIJO_C1 = 1e-4
LS_LADDER = 8  # step sizes probed per (batched) line-search evaluation


class _State(NamedTuple):
    x: jnp.ndarray  # [B, n]
    f: jnp.ndarray  # [B]
    g: jnp.ndarray  # [B, n]
    S: jnp.ndarray  # [m, B, n]  history of steps s_j
    Y: jnp.ndarray  # [m, B, n]  history of grad diffs y_j
    valid: jnp.ndarray  # [m, B] bool
    head: jnp.ndarray  # scalar int32, next ring-buffer slot
    active: jnp.ndarray  # [B] bool
    it: jnp.ndarray  # scalar int32


def _two_loop(g, S, Y, valid, head, m):
    """Batched two-loop recursion: d = -H g restricted to valid history."""
    B, n = g.shape
    eps = 1e-12

    # iterate newest -> oldest: slot order head-1, head-2, ...
    idx_new2old = (head - 1 - jnp.arange(m)) % m

    def bwd(q, j):
        s, y, v = S[j], Y[j], valid[j]
        sy = jnp.sum(s * y, axis=-1)
        rho = jnp.where(v & (sy > eps), 1.0 / jnp.where(sy == 0, 1.0, sy), 0.0)
        a = rho * jnp.sum(s * q, axis=-1)
        q = q - a[:, None] * y * jnp.where(v, 1.0, 0.0)[:, None]
        return q, a

    q, alphas = jax.lax.scan(bwd, g, idx_new2old)

    # H0 scaling from newest valid pair
    j_new = (head - 1) % m
    s_n, y_n, v_n = S[j_new], Y[j_new], valid[j_new]
    yy = jnp.sum(y_n * y_n, axis=-1)
    sy = jnp.sum(s_n * y_n, axis=-1)
    gamma = jnp.where(v_n & (yy > eps), sy / jnp.where(yy == 0, 1.0, yy), 1.0)
    gamma = jnp.clip(gamma, 1e-8, 1e8)
    r = gamma[:, None] * q

    def fwd(r, inp):
        j, a = inp
        s, y, v = S[j], Y[j], valid[j]
        sy = jnp.sum(s * y, axis=-1)
        rho = jnp.where(v & (sy > eps), 1.0 / jnp.where(sy == 0, 1.0, sy), 0.0)
        b = rho * jnp.sum(y * r, axis=-1)
        r = r + (a - b)[:, None] * s * jnp.where(v, 1.0, 0.0)[:, None]
        return r, None

    idx_old2new = idx_new2old[::-1]
    r, _ = jax.lax.scan(fwd, r, (idx_old2new, alphas[::-1]))
    return -r


def lbfgsb_minimize(
    fun: Callable,
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    m: int = MVAL,
    max_iters: int = 60,
    pgtol: float = PGTOL,
    factr: float = FACTR,
    value_and_grad: Callable | None = None,
    fun_multi: Callable | None = None,
):
    """Minimise a batched objective within box bounds.

    fun: x [B, n] -> f [B]  (independent per batch row; autodiff-able)
    x0, lower, upper: [B, n]
    value_and_grad: optional x -> (f [B], g [B, n]) override; supply an
        analytic gradient (e.g. hmm.loglik_value_and_grad) when reverse-
        mode through the objective is expensive.
    fun_multi: optional x [K, B, n] -> f [K, B] evaluating K step-size
        candidates at once (defaults to vmap(fun)); one such call probes
        a whole backtracking ladder, collapsing the line-search loop to
        ~1 sequential objective evaluation.
    Returns (x_opt [B, n], f_opt [B], n_outer_iters).
    """
    B, n = x0.shape
    dtype = x0.dtype
    x0 = jnp.clip(x0, lower, upper)

    if value_and_grad is None:

        def value_and_grad(x):
            f, vjp = jax.vjp(fun, x)
            (g,) = vjp(jnp.ones_like(f))
            return f, g

    if fun_multi is None:
        fun_multi = jax.vmap(fun)

    f0, g0 = value_and_grad(x0)

    def proj(x):
        return jnp.clip(x, lower, upper)

    def pg_norm(x, g):
        return jnp.max(jnp.abs(proj(x - g) - x), axis=-1)

    init = _State(
        x=x0,
        f=f0,
        g=g0,
        S=jnp.zeros((m, B, n), dtype),
        Y=jnp.zeros((m, B, n), dtype),
        valid=jnp.zeros((m, B), bool),
        head=jnp.asarray(0, jnp.int32),
        active=pg_norm(x0, g0) > pgtol,
        it=jnp.asarray(0, jnp.int32),
    )

    def cond(st: _State):
        return jnp.any(st.active) & (st.it < max_iters)

    def body(st: _State):
        # freeze bound-pinned coordinates whose gradient points outward
        at_lo = (st.x <= lower) & (st.g > 0)
        at_hi = (st.x >= upper) & (st.g < 0)
        frozen = at_lo | at_hi
        g_eff = jnp.where(frozen, 0.0, st.g)

        d = _two_loop(g_eff, st.S, st.Y, st.valid, st.head, m)
        d = jnp.where(frozen, 0.0, d)
        # fall back to steepest descent when d is not a descent direction
        descent = jnp.sum(d * g_eff, axis=-1) < 0
        d = jnp.where(descent[:, None], d, -g_eff)

        # Projected-path backtracking Armijo search, whole ladders of
        # candidate steps per objective call: round r probes
        # t = scale * {1, 1/2, ..., 2^(1-K)} for every row at once and
        # keeps each row's LARGEST accepted t (identical accept test and
        # order as one-at-a-time halving).
        ladder = (2.0 ** -jnp.arange(LS_LADDER, dtype=dtype))  # [K]

        def ls_round(ls):
            scale, f_try, x_try, need = ls
            ts = scale[None, :] * ladder[:, None]  # [K, B]
            x_cand = proj(st.x[None] + ts[:, :, None] * d[None])  # [K,B,n]
            f_cand = fun_multi(x_cand)  # [K, B]
            dec = jnp.sum(st.g[None] * (x_cand - st.x[None]), axis=-1)
            moved = jnp.any(x_cand != st.x[None], axis=-1)
            ok = (
                (f_cand <= st.f[None] + ARMIJO_C1 * dec)
                & moved
                & jnp.isfinite(f_cand)
            )  # [K, B]
            any_ok = jnp.any(ok, axis=0)
            first = jnp.argmax(ok, axis=0)  # largest accepted t (K-order)
            f_sel = jnp.take_along_axis(f_cand, first[None], axis=0)[0]
            x_sel = jnp.take_along_axis(
                x_cand, first[None, :, None], axis=0
            )[0]
            acc = need & any_ok
            f_try = jnp.where(acc, f_sel, f_try)
            x_try = jnp.where(acc[:, None], x_sel, x_try)
            still = need & ~any_ok
            scale = jnp.where(still, scale * ladder[-1] * 0.5, scale)
            still = still & (scale > 1e-12)
            return (scale, f_try, x_try, still)

        ls0 = (jnp.ones((B,), dtype), st.f, st.x, st.active)
        _, f_new, x_new, _ = jax.lax.while_loop(
            lambda ls: jnp.any(ls[3]), ls_round, ls0
        )

        f_new2, g_new = value_and_grad(x_new)
        # keep previous values for inactive rows
        x_new = jnp.where(st.active[:, None], x_new, st.x)
        f_new = jnp.where(st.active, f_new, st.f)
        g_new = jnp.where(st.active[:, None], g_new, st.g)

        s_vec = x_new - st.x
        y_vec = g_new - st.g
        sy = jnp.sum(s_vec * y_vec, axis=-1)
        store = st.active & (sy > 1e-12)
        slot = st.head % m
        S = st.S.at[slot].set(jnp.where(store[:, None], s_vec, st.S[slot]))
        Y = st.Y.at[slot].set(jnp.where(store[:, None], y_vec, st.Y[slot]))
        valid = st.valid.at[slot].set(jnp.where(store, True, st.valid[slot]))
        head = st.head + 1

        small_pg = pg_norm(x_new, g_new) <= pgtol
        rel_dec = (st.f - f_new) <= factr * EPS_MACH * jnp.maximum(
            jnp.maximum(jnp.abs(st.f), jnp.abs(f_new)), 1.0
        )
        no_move = jnp.all(s_vec == 0, axis=-1)
        active = st.active & ~small_pg & ~(rel_dec | no_move)

        return _State(x_new, f_new, g_new, S, Y, valid, head, active, st.it + 1)

    out = jax.lax.while_loop(cond, body, init)
    return out.x, out.f, out.it

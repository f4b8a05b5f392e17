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

ONE algorithm, two execution backends sharing `_lbfgsb_core`:
  - `lbfgsb_minimize`: jnp arrays + `lax.while_loop`, traceable inside the
    jitted EM iteration (models/em.py, parallel/site_sharded.py).
  - `lbfgsb_minimize_host`: np arrays + Python loops, for objectives that
    stream host-resident data and therefore cannot be traced
    (models/streaming.py). Identical update rules by construction.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


def _two_loop(xp, g, S, Y, valid, head, m):
    """Batched two-loop recursion: d = -H g restricted to valid history.

    Written against `xp` (numpy or jax.numpy); the slot loop is a Python
    loop over the static history length m (unrolled in the jit trace),
    newest slot first: head-1, head-2, ...
    """
    eps = 1e-12

    q = g
    alphas = []
    for i in range(m):
        j = (head - 1 - i) % m
        s, y, v = S[j], Y[j], valid[j]
        sy = xp.sum(s * y, axis=-1)
        rho = xp.where(v & (sy > eps), 1.0 / xp.where(sy == 0, 1.0, sy), 0.0)
        a = rho * xp.sum(s * q, axis=-1)
        q = q - a[:, None] * y * xp.where(v, 1.0, 0.0)[:, None]
        alphas.append((j, a))

    # H0 scaling from newest valid pair
    j_new = (head - 1) % m
    s_n, y_n, v_n = S[j_new], Y[j_new], valid[j_new]
    yy = xp.sum(y_n * y_n, axis=-1)
    sy = xp.sum(s_n * y_n, axis=-1)
    gamma = xp.where(v_n & (yy > eps), sy / xp.where(yy == 0, 1.0, yy), 1.0)
    gamma = xp.clip(gamma, 1e-8, 1e8)
    r = gamma[:, None] * q

    for j, a in reversed(alphas):
        s, y, v = S[j], Y[j], valid[j]
        sy = xp.sum(s * y, axis=-1)
        rho = xp.where(v & (sy > eps), 1.0 / xp.where(sy == 0, 1.0, sy), 0.0)
        b = rho * xp.sum(y * r, axis=-1)
        r = r + (a - b)[:, None] * s * xp.where(v, 1.0, 0.0)[:, None]
    return -r


def _py_while(cond, body, val):
    while cond(val):
        val = body(val)
    return val


def _lbfgsb_core(
    xp,
    while_loop,
    set_at,
    fun: Callable,
    x0,
    lower,
    upper,
    m: int,
    max_iters: int,
    pgtol: float,
    factr: float,
    value_and_grad: Callable,
    fun_multi: Callable,
):
    """Backend-agnostic projected L-BFGS. See `lbfgsb_minimize` for the
    argument contract; `xp` is numpy or jax.numpy, `while_loop` is
    lax.while_loop or a Python loop, `set_at(arr, idx, val)` is the
    functional index-update primitive of the backend."""
    B, n = x0.shape
    dtype = x0.dtype
    x0 = xp.clip(x0, lower, upper)

    f0, g0 = value_and_grad(x0)

    def proj(x):
        return xp.clip(x, lower, upper)

    def pg_norm(x, g):
        return xp.max(xp.abs(proj(x - g) - x), axis=-1)

    init = _State(
        x=x0,
        f=f0,
        g=g0,
        S=xp.zeros((m, B, n), dtype),
        Y=xp.zeros((m, B, n), dtype),
        valid=xp.zeros((m, B), bool),
        head=xp.asarray(0, xp.int32),
        active=pg_norm(x0, g0) > pgtol,
        it=xp.asarray(0, xp.int32),
    )

    def cond(st: _State):
        return xp.any(st.active) & (st.it < max_iters)

    def body(st: _State):
        # freeze bound-pinned coordinates whose gradient points outward
        at_lo = (st.x <= lower) & (st.g > 0)
        at_hi = (st.x >= upper) & (st.g < 0)
        frozen = at_lo | at_hi
        g_eff = xp.where(frozen, 0.0, st.g)

        d = _two_loop(xp, g_eff, st.S, st.Y, st.valid, st.head, m)
        d = xp.where(frozen, 0.0, d)
        # fall back to steepest descent when d is not a descent direction
        descent = xp.sum(d * g_eff, axis=-1) < 0
        d = xp.where(descent[:, None], d, -g_eff)

        # Projected-path backtracking Armijo search, whole ladders of
        # candidate steps per objective call: round r probes
        # t = scale * {1, 1/2, ..., 2^(1-K)} for every row at once and
        # keeps each row's LARGEST accepted t (identical accept test and
        # order as one-at-a-time halving). For streamed objectives each
        # round is ONE data pass, not LS_LADDER passes.
        ladder = 2.0 ** -xp.arange(LS_LADDER, dtype=dtype)  # [K]

        def ls_round(ls):
            scale, f_try, x_try, need = ls
            ts = scale[None, :] * ladder[:, None]  # [K, B]
            x_cand = proj(st.x[None] + ts[:, :, None] * d[None])  # [K,B,n]
            f_cand = fun_multi(x_cand)  # [K, B]
            dec = xp.sum(st.g[None] * (x_cand - st.x[None]), axis=-1)
            moved = xp.any(x_cand != st.x[None], axis=-1)
            ok = (
                (f_cand <= st.f[None] + ARMIJO_C1 * dec)
                & moved
                & xp.isfinite(f_cand)
            )  # [K, B]
            any_ok = xp.any(ok, axis=0)
            first = xp.argmax(ok, axis=0)  # largest accepted t (K-order)
            f_sel = xp.take_along_axis(f_cand, first[None], axis=0)[0]
            x_sel = xp.take_along_axis(
                x_cand, first[None, :, None], axis=0
            )[0]
            acc = need & any_ok
            f_try = xp.where(acc, f_sel, f_try)
            x_try = xp.where(acc[:, None], x_sel, x_try)
            still = need & ~any_ok
            scale = xp.where(still, scale * ladder[-1] * 0.5, scale)
            still = still & (scale > 1e-12)
            return (scale, f_try, x_try, still)

        ls0 = (xp.ones((B,), dtype), st.f, st.x, st.active)
        _, f_new, x_new, _ = while_loop(
            lambda ls: xp.any(ls[3]), ls_round, ls0
        )

        f_new2, g_new = value_and_grad(x_new)
        # keep previous values for inactive rows
        x_new = xp.where(st.active[:, None], x_new, st.x)
        f_new = xp.where(st.active, f_new, st.f)
        g_new = xp.where(st.active[:, None], g_new, st.g)

        s_vec = x_new - st.x
        y_vec = g_new - st.g
        sy = xp.sum(s_vec * y_vec, axis=-1)
        store = st.active & (sy > 1e-12)
        slot = st.head % m
        S = set_at(st.S, slot, xp.where(store[:, None], s_vec, st.S[slot]))
        Y = set_at(st.Y, slot, xp.where(store[:, None], y_vec, st.Y[slot]))
        valid = set_at(
            st.valid, slot, xp.where(store, True, st.valid[slot])
        )
        head = st.head + 1

        small_pg = pg_norm(x_new, g_new) <= pgtol
        rel_dec = (st.f - f_new) <= factr * EPS_MACH * xp.maximum(
            xp.maximum(xp.abs(st.f), xp.abs(f_new)), 1.0
        )
        no_move = xp.all(s_vec == 0, axis=-1)
        active = st.active & ~small_pg & ~(rel_dec | no_move)

        return _State(
            x_new, f_new, g_new, S, Y, valid, head, active, st.it + 1
        )

    out = while_loop(cond, body, init)
    return out.x, out.f, out.it


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
    """Minimise a batched objective within box bounds (traceable/jittable).

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
    if value_and_grad is None:

        def value_and_grad(x):
            f, vjp = jax.vjp(fun, x)
            (g,) = vjp(jnp.ones_like(f))
            return f, g

    if fun_multi is None:
        fun_multi = jax.vmap(fun)

    return _lbfgsb_core(
        jnp,
        jax.lax.while_loop,
        lambda arr, idx, val: arr.at[idx].set(val),
        fun,
        x0,
        lower,
        upper,
        m,
        max_iters,
        pgtol,
        factr,
        value_and_grad,
        fun_multi,
    )


def _np_set_at(arr, idx, val):
    arr = arr.copy()
    arr[idx] = val
    return arr


def lbfgsb_minimize_host(
    fun: Callable,
    x0: np.ndarray,
    lower: np.ndarray,
    upper: np.ndarray,
    m: int = MVAL,
    max_iters: int = 60,
    pgtol: float = PGTOL,
    factr: float = FACTR,
    value_and_grad: Callable | None = None,
    fun_multi: Callable | None = None,
):
    """NumPy/Python-loop backend of the SAME algorithm, for host-streamed
    objectives that cannot be traced (models/streaming.py). `fun` may be
    None when both value_and_grad and fun_multi are supplied."""
    if value_and_grad is None:
        raise ValueError("host backend needs an explicit value_and_grad")
    if fun_multi is None:
        fun_multi = lambda cands: np.stack([fun(c) for c in cands])

    x0 = np.asarray(x0)
    return _lbfgsb_core(
        np,
        _py_while,
        _np_set_at,
        fun,
        x0,
        np.asarray(lower, x0.dtype),
        np.asarray(upper, x0.dtype),
        m,
        max_iters,
        pgtol,
        factr,
        value_and_grad,
        fun_multi,
    )

"""Max-shifted log-sum-exp, ULP-matched to the reference.

The reference computes ``log(sum_i exp(a_i))`` by shifting by the maximum
and summing in index order (reference: shared/gen_func.cpp:135-151). The
functions here replicate that exact operation order so that float64
compat-mode results agree to the ULP; they are all shape-polymorphic and
jit/vmap-safe.
"""

import jax.numpy as jnp


def logsum2(a, b):
    """log(exp(a) + exp(b)), elementwise. Matches gen_func.cpp:155-160."""
    m = jnp.maximum(a, b)
    # exp(-inf - m) == 0 for finite m; only the all--inf case needs a guard
    # (exp(nan) otherwise).
    s = jnp.exp(a - m) + jnp.exp(b - m)
    out = jnp.log(s) + m
    return jnp.where(jnp.isneginf(m), -jnp.inf, out)


def logsum3(a, b, c):
    """log(exp(a)+exp(b)+exp(c)) summed in index order (gen_func.cpp:164-169)."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    s = (jnp.exp(a - m) + jnp.exp(b - m)) + jnp.exp(c - m)
    out = jnp.log(s) + m
    return jnp.where(jnp.isneginf(m), -jnp.inf, out)


def logsum(a, axis=-1):
    """log-sum-exp over ``axis`` with left-to-right summation order.

    Matches the loop in gen_func.cpp:135-151 for any n. Uses a plain sum,
    which XLA evaluates in index order for small trailing axes; for the
    n<=4 cases used in the hot paths prefer :func:`logsum2`/:func:`logsum3`.
    """
    m = jnp.max(a, axis=axis, keepdims=True)
    s = jnp.sum(jnp.exp(a - m), axis=axis)
    m = jnp.squeeze(m, axis=axis)
    out = jnp.log(s) + m
    return jnp.where(jnp.isneginf(m), -jnp.inf, out)

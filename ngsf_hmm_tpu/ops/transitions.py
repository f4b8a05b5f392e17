"""Distance-dependent two-state transition model.

The IBD process switches between states {0 = non-IBD, 1 = IBD} with a
stationary distribution ``q = [1-F, F]`` and a distance-decay mixing rate:

    T_d[k, l] = (1 - exp(-alpha * d)) * q[l] + delta_{kl} * exp(-alpha * d)

with ``d`` the inter-site distance in megabases (reference:
shared/HMM.cpp:130-139). ``d = +inf`` (chromosome break) collapses the row
to the stationary ``q`` -- a natural reset point for blocked site scans.
"""

import jax.numpy as jnp


def log_q(F):
    """Stationary log-distribution [..., 2] from inbreeding F (EM.cpp:415)."""
    return jnp.log(jnp.stack([1.0 - F, F], axis=-1))


def log_trans(F, alpha, dist):
    """Log transition matrices.

    F, alpha: [...] (typically [n_ind]); dist: scalar or broadcastable.
    Returns [..., 2, 2] log T with [k, l] = from-state k, to-state l.
    """
    F, alpha = jnp.broadcast_arrays(jnp.asarray(F), jnp.asarray(alpha))
    x = jnp.exp(-alpha * dist)  # coancestry-change survival prob
    q = jnp.stack([1.0 - F, F], axis=-1)  # [..., 2]
    stay = jnp.eye(2, dtype=q.dtype)
    T = (1.0 - x)[..., None, None] * q[..., None, :] + x[..., None, None] * stay
    return jnp.log(T)


def trans(F, alpha, dist):
    """Linear-space transition matrices [..., 2, 2] (speed-mode kernels)."""
    F, alpha = jnp.broadcast_arrays(jnp.asarray(F), jnp.asarray(alpha))
    x = jnp.exp(-alpha * dist)
    q = jnp.stack([1.0 - F, F], axis=-1)
    stay = jnp.eye(2, dtype=q.dtype)
    return (1.0 - x)[..., None, None] * q[..., None, :] + x[..., None, None] * stay

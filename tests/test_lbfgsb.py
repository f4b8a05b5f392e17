"""Batched box-constrained L-BFGS tests on problems with known optima."""

import numpy as np
import jax.numpy as jnp

from ngsf_hmm_tpu.models.lbfgsb import lbfgsb_minimize


def test_batched_quadratics():
    # f_b(x) = sum_i c_bi (x_i - mu_bi)^2, optimum = clip(mu, l, u)
    rng = np.random.default_rng(0)
    B, n = 16, 2
    mu = rng.uniform(-2, 2, size=(B, n))
    c = rng.uniform(0.5, 4.0, size=(B, n))
    lower = np.full((B, n), -1.0)
    upper = np.full((B, n), 1.0)

    def fun(x):
        return jnp.sum(jnp.asarray(c) * (x - jnp.asarray(mu)) ** 2, axis=-1)

    x0 = jnp.zeros((B, n))
    x, f, it = lbfgsb_minimize(fun, x0, jnp.asarray(lower), jnp.asarray(upper))
    want = np.clip(mu, lower, upper)
    np.testing.assert_allclose(np.asarray(x), want, atol=2e-3)


def test_rosenbrock_in_box():
    B = 8
    lower = jnp.tile(jnp.array([[-2.0, -2.0]]), (B, 1))
    upper = jnp.tile(jnp.array([[2.0, 2.0]]), (B, 1))

    def fun(x):
        a, b = x[:, 0], x[:, 1]
        return (1 - a) ** 2 + 100 * (b - a**2) ** 2

    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-1.5, 1.5, size=(B, 2)))
    x, f, it = lbfgsb_minimize(fun, x0, lower, upper, max_iters=300)
    np.testing.assert_allclose(np.asarray(x), np.ones((B, 2)), atol=5e-3)


def test_pinned_coordinates():
    # lower == upper pins a coordinate exactly (the fixed-F/fixed-alpha path,
    # EM.cpp:429-436)
    B = 4

    def fun(x):
        return jnp.sum((x - 3.0) ** 2, axis=-1)

    x0 = jnp.full((B, 2), 0.7)
    lower = jnp.stack([jnp.full((B,), 0.7), jnp.full((B,), -10.0)], axis=-1)
    upper = jnp.stack([jnp.full((B,), 0.7), jnp.full((B,), 10.0)], axis=-1)
    x, f, it = lbfgsb_minimize(fun, x0, lower, upper)
    np.testing.assert_allclose(np.asarray(x[:, 0]), 0.7, atol=0)
    np.testing.assert_allclose(np.asarray(x[:, 1]), 3.0, atol=1e-3)


def test_hmm_objective_improves_loglik():
    """Optimising (F, alpha) on the real forward-likelihood objective
    increases the likelihood and stays inside the reference bounds."""
    import oracle
    from ngsf_hmm_tpu.models.hmm import forward_loglik
    from ngsf_hmm_tpu.utils.constants import F_MIN, F_MAX, ALPHA_MIN, ALPHA_MAX

    rng = np.random.default_rng(5)
    gl, freq, dist, F, alpha, e = oracle.random_case(rng, S=120, N=6)
    e_j, d_j = jnp.asarray(e), jnp.asarray(dist)

    def fun(x):
        return -forward_loglik(x[:, 0], x[:, 1], e_j, d_j)

    x0 = jnp.stack([jnp.asarray(F), jnp.asarray(alpha)], axis=-1)
    lower = jnp.tile(jnp.array([[F_MIN, ALPHA_MIN]]), (6, 1))
    upper = jnp.tile(jnp.array([[F_MAX, ALPHA_MAX]]), (6, 1))
    x, f, it = lbfgsb_minimize(fun, x0, lower, upper)
    f0 = fun(x0)
    assert np.all(np.asarray(f) <= np.asarray(f0) + 1e-9)
    assert np.all(np.asarray(x) >= np.asarray(lower))
    assert np.all(np.asarray(x) <= np.asarray(upper))

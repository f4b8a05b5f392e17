"""v2 GL-fused Pallas kernels vs the f64 sequential oracle kernels.

The v2 layer (hmm_pallas "gl layout") streams genotype-likelihood slabs
plus per-site freq/dist compacts and computes emissions IN-KERNEL
(reference math shared/HMM.cpp:144-154 + gen_func.cpp:938-957), instead
of streaming prebuilt emission slabs. These tests pin it against the
same sequential f64 oracle as the v1 kernels (tests/test_hmm_pallas.py),
plus cross-checks against v1 on identical inputs.

Run in interpreter mode on CPU CI (identical kernel code paths to TPU);
f32 tolerances as in the blocked-linear tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from ngsf_hmm_tpu.models.hmm import (
    forward_loglik,
    loglik_value_and_grad,
    posteriors,
)
from ngsf_hmm_tpu.models import hmm_pallas as hp

RNG = np.random.default_rng(37)


def _case(S, N, br=0):
    gl, freq, dist, F, alpha, e = oracle.random_case(
        RNG, S=S, N=N, chrom_break_every=br
    )
    gl_lin = jnp.exp(jnp.asarray(np.transpose(gl, (1, 0, 2))))  # [S, N, 3]
    return (gl_lin, jnp.asarray(freq), jnp.asarray(dist), jnp.asarray(F),
            jnp.asarray(alpha), jnp.asarray(e))


def _prep(gl_lin, freq, dist, bs=None, nb_p=None):
    prep2 = hp.prepare_gl_inputs(gl_lin, dist, bs=bs, nb_p=nb_p)
    fc = hp.freq_compact(freq, prep2)
    return prep2, fc


@pytest.mark.parametrize("S,N,br", [
    (61, 4, 17), (128, 8, 0), (333, 5, 101), (40, 3, 0), (130, 11, 0),
])
def test_fused_loglik_matches(S, N, br):
    gl_lin, freq, dist, F, alpha, e = _case(S, N, br)
    prep2, fc = _prep(gl_lin, freq, dist)
    ll_p = hp.forward_loglik_fused(F[None], alpha[None], prep2, fc)[0]
    ll_s = forward_loglik(F, alpha, e, dist)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_s), rtol=2e-6)


def test_fused_loglik_explicit_geometry():
    """Non-default bs/nb_p (multi-row blocks, partial lane groups)."""
    gl_lin, freq, dist, F, alpha, e = _case(517, 9, 100)
    prep2, fc = _prep(gl_lin, freq, dist, bs=3, nb_p=256)
    ll_p = hp.forward_loglik_fused(F[None], alpha[None], prep2, fc)[0]
    ll_s = forward_loglik(F, alpha, e, dist)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_s), rtol=2e-6)


def test_fused_loglik_candidate_batch():
    gl_lin, freq, dist, F, alpha, e = _case(77, 4, 13)
    prep2, fc = _prep(gl_lin, freq, dist)
    Fs = jnp.stack([F, F * 0.7, jnp.clip(F * 1.2, 0, 0.99)])
    As = jnp.stack([alpha, alpha * 2.0, alpha * 0.5])
    ll_b = hp.forward_loglik_fused(Fs, As, prep2, fc)
    for k in range(3):
        ll_s = forward_loglik(Fs[k].astype(jnp.float64),
                              As[k].astype(jnp.float64), e, dist)
        np.testing.assert_allclose(np.asarray(ll_b[k]), np.asarray(ll_s),
                                   rtol=2e-6)


@pytest.mark.parametrize("S,N,br", [(61, 4, 17), (200, 6, 47)])
def test_fused_value_and_grad_matches(S, N, br):
    gl_lin, freq, dist, F, alpha, e = _case(S, N, br)
    prep2, fc = _prep(gl_lin, freq, dist)
    L_p, gF_p, ga_p = hp.loglik_value_and_grad_fused(F, alpha, prep2, fc)
    L_s, gF_s, ga_s = loglik_value_and_grad(F, alpha, e, dist)
    np.testing.assert_allclose(np.asarray(L_p), np.asarray(L_s), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(gF_p), np.asarray(gF_s), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_s), rtol=2e-3)


@pytest.mark.parametrize("S,N,br", [(61, 4, 17), (150, 5, 0)])
def test_fused_posteriors_match(S, N, br):
    gl_lin, freq, dist, F, alpha, e = _case(S, N, br)
    prep2, fc = _prep(gl_lin, freq, dist)
    p_p, llf_p, llb_p = hp.posteriors_fused(F, alpha, prep2, fc)
    p_s, llf_s, llb_s = posteriors(e, dist, F, alpha)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(llf_p), np.asarray(llf_s),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(llb_p), np.asarray(llb_s),
                               rtol=2e-6)


def test_fused_posteriors_with_carries():
    """Boundary carries split the chain exactly like v1 (the streaming
    engine's chunk algebra)."""
    gl_lin, freq, dist, F, alpha, e = _case(120, 3, 0)
    cut = 64
    p_s, _, _ = posteriors(e, dist, F, alpha)
    # whole-chain transfer products of each half via the fused kernel
    prepA, fcA = _prep(gl_lin[:cut], freq[:cut], dist[:cut])
    prepB, fcB = _prep(gl_lin[cut:], freq[cut:], dist[cut:])
    A_rA, _ = hp.block_transfers_fused(F[None], alpha[None], prepA, fcA)
    A_rB, _ = hp.block_transfers_fused(F[None], alpha[None], prepB, fcB)
    TA, _ = hp.fold_transfers_pallas(A_rA)
    TB, _ = hp.fold_transfers_pallas(A_rB)
    TA, TB = np.asarray(TA[0], np.float64), np.asarray(TB[0], np.float64)
    q = np.stack([1.0 - np.asarray(F), np.asarray(F)], -1)
    v0B = np.einsum("nk,nkl->nl", q, TA)
    v0B /= v0B.max(-1, keepdims=True)
    wTA = np.einsum("nkl,nl->nk", TB, np.ones((3, 2)))
    wTA /= wTA.max(-1, keepdims=True)
    pA, _, _ = hp.posteriors_fused(
        F, alpha, prepA, fcA, wT=jnp.asarray(wTA, jnp.float32)
    )
    pB, _, _ = hp.posteriors_fused(
        F, alpha, prepB, fcB, v0=jnp.asarray(v0B, jnp.float32)
    )
    p_f = np.concatenate([np.asarray(pA), np.asarray(pB)])
    np.testing.assert_allclose(p_f, np.asarray(p_s), atol=3e-5)


def test_fused_matches_v1_on_same_inputs():
    """v1 (emission slabs) and v2 (gl slabs) agree to f32 rounding."""
    gl_lin, freq, dist, F, alpha, e = _case(90, 6, 31)
    prep2, fc = _prep(gl_lin, freq, dist)
    prep1 = hp.prepare_inputs(jnp.log(
        jnp.asarray(np.asarray(jnp.exp(e)), jnp.float64)), dist)
    ll2 = hp.forward_loglik_fused(F[None], alpha[None], prep2, fc)[0]
    ll1 = hp.forward_loglik_pallas(F[None], alpha[None], prep1)[0]
    np.testing.assert_allclose(np.asarray(ll2), np.asarray(ll1), rtol=3e-6)


def test_pad_individuals_are_inert():
    """N not a multiple of 8: pad-individual lanes must not leak into
    real outputs."""
    gl_lin, freq, dist, F, alpha, e = _case(50, 9, 0)
    prep2, fc = _prep(gl_lin, freq, dist)
    ll = hp.forward_loglik_fused(F[None], alpha[None], prep2, fc)[0]
    ll_s = forward_loglik(F, alpha, e, dist)
    assert ll.shape == (9,)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_s), rtol=2e-6)


def test_freq_compact_valid_mask():
    """site_compact's valid mask turns tail sites into exact no-ops
    (the streaming last-chunk padding path)."""
    gl_lin, freq, dist, F, alpha, e = _case(80, 4, 0)
    # chain over the first 60 sites only
    prep2 = hp.prepare_gl_inputs(gl_lin, dist)
    fc = hp.freq_compact(freq, prep2, valid=60)
    # pad rows must also kill the transition: d beyond valid -> 0
    dc = hp.site_compact(jnp.where(jnp.arange(80) >= 60, 0.0, dist),
                         prep2["bs"], prep2["nb_p"], 0.0)
    prep2 = dict(prep2, dc=dc)
    ll = hp.forward_loglik_fused(F[None], alpha[None], prep2, fc)[0]
    ll_s = forward_loglik(F, alpha, e[:60], dist[:60])
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_s), rtol=2e-6)


def test_pick_geom2():
    bs, nb_p = hp.pick_geom2(1_000_000, 100)
    assert nb_p % 128 == 0
    assert -(-1_000_000 // bs) <= nb_p
    nb, G, Np, C, bs_pad = hp._geom2(1_000_000, 100, bs, nb_p)
    assert C == G * nb_p and C <= hp.LANE_MAX
    assert bs_pad % hp._R_PAD == 0

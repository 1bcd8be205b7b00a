"""Pallas fused continuous-GMM scoring kernel vs the XLA formulation.

Runs in Pallas interpret mode on the CPU test mesh; on TPU the same kernel
compiles natively (ContinuousScorer auto-selects it, ops/gmm.py).
"""

import numpy as np
import jax.numpy as jnp

from cmusphinx_tpu.models.gauden import GaussianParams
from cmusphinx_tpu.ops.gmm import ContinuousScorer
from cmusphinx_tpu.ops.pallas_gmm import fused_mixture_scores


def _random_gauden(rng, S, K, D):
    means = rng.randn(S, 1, K, D).astype(np.float32)
    var = (0.3 + rng.rand(S, 1, K, D)).astype(np.float32)
    prec = (1.0 / (2.0 * var)).astype(np.float32)
    lrd = (-0.5 * (np.log(var).sum(-1) + D * np.log(2 * np.pi))
           ).astype(np.float32)
    return GaussianParams(means=means, var=var, prec=prec, lrd=lrd,
                          veclen=[D], n_mgau=S, n_feat=1, n_density=K)


def test_fused_matches_xla_unaligned_shapes():
    rng = np.random.RandomState(0)
    S, K, D, T = 37, 8, 13, 50          # deliberately tile-unaligned
    g = _random_gauden(rng, S, K, D)
    lnw = np.log(rng.dirichlet(np.ones(K), size=S)).astype(np.float32)
    sc = ContinuousScorer(g, lnw, use_pallas=False)
    x = rng.randn(T, D).astype(np.float32)
    ref = np.asarray(sc.score(jnp.asarray(x)))
    out = np.asarray(fused_mixture_scores(
        jnp.asarray(x), sc.lin, sc.quad, sc.const,
        n_sen=S, n_density=K, block_t=16, block_s=16, interpret=True))
    assert out.shape == (T, S)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-4)


def test_fused_matches_xla_aligned_shapes():
    rng = np.random.RandomState(1)
    S, K, D, T = 128, 4, 16, 32
    g = _random_gauden(rng, S, K, D)
    lnw = np.log(rng.dirichlet(np.ones(K), size=S)).astype(np.float32)
    sc = ContinuousScorer(g, lnw, use_pallas=False)
    x = rng.randn(T, D).astype(np.float32)
    ref = np.asarray(sc.score(jnp.asarray(x)))
    out = np.asarray(fused_mixture_scores(
        jnp.asarray(x), sc.lin, sc.quad, sc.const,
        n_sen=S, n_density=K, block_t=32, block_s=64, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-4)


def test_bf16_serving_mode_close_and_pallas_matches_xla():
    """-gmmprec bf16: parameters in bfloat16, one MXU pass, f32 accum.

    The bf16 path must (a) track the f32 scores within the bf16 rounding
    budget (~0.5 nats at these density magnitudes) and (b) agree between
    the XLA formulation and the Pallas kernel, which share the packing
    and rounding strategy (square in f32, then round the operands)."""
    rng = np.random.RandomState(2)
    S, K, D, T = 64, 8, 13, 40
    g = _random_gauden(rng, S, K, D)
    lnw = np.log(rng.dirichlet(np.ones(K), size=S)).astype(np.float32)
    x = jnp.asarray(rng.randn(T, D).astype(np.float32))
    f32 = np.asarray(ContinuousScorer(g, lnw, use_pallas=False).score(x))
    b16 = ContinuousScorer(g, lnw, use_pallas=False, precision="bf16")
    out16 = np.asarray(b16.score(x))
    assert np.max(np.abs(out16 - f32)) < 0.5
    # Pallas bf16 kernel vs the XLA bf16 path (same operand rounding).
    pal = np.asarray(fused_mixture_scores(
        x, np.asarray(b16.lin, np.float32), np.asarray(b16.quad, np.float32),
        b16.const, n_sen=S, n_density=K, block_t=16, block_s=16,
        interpret=True, precision="bf16"))
    np.testing.assert_allclose(pal, out16, rtol=1e-5, atol=5e-3)


def test_gmmprec_high_close_to_highest():
    rng = np.random.RandomState(3)
    S, K, D, T = 32, 4, 13, 20
    g = _random_gauden(rng, S, K, D)
    lnw = np.log(rng.dirichlet(np.ones(K), size=S)).astype(np.float32)
    x = jnp.asarray(rng.randn(T, D).astype(np.float32))
    f32 = np.asarray(ContinuousScorer(g, lnw, use_pallas=False).score(x))
    hi = np.asarray(ContinuousScorer(g, lnw, use_pallas=False,
                                     precision="high").score(x))
    assert np.max(np.abs(hi - f32)) < 0.05


def test_gmmprec_rejects_unknown():
    rng = np.random.RandomState(4)
    g = _random_gauden(rng, 8, 2, 5)
    lnw = np.log(rng.dirichlet(np.ones(2), size=8)).astype(np.float32)
    import pytest
    with pytest.raises(ValueError):
        ContinuousScorer(g, lnw, precision="int8")

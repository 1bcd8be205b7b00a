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

"""CDCN noise compensation (SphinxTrain cdcn_train/cdcn_norm capability).

Synthesizes noisy-channel cepstra with the model's OWN forward equation
(z = x + q + r(x, n, q)) and checks that the per-utterance environment EM
recovers the clean speech, the tilt, and the noise.
"""

import numpy as np
import pytest

from cmusphinx_tpu.frontend.cdcn import (CdcnModel, _cosine_matrix,
                                         _softplus_spec, train_cdcn)


def test_cosine_transform_involution():
    F = _cosine_matrix()
    n = F.shape[0] - 1
    np.testing.assert_allclose(F @ F, 2 * n * np.eye(n + 1), atol=1e-9)


def _synthetic(seed=0, T=400, D=13, K=6):
    rng = np.random.RandomState(seed)
    # Clean codebook: distinct speech modes + a silence mode (low c0).
    means = rng.randn(K, D) * 2.0
    means[:, 0] = np.linspace(4.0, 10.0, K)   # c0 energies
    sil = np.zeros(D)
    sil[0] = 1.0                              # low-energy silence mode
    means = np.vstack([sil, means])
    lab = rng.randint(0, K + 1, T)
    lab[:20] = 0                               # leading/trailing silence
    lab[-20:] = 0
    x = means[lab] + rng.randn(T, D) * 0.15
    return means, x, lab


def test_cdcn_recovers_clean_speech():
    means, x, lab = _synthetic()
    T, D = x.shape
    # True environment: a channel tilt and additive noise.
    tilt = np.zeros(D)
    tilt[:4] = [1.5, -0.8, 0.4, 0.2]
    noise = np.zeros(D)
    noise[0] = 2.5
    noise[1] = 0.5
    # Forward-corrupt with the model equation z = x + q + r(x).
    r = _softplus_spec(noise[None] - tilt[None] - x)
    z = x + tilt[None] + r

    model = train_cdcn([x], n_codes=8, n_iter=15)
    xhat, q_est, n_est, hist = model.norm(z, n_iter=6)

    err_before = np.abs(z - x).mean()
    err_after = np.abs(xhat - x).mean()
    assert err_after < 0.4 * err_before, (err_before, err_after)
    # EM likelihood is (approximately) non-decreasing.
    assert hist[-1] >= hist[0]
    # The tilt estimate tracks the true channel in the low quefrencies.
    assert np.abs(q_est[:4] - tilt[:4]).mean() < 0.5


def test_cdcn_identity_on_clean_data():
    """With no corruption the cleaned output stays close to the input."""
    means, x, lab = _synthetic(seed=3)
    model = train_cdcn([x], n_codes=8, n_iter=15)
    xhat, q_est, n_est, hist = model.norm(x, n_iter=4)
    # the MMSE estimate shrinks toward the codebook (inherent smoothing);
    # the check is that the ENVIRONMENT estimate stays near identity.
    assert np.abs(xhat - x).mean() < 0.6
    assert np.abs(q_est).mean() < 0.5


def test_codeword0_is_noise_mode():
    means, x, lab = _synthetic(seed=5)
    model = train_cdcn([x], n_codes=8, n_iter=10)
    assert model.means[0, 0] == model.means[:, 0].min()

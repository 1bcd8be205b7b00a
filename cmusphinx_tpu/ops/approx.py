"""Approximate-GMM evaluation family, dense/masked TPU formulations.

The reference's fast-GMM layer (sphinx3
libs3decoder/libam/approx_cont_mgau.c:108-276) combines four tricks to
avoid evaluating every Gaussian of every senone on a scalar CPU:

- frame downsampling (`-ds`): evaluate GMMs every ds-th frame, reuse the
  previous frame's scores in between (approx_cont_mgau.c:108-115);
- CIGMMS (`-cipbeam`): evaluate the (cheap) CI senones every frame; a CD
  senone is fully evaluated ONLY when its parent CI senone scores within
  a beam of the frame-best CI senone, otherwise its parent's score is
  substituted (approx_cont_mgau.c:150-200);
- Gaussian shortlists from sub-vector quantization (subvq.c — see
  ops/subvq.py) or VQ Gaussian selectors (gs.c) or kd-trees (kdtree.c).

On TPU the dense evaluation is a pair of GEMMs, so selective evaluation
saves nothing unless it removes whole GEMM rows/frames.  This module
provides the two tricks that CAN change TPU cost or accuracy —
downsampling (removes frames: real FLOP savings) and CIGMMS (masking
only: zero savings in the dense regime, kept for behavior parity) — in
exact masked/dense form, so `evals/run_approx_gmm.py` can measure each
trick's speed/WER trade on a real model and record the keep/reject
verdict (EVALS.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class DownsampledScorer:
    """Frame-downsampled senone scoring (reference -ds semantics):
    score frames [0, ds, 2ds, ...] and substitute the previous computed
    frame's scores for the skipped ones."""

    def __init__(self, scorer, ds_ratio: int = 2):
        if ds_ratio < 1:
            raise ValueError("ds_ratio must be >= 1")
        self.inner = scorer
        self.ds = int(ds_ratio)
        self.n_sen = scorer.n_sen

    def score(self, feats):
        T = feats.shape[0]
        if self.ds == 1 or T == 0:
            return self.inner.score(feats)
        base = self.inner.score(feats[:: self.ds])        # [ceil(T/ds), S]
        return jnp.repeat(base, self.ds, axis=0,
                          total_repeat_length=base.shape[0] * self.ds)[:T]

    def __call__(self, feats):
        return self.score(feats)


class CigmmsScorer:
    """CI-GMM selection (CIGMMS): CD senones whose parent CI senone falls
    below the frame-best CI score by more than `ci_pbeam` take the parent
    CI score instead of their own (approx_cont_mgau.c CIGMMS).

    Dense formulation: both CI and CD scores are computed (the GEMM does
    not get cheaper by masking), then the bypass is applied exactly — so
    this measures the ACCURACY cost of the trick at zero TPU speed gain,
    which is the verdict the reference's trade-off must be re-judged by
    on this hardware.

    cd2cisen: [n_sen] parent CI senone per senone (mdef.cd2cisen;
    CI senones map to themselves).
    """

    def __init__(self, scorer, cd2cisen: np.ndarray, n_ci_sen: int,
                 ci_pbeam: float = 7.0):
        self.inner = scorer
        self.n_sen = scorer.n_sen
        self.cd2ci = jnp.asarray(np.asarray(cd2cisen, np.int32))
        self.n_ci_sen = int(n_ci_sen)
        self.beam = float(ci_pbeam)

    def score(self, feats):
        s = self.inner.score(feats)                        # [T, S]
        ci = s[:, : self.n_ci_sen]
        best = jnp.max(ci, axis=1, keepdims=True)
        parent = s[:, self.cd2ci]                          # broadcastable
        keep = parent >= best - self.beam
        out = jnp.where(keep, s, parent)
        # CI senones always keep their own scores.
        return out.at[:, : self.n_ci_sen].set(ci)

    def __call__(self, feats):
        return self.score(feats)


class GsSelectorScorer:
    """VQ Gaussian-selector shortlists (sphinx3 gs.c / gausubvq's sibling
    `gs` backend): a coarse VQ codebook over the feature space maps each
    frame to its nearest cluster; only Gaussians associated with that
    cluster (assignment by their means) are evaluated exactly — the rest
    take a floor.  Dense-masked formulation: the full density matrix is
    computed (GEMMs don't get cheaper from masking on TPU) and
    non-shortlisted Gaussians are floored, measuring the trick's accuracy
    cost at its reference semantics.

    scorer: a ContinuousScorer (single-stream); n_clusters: VQ size;
    top_c: clusters kept per frame (gs_mgau_shortlist semantics).
    """

    def __init__(self, scorer, gauden, n_clusters: int = 64,
                 top_c: int = 2, floor: float = -40.0, seed: int = 0,
                 n_iter: int = 10):
        self.inner = scorer
        self.n_sen = scorer.n_sen
        S, K = gauden.n_mgau, gauden.n_density
        D = int(gauden.veclen[0])
        M = gauden.means[:, 0, :, :D].reshape(S * K, D).astype(np.float64)
        rng = np.random.RandomState(seed)
        C = min(n_clusters, len(M))
        cent = M[rng.choice(len(M), C, replace=False)].copy()
        for _ in range(n_iter):
            d = ((M[:, None] - cent[None]) ** 2).sum(-1)
            a = d.argmin(1)
            for c in range(C):
                m = a == c
                if m.any():
                    cent[c] = M[m].mean(0)
        d = ((M[:, None] - cent[None]) ** 2).sum(-1)
        self._assign = jnp.asarray(d.argmin(1).reshape(S, K)
                                   .astype(np.int32))
        self._cent = jnp.asarray(cent.astype(np.float32))     # [C, D]
        self.top_c = int(top_c)
        self.floor = float(floor)
        self._S, self._K, self._D = S, K, D

    def score(self, feats):
        x = feats[:, : self._D]
        # nearest clusters per frame
        d2 = ((x[:, None, :] - self._cent[None]) ** 2).sum(-1)  # [T, C]
        thr = -jax.lax.top_k(-d2, self.top_c)[0][:, -1:]
        keep_c = d2 <= thr                                      # [T, C]
        keep = keep_c[:, self._assign]                          # [T, S, K]
        ll = (self.inner.const[None, :]
              + jnp.dot(feats, self.inner.lin)
              - jnp.dot(feats * feats, self.inner.quad)
              ).reshape(feats.shape[0], self._S, self._K)
        best = jnp.max(ll, axis=(1, 2), keepdims=True)
        ll = jnp.where(keep, ll, best + self.floor)
        return jax.nn.logsumexp(ll, axis=-1)

    def __call__(self, feats):
        return self.score(feats)

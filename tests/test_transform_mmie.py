"""Tests for LDA/MLLT/MAP/deleted-interpolation transforms and MMIE EBW."""

import numpy as np
import pytest

from cmusphinx_tpu.train.bw import forward_backward, pack_batch
from cmusphinx_tpu.train.mmie import accumulate_mmie, ebw_update, lattice_den_batch
from cmusphinx_tpu.train.sentence_hmm import FlatModel, build_sentence_hmm
from cmusphinx_tpu.train.trainer import HmmParams, flat_start
from cmusphinx_tpu.train.transform import (
    apply_mllt_to_model, class_scatter_stats, deleted_interpolation,
    estimate_lda, estimate_mllt, map_adapt, mixw_interp, mllt_objective)


def _two_class_data(rng, n=400, d=4, sep=5.0):
    x0 = rng.normal(size=(n, d))
    x1 = rng.normal(size=(n, d))
    x1[:, 2] += sep  # classes separate along dim 2
    feats = np.concatenate([x0, x1]).astype(np.float32)
    labels = np.concatenate([np.zeros(n, np.int64), np.ones(n, np.int64)])
    return feats, labels


def test_lda_finds_discriminant_direction():
    rng = np.random.default_rng(0)
    feats, labels = _two_class_data(rng)
    counts, sums, sqsums = class_scatter_stats(feats, labels, 2)
    V = estimate_lda(counts, sums, sqsums, dim_out=2)
    assert V.shape == (2, 4)
    # Top discriminant should be dominated by dim 2.
    assert abs(V[0, 2]) > 0.9


def test_mllt_diagonalizes_rotated_covariances():
    rng = np.random.default_rng(1)
    d = 3
    # Random rotation applied to diagonal-covariance classes.
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    feats_list, labels_list = [], []
    for c, scales in enumerate([[1.0, 0.2, 0.05], [0.1, 1.5, 0.3]]):
        x = rng.normal(size=(500, d)) * np.asarray(scales)
        feats_list.append((x @ q.T) + 3.0 * c)
        labels_list.append(np.full(500, c, np.int64))
    feats = np.concatenate(feats_list).astype(np.float32)
    labels = np.concatenate(labels_list)
    counts, sums, sqsums = class_scatter_stats(feats, labels, 2)
    A = estimate_mllt(counts, sums, sqsums, n_iter=300, lr=5e-3)
    import jax.numpy as jnp
    # Objective must improve over identity.
    ok = counts > 0
    mean_c = sums / counts[:, None]
    cov = (sqsums / counts[:, None, None]
           - np.einsum("ci,cj->cij", mean_c, mean_c))
    li = float(mllt_objective(jnp.eye(d), jnp.asarray(cov, jnp.float32),
                              jnp.asarray(counts, jnp.float32)))
    la = float(mllt_objective(jnp.asarray(A), jnp.asarray(cov, jnp.float32),
                              jnp.asarray(counts, jnp.float32)))
    assert la < li - 1.0
    # Transformed covariances are closer to diagonal.
    def offdiag_ratio(M):
        pc = np.einsum("ij,cjk,lk->cil", M, cov, M)
        off = pc - np.eye(d) * pc
        return np.abs(off).sum() / np.abs(pc).sum()
    assert offdiag_ratio(np.asarray(A)) < 0.5 * offdiag_ratio(np.eye(d))


def test_apply_mllt_shapes():
    A = np.eye(3, dtype=np.float32)
    means = np.zeros((4, 2, 3), np.float32)
    var = np.ones((4, 2, 3), np.float32)
    m2, v2 = apply_mllt_to_model(A, means, var)
    np.testing.assert_allclose(v2, var, atol=1e-5)


def test_map_adapt_interpolates():
    S, K, D = 2, 1, 3
    params = HmmParams(
        means=np.zeros((S, K, D), np.float32),
        var=np.ones((S, K, D), np.float32),
        lnw=np.zeros((S, K), np.float32),
        tp=np.ones((1, 3, 4)) / 4.0)
    acc = {"mixw": np.full((S, K), 10.0),
           "mean": np.full((S, K, D), 10.0)}  # ML mean = 1.0
    # Large tau -> prior; small tau -> ML.
    near_prior = map_adapt(params, acc, tau=1e6)
    near_ml = map_adapt(params, acc, tau=1e-6)
    assert np.all(np.abs(near_prior.means) < 1e-3)
    np.testing.assert_allclose(near_ml.means, 1.0, atol=1e-3)
    mid = map_adapt(params, acc, tau=10.0)
    np.testing.assert_allclose(mid.means, 0.5, atol=1e-6)


def test_deleted_interpolation_prefers_consistent_model():
    rng = np.random.default_rng(2)
    S, K = 3, 8
    true_w = rng.dirichlet(np.ones(K), size=S)
    # CD counts: consistent draws from the true distribution per block.
    cd_blocks = [np.stack([rng.multinomial(500, true_w[s]) for s in range(S)])
                 .astype(float) for _ in range(3)]
    # CI counts: a very different distribution.
    wrong = rng.dirichlet(np.ones(K), size=1)
    ci_blocks = [np.stack([rng.multinomial(500, wrong[0]) for _ in range(S)])
                 .astype(float) for _ in range(3)]
    lam = deleted_interpolation(cd_blocks, ci_blocks,
                                sen2ci=np.zeros(S, np.int64))
    assert np.all(lam > 0.8)
    # Reverse: CI matches held-out data, CD blocks are noise.
    cd_noise = [np.stack([rng.multinomial(20, wrong[0]) for _ in range(S)])
                .astype(float) * 25 for _ in range(3)]
    ci_good = [np.stack([rng.multinomial(500, true_w[s]) for s in range(S)])
               .astype(float) for _ in range(3)]
    lam2 = deleted_interpolation(ci_good, cd_noise, np.zeros(S, np.int64))
    # here "cd" blocks = ci_good (match), "ci" = noise: lambda high again
    assert np.all(lam2 > 0.5)


def test_mixw_interp():
    a = np.asarray([[2.0, 2.0]], np.float64)
    b = np.asarray([[4.0, 0.0]], np.float64)
    out = mixw_interp(a, b, 0.5)
    np.testing.assert_allclose(out, [[0.75, 0.25]], atol=1e-6)
    out_a = mixw_interp(a, b, np.asarray([1.0]))
    np.testing.assert_allclose(out_a, [[0.5, 0.5]], atol=1e-6)


def _toy_corpus(rng, model, pron, words_list, params, n_per=6, T=24):
    """Sample feature sequences roughly matching each transcript."""
    feats = []
    trans = []
    for words in words_list:
        phones = []
        for w in words:
            phones += pron[w]
        for _ in range(n_per):
            fr = []
            for p in phones:
                pid = model.phone_id[p]
                for s in range(model.n_state):
                    sen = model.senone(pid, s)
                    mu = params.means[sen, 0]
                    fr.append(mu + 0.3 * rng.normal(size=mu.shape))
                    fr.append(mu + 0.3 * rng.normal(size=mu.shape))
            feats.append(np.asarray(fr, np.float32))
            trans.append(list(words))
    return feats, trans


def test_mmie_ebw_improves_objective():
    rng = np.random.default_rng(3)
    model = FlatModel.create(["A", "B", "SIL"], n_state=3)
    pron = {"aa": ["A"], "bb": ["B"]}
    D = 2
    # Ground-truth well-separated params used to sample data.
    true = HmmParams(
        means=rng.normal(size=(model.n_sen, 1, D)).astype(np.float32) * 3.0,
        var=np.ones((model.n_sen, 1, D), np.float32) * 0.2,
        lnw=np.zeros((model.n_sen, 1), np.float32),
        tp=model.init_tmat())
    feats, trans = _toy_corpus(rng, model, pron, [["aa"], ["bb"]], true)
    # Start from perturbed params.
    start = HmmParams(
        means=true.means + rng.normal(size=true.means.shape).astype(np.float32),
        var=np.ones_like(true.var) * 1.0,
        lnw=true.lnw, tp=true.tp)

    num_hmms = [build_sentence_hmm(t, pron, model, optional_sil=False)
                for t in trans]
    num_batch = pack_batch(num_hmms, feats)
    # Denominator: every utterance against BOTH words, weighted as if from
    # a lattice with equal posteriors.
    den_hmms, den_feats, den_w = [], [], []
    for f in feats:
        for w in ("aa", "bb"):
            den_hmms.append(build_sentence_hmm([w], pron, model,
                                               optional_sil=False))
            den_feats.append(f)
            den_w.append(0.5)
    den_batch = pack_batch(den_hmms, den_feats)
    den_w = np.asarray(den_w, np.float32)

    p = start
    objs = []
    for _ in range(3):
        num_acc, den_acc, obj = accumulate_mmie(num_batch, den_batch, den_w, p)
        objs.append(obj)
        p = ebw_update(p, num_acc, den_acc, E=2.0)
    _, _, obj_final = accumulate_mmie(num_batch, den_batch, den_w, p)
    objs.append(obj_final)
    assert objs[-1] > objs[0]
    assert np.all(np.isfinite(p.means)) and np.all(p.var > 0)


def test_lattice_den_batch_from_stub():
    class _Node:
        def __init__(self, word, sf, ef):
            self.word, self.sf, self.ef = word, sf, ef

    class _Lat:
        def __init__(self, nodes, post):
            self.nodes = nodes
            self._post = post

        def posterior(self, ascale):
            return np.log(self._post)

    model = FlatModel.create(["A", "B", "SIL"], n_state=3)
    pron = {"aa": ["A"], "bb": ["B"]}
    feats = np.random.default_rng(0).normal(size=(30, 2)).astype(np.float32)
    lat = _Lat([_Node("aa", 0, 9), _Node("bb", 5, 14),
                _Node("<sil>", 15, 20), _Node("aa", 10, 29)],
               np.asarray([0.9, 0.4, 0.5, 1e-6]))
    batch, w = lattice_den_batch(lat, feats, pron, model)
    assert len(w) == 3  # low-posterior node pruned
    np.testing.assert_allclose(w, [0.9, 0.4, 0.5], atol=1e-6)
    assert batch.feats.shape[0] == 3

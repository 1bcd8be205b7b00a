"""Unit tests for GMM scoring and HMM Viterbi kernels vs naive references."""

import numpy as np
import pytest

from cmusphinx_tpu.models.gauden import GaussianParams
from cmusphinx_tpu.ops.gmm import (ContinuousScorer, PTMScorer,
                                   SemiContinuousScorer, naive_semi_scores)
from cmusphinx_tpu.ops.hmm import NEG_INF, hmm_enter, hmm_init_state, hmm_step


def _rand_gauden(rng, n_mgau, n_feat, n_density, veclen):
    maxlen = max(veclen)
    means = np.zeros((n_mgau, n_feat, n_density, maxlen), np.float32)
    var = np.zeros_like(means)
    for f, ln in enumerate(veclen):
        means[:, f, :, :ln] = rng.randn(n_mgau, n_density, ln)
        var[:, f, :, :ln] = 0.5 + rng.rand(n_mgau, n_density, ln)
    prec = np.zeros_like(var)
    lrd = np.zeros((n_mgau, n_feat, n_density), np.float32)
    for f, ln in enumerate(veclen):
        v = var[:, f, :, :ln]
        prec[:, f, :, :ln] = 1.0 / (2.0 * v)
        lrd[:, f] = -0.5 * (np.log(v).sum(-1) + ln * np.log(2 * np.pi))
    return GaussianParams(means=means, var=var, prec=prec, lrd=lrd,
                          veclen=list(veclen), n_mgau=n_mgau, n_feat=n_feat,
                          n_density=n_density)


def test_semi_scorer_matches_naive():
    rng = np.random.RandomState(0)
    g = _rand_gauden(rng, 1, 3, 16, [5, 5, 5])
    S = 40
    lnw = np.log(rng.dirichlet(np.ones(16), size=(3, S)).transpose(0, 2, 1) + 1e-8).astype(np.float32)
    slices = [np.arange(0, 5), np.arange(5, 10), np.arange(10, 15)]
    feats = rng.randn(12, 15).astype(np.float32)
    sc = SemiContinuousScorer(g, lnw, slices)
    got = np.asarray(sc.score(feats))
    want = naive_semi_scores(feats, g, lnw, slices)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_semi_scorer_topn_close_to_exact():
    rng = np.random.RandomState(1)
    g = _rand_gauden(rng, 1, 1, 32, [10])
    S = 20
    lnw = np.log(rng.dirichlet(np.ones(32), size=(1, S)).transpose(0, 2, 1) + 1e-8).astype(np.float32)
    feats = rng.randn(6, 10).astype(np.float32)
    exact = np.asarray(SemiContinuousScorer(g, lnw, [np.arange(10)]).score(feats))
    top4 = np.asarray(SemiContinuousScorer(g, lnw, [np.arange(10)], topn=4).score(feats))
    # top-N is a lower bound, close to exact.
    assert (top4 <= exact + 1e-4).all()
    assert np.abs(top4 - exact).max() < 2.0


def test_continuous_scorer_matches_naive():
    rng = np.random.RandomState(2)
    S, K, D = 30, 8, 13
    g = _rand_gauden(rng, S, 1, K, [D])
    lnw = np.log(rng.dirichlet(np.ones(K), size=S) + 1e-8).astype(np.float32)
    feats = rng.randn(9, D).astype(np.float32)
    sc = ContinuousScorer(g, lnw)
    got = np.asarray(sc.score(feats))
    # naive
    want = np.zeros((9, S))
    for s in range(S):
        m, p, d0 = g.means[s, 0], g.prec[s, 0], g.lrd[s, 0]
        ll = d0[None] - ((feats[:, None, :] - m[None]) ** 2 * p[None]).sum(-1) + lnw[s][None]
        mx = ll.max(1, keepdims=True)
        want[:, s] = np.log(np.exp(ll - mx).sum(1)) + mx[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_ptm_scorer_matches_continuous_when_untied():
    rng = np.random.RandomState(3)
    S, K, D = 12, 4, 7
    g = _rand_gauden(rng, S, 1, K, [D])
    lnw = np.log(rng.dirichlet(np.ones(K), size=S) + 1e-8).astype(np.float32)
    feats = rng.randn(5, D).astype(np.float32)
    cont = np.asarray(ContinuousScorer(g, lnw).score(feats))
    ptm = np.asarray(PTMScorer(g, lnw, np.arange(S)).score(feats))
    np.testing.assert_allclose(ptm, cont, rtol=1e-4, atol=1e-4)


def test_semi_scorer_hub4(reference_root):
    from cmusphinx_tpu.frontend import Frontend, FeatPipeline
    from cmusphinx_tpu.frontend.fe import FE_ARGS
    from cmusphinx_tpu.frontend.feat import FEAT_ARGS
    from cmusphinx_tpu.models import Mdef, read_sendump
    from cmusphinx_tpu.models.gauden import read_gauden
    from cmusphinx_tpu.utils.bio import read_raw_audio
    from cmusphinx_tpu.utils.config import Config

    H = reference_root / "pocketsphinx/model/hmm/en_US/hub4wsj_sc_8k"
    cfg = Config(FE_ARGS, FEAT_ARGS, samprate=16000)
    cfg.update_from_file(str(H / "feat.params"))
    raw = read_raw_audio(reference_root / "pocketsphinx/test/data/goforward.raw")
    cep = Frontend(cfg).process(raw[:32000])
    fp = FeatPipeline(cfg)
    feats = np.asarray(fp.compute(cep))
    g = read_gauden(str(H / "means"), str(H / "variances"))
    w = read_sendump(str(H / "sendump"))
    sc = SemiContinuousScorer(g, w, fp.stream_slices())
    scores = np.asarray(sc.score(feats))
    assert scores.shape == (feats.shape[0], 5150)
    assert np.isfinite(scores).all()
    m = Mdef.read(str(H / "mdef"))
    # Leading frames are silence: the best CI senone should belong to SIL
    # (or a filler) for most of the first 20 frames.
    ci_scores = scores[:20, : m.n_ci_sen]
    best_ci = ci_scores.argmax(axis=1)
    phones = [int(m.sen2cimap[s]) for s in best_ci]
    frac_sil = np.mean([m.is_filler(p) for p in phones])
    assert frac_sil > 0.5, f"expected silence-dominated lead-in, got {phones}"


# ---------------------------------------------------------------------------
def _naive_hmm_step(alpha, hist, sen, tp):
    N, S = alpha.shape
    s = alpha + sen
    new = np.full_like(alpha, float(NEG_INF))
    nh = hist.copy()
    for n in range(N):
        for j in range(S):
            best, bsrc = -np.inf, j
            for i in (j, j - 1, j - 2):
                if i < 0:
                    continue
                c = s[n, i] + tp[n, i, j]
                if c > best:
                    best, bsrc = c, i
            new[n, j] = max(best, float(NEG_INF))
            nh[n, j] = hist[n, bsrc]
        # exit
    e1 = s[:, S - 1] + tp[:, S - 1, S]
    e2 = s[:, S - 2] + tp[:, S - 2, S] if S >= 2 else np.full(N, -np.inf)
    ex = np.maximum(e1, e2)
    exh = np.where(e1 >= e2, hist[:, S - 1], hist[:, S - 2])
    return new, nh, np.maximum(ex, float(NEG_INF)), exh


@pytest.mark.parametrize("S", [3, 5])
def test_hmm_step_matches_naive(S):
    rng = np.random.RandomState(4)
    N = 7
    alpha = rng.randn(N, S).astype(np.float32) * 3
    hist = rng.randint(0, 100, (N, S)).astype(np.int32)
    sen = rng.randn(N, S).astype(np.float32)
    tp = np.full((N, S, S + 1), float(NEG_INF), np.float32)
    for j in range(S):
        for k in range(j, min(j + 3, S + 1)):
            tp[:, j, k] = np.log(rng.rand(N) + 1e-3)
    na, nh, ex, exh = hmm_step(alpha, (hist,), sen, tp)
    wa, wh, wex, wexh = _naive_hmm_step(alpha, hist, sen, tp)
    np.testing.assert_allclose(np.asarray(na), wa, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ex), wex, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(nh[0]), wh)
    np.testing.assert_array_equal(np.asarray(exh[0]), wexh)


def test_hmm_enter():
    alpha, (hist,) = hmm_init_state(4, 3)
    entry = np.array([-5.0, -1.0, float(NEG_INF), -2.0], np.float32)
    ehist = np.array([10, 11, 12, 13], np.int32)
    na, (nh,) = hmm_enter(alpha, (hist,), entry, (ehist,))
    np.testing.assert_allclose(np.asarray(na)[:, 0], entry)
    assert np.asarray(nh)[1, 0] == 11
    # Worse entries do not overwrite live slots (slot 2 was NEG_INF, so -100 wins there).
    na2, (nh2,) = hmm_enter(na, (nh,), np.full(4, -100.0, np.float32),
                            (np.zeros(4, np.int32),))
    expect = entry.copy()
    expect[2] = -100.0
    np.testing.assert_allclose(np.asarray(na2)[:, 0], expect)


def test_viterbi_path_through_hmm():
    """A 3-state left-to-right HMM with deterministic transitions should
    walk its states in order and surface the entry payload at exit."""
    N, S = 1, 3
    tp = np.full((N, S, S + 1), float(NEG_INF), np.float32)
    for j in range(S):
        tp[:, j, j] = np.log(0.5)
        tp[:, j, j + 1] = np.log(0.5)
    alpha, (hist,) = hmm_init_state(N, S)
    alpha, (hist,) = hmm_enter(alpha, (hist,), np.array([0.0], np.float32),
                               (np.array([42], np.int32),))
    sen = np.zeros((N, S), np.float32)
    exits = []
    for t in range(5):
        alpha, (hist,), ex, (exh,) = hmm_step(alpha, (hist,), sen, tp)
        exits.append((float(ex[0]), int(exh[0])))
    # Exit becomes reachable after 2 frames (state 1 -> exit via skip? no:
    # exit from state 2 needs >= 3 frames; from state 1 via tp[1,3] is -inf).
    assert exits[0][0] <= float(NEG_INF)
    assert exits[2][0] > float(NEG_INF)
    assert exits[2][1] == 42

"""MLLR transform + senone score dump/replay tests."""

import numpy as np
import pytest

from cmusphinx_tpu.models.mllr import MllrTransform, solve_mllr
from cmusphinx_tpu.utils.senfh import ReplayScorer, read_senscr, write_senscr


def test_mllr_read_shipped(reference_root):
    """Read the shipped sphinx3 hub4 mllr_matrices file."""
    path = reference_root / \
        "sphinx3/model/hmm/hub4_cd_continuous_8gau_1s_c_d_dd/mllr_matrices"
    m = MllrTransform.read(str(path))
    assert m.n_class == 1 and m.n_feat == 1
    assert m.A[0].shape == (1, 39, 39)
    assert m.b[0].shape == (1, 39)
    assert abs(float(m.A[0][0, 0, 0]) - 1.658844) < 1e-5


def test_mllr_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    m = MllrTransform(A=[rng.randn(1, 4, 4).astype(np.float32)],
                      b=[rng.randn(1, 4).astype(np.float32)],
                      h=[np.ones((1, 4), np.float32)])
    p = str(tmp_path / "mllr")
    m.write(p)
    m2 = MllrTransform.read(p)
    np.testing.assert_allclose(m2.A[0], m.A[0], atol=1e-5)
    np.testing.assert_allclose(m2.b[0], m.b[0], atol=1e-5)


def test_solve_mllr_recovers_shift():
    """MLLR solve recovers a known affine shift of the means."""
    rng = np.random.RandomState(1)
    G, D = 40, 6
    means = rng.randn(G, D).astype(np.float64)
    var = np.ones((G, D)) * 0.5
    A_true = np.eye(D) + 0.1 * rng.randn(D, D)
    b_true = rng.randn(D) * 0.5
    adapted = means @ A_true.T + b_true
    occ = np.full(G, 10.0)
    xsum = occ[:, None] * adapted
    t = solve_mllr(means, var, occ, xsum)
    np.testing.assert_allclose(t.A[0][0], A_true, atol=1e-3)
    np.testing.assert_allclose(t.b[0][0], b_true, atol=1e-3)


def test_mllr_apply(reference_root):
    from cmusphinx_tpu.models.gauden import read_gauden
    H = reference_root / "pocketsphinx/model/hmm/en/tidigits"
    g = read_gauden(str(H / "means"), str(H / "variances"))
    before = g.means.copy()
    d = g.veclen[0]
    t = MllrTransform(A=[np.eye(d, dtype=np.float32)[None]],
                      b=[np.full((1, d), 2.0, np.float32)],
                      h=[np.ones((1, d), np.float32)])
    t.apply(g)
    np.testing.assert_allclose(g.means[0, 0, :, :d],
                               before[0, 0, :, :d] + 2.0, atol=1e-5)


def test_senfh_roundtrip_and_replay(tmp_path):
    rng = np.random.RandomState(2)
    scores = -np.abs(rng.randn(20, 50)).astype(np.float32) * 5
    p = str(tmp_path / "utt.sen")
    write_senscr(p, scores)
    back, logbase = read_senscr(p)
    rel = scores - scores.max(1, keepdims=True)
    np.testing.assert_allclose(back, rel, atol=0.12)  # quantization step
    rs = ReplayScorer.from_file(p)
    out = np.asarray(rs.score(np.zeros((20, 13), np.float32)))
    np.testing.assert_allclose(out, back, atol=1e-6)


def test_replay_decode_matches_live(reference_root):
    """Decoding from a dumped senone stream == decoding live (the
    reference's golden-senone-stream search isolation, SURVEY.md §4)."""
    from cmusphinx_tpu.api import Decoder
    from cmusphinx_tpu.utils.bio import read_mfc
    R = reference_root / "pocketsphinx"
    d = Decoder(hmm=str(R / "model/hmm/en/tidigits"),
                lm=str(R / "model/lm/en/tidigits.DMP"),
                dict=str(R / "model/lm/en/tidigits.dic"))
    cep = read_mfc(str(R / "test/data/tidigits/man.ah.2934za.mfc"))
    feats = np.asarray(d.fp.compute(cep))
    h1 = d.search.decode(feats)
    scores = np.asarray(d.scorer.score(feats))
    import tempfile, os
    p = tempfile.mktemp(suffix=".sen")
    write_senscr(p, scores)
    try:
        replay = ReplayScorer.from_file(p)
        saved = d.search.scorer
        d.search.scorer = replay
        h2 = d.search.decode(feats)
        d.search.scorer = saved
    finally:
        os.unlink(p)
    assert h2.text == h1.text == "TWO NINE THREE FOUR ZERO"

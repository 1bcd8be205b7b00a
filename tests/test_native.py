"""Native C++ host runtime (csrc/sphinx_runtime.cc) vs the pure-Python
reference implementations: lm3g scoring, lattice bestpath / posterior /
A* N-best on a real decode lattice."""

import numpy as np
import pytest

from cmusphinx_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.fixture(scope="module")
def turtle_lm(reference_root):
    from cmusphinx_tpu.models.ngram import NgramModel
    return NgramModel.read(
        str(reference_root / "pocketsphinx/model/lm/en/turtle.DMP"))


def test_lm3g_native_matches_python(lib, turtle_lm):
    m = turtle_lm
    la = native.LmArrays(m)
    rng = np.random.RandomState(3)
    V = m.n_words
    w1 = rng.randint(-1, V, 500).astype(np.int32)
    w2 = rng.randint(0, V, 500).astype(np.int32)
    w3 = rng.randint(0, V, 500).astype(np.int32)
    got = native.tg_score_batch(la, w1, w2, w3)
    want = np.array([m.tg_score(int(a), int(b), int(c))
                     for a, b, c in zip(w1, w2, w3)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def decoded_lattice(reference_root):
    """Real lattice: tidigits N-gram decode of one utterance."""
    from cmusphinx_tpu.decode import NgramSearch
    from cmusphinx_tpu.frontend.fe import FE_ARGS
    from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
    from cmusphinx_tpu.models import Mdef, TransitionMatrices, read_sendump
    from cmusphinx_tpu.models.dict import Dictionary
    from cmusphinx_tpu.models.gauden import read_gauden
    from cmusphinx_tpu.models.ngram import NgramModel
    from cmusphinx_tpu.ops.gmm import PsParityScorer
    from cmusphinx_tpu.utils.bio import read_mfc
    from cmusphinx_tpu.utils.config import Config

    R = reference_root / "pocketsphinx"
    H = R / "model/hmm/en/tidigits"
    mdef = Mdef.read(str(H / "mdef"))
    g = read_gauden(str(H / "means"), str(H / "variances"))
    w, meta = read_sendump(str(H / "sendump"), return_raw=True)
    tmat = TransitionMatrices.read(str(H / "transition_matrices"))
    d = Dictionary.read(str(R / "model/lm/en/tidigits.dic"), mdef)
    lm = NgramModel.read(str(R / "model/lm/en/tidigits.DMP"))
    cfg = Config(FE_ARGS, FEAT_ARGS)
    cfg.update_from_file(str(H / "feat.params"))
    fp = FeatPipeline(cfg)
    scorer = PsParityScorer(g, w, fp.stream_slices(),
                            wrap_uint8=meta["n_bits"] == 4)
    search = NgramSearch(lm, d, mdef, tmat, scorer)
    feats = np.asarray(fp.compute(read_mfc(
        str(R / "test/data/tidigits/man.ah.2934za.mfc"))))
    hyp = search.decode(feats)
    assert hyp.text == "TWO NINE THREE FOUR ZERO"
    return search.get_lattice()


def _py_only(lat, monkeypatch_module):
    """Run a lattice method with the native path disabled."""
    from cmusphinx_tpu.decode import lattice as latmod
    monkeypatch_module.setattr(latmod, "_native", None)
    return lat


def test_bestpath_native_matches_python(lib, decoded_lattice, monkeypatch):
    from cmusphinx_tpu.decode import lattice as latmod
    lat = decoded_lattice
    h_native = lat.bestpath(lw=9.5, start_lmwid=-1)
    monkeypatch.setattr(latmod, "_native", None)
    h_py = lat.bestpath(lw=9.5, start_lmwid=-1)
    assert h_native.text == h_py.text
    assert h_native.score == pytest.approx(h_py.score, abs=1e-3)


def test_posterior_native_matches_python(lib, decoded_lattice, monkeypatch):
    from cmusphinx_tpu.decode import lattice as latmod
    lat = decoded_lattice
    p_native = np.asarray(lat.posterior(0.05))
    monkeypatch.setattr(latmod, "_native", None)
    p_py = np.asarray(lat.posterior(0.05))
    m = np.isfinite(p_py)
    np.testing.assert_allclose(p_native[m], p_py[m], rtol=1e-4, atol=1e-4)


def test_nbest_native_matches_python(lib, decoded_lattice, monkeypatch):
    from cmusphinx_tpu.decode import lattice as latmod
    lat = decoded_lattice
    nb_native = lat.nbest(5)
    monkeypatch.setattr(latmod, "_native", None)
    nb_py = lat.nbest(5)
    assert [h.text for h in nb_native] == [h.text for h in nb_py]
    for a, b in zip(nb_native, nb_py):
        assert a.score == pytest.approx(b.score, abs=1e-2)

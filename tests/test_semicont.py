"""Semi-continuous training path (VERDICT #7): VQ codebook flat start
(kmeans_init/agg_seg), shared-codebook Baum-Welch, mk_s2sendump export,
and a full train -> sendump -> decode round trip through the Decoder."""

import numpy as np
import pytest

from cmusphinx_tpu.models.sendump import read_sendump
from cmusphinx_tpu.train.semicont import (SemiContTrainer, export_semicont,
                                          kmeans_init)
from cmusphinx_tpu.train.sentence_hmm import FlatModel


def _corpus(seed=0):
    rng = np.random.RandomState(seed)
    model = FlatModel.create(["SIL", "A", "B", "C"], n_state=3)
    pron = {"ab": ["A", "B"], "ba": ["B", "A"], "cc": ["C", "C"]}
    base = {"SIL": 0.0, "A": 3.0, "B": -3.0, "C": 6.0}
    texts = [["ab"], ["ba"], ["cc"], ["ab", "cc"], ["ba", "ab"]] * 2
    feats = []
    for words in texts:
        phones = ["SIL"] + [p for w in words for p in pron[w]] + ["SIL"]
        f = np.concatenate([base[p] + 0.4 * rng.randn(7, 6) for p in phones])
        feats.append(f.astype(np.float32))
    return model, pron, texts, feats


def test_kmeans_codebook():
    rng = np.random.RandomState(3)
    X = np.concatenate([rng.randn(200, 4) + c for c in (-5, 0, 5)])
    means, var = kmeans_init([X], K=3, seed=1)
    assert sorted(np.round(means.mean(1)).tolist()) == [-5, 0, 5]
    assert (var > 0).all()


def test_semicont_train_and_roundtrip(tmp_path):
    model, pron, texts, feats = _corpus()
    tr = SemiContTrainer(model, pron, texts, feats, K=8, seed=0)
    lls = [tr.em_step() for _ in range(6)]
    assert lls[-1] > lls[0]
    # Shared codebook: every senone has the SAME Gaussians.
    assert np.array_equal(tr.params.means[0], tr.params.means[-1])
    # Mixture weights differ across senones (the free parameters).
    assert not np.allclose(tr.params.lnw[1], tr.params.lnw[4])

    mdl = tmp_path / "semi_model"
    export_semicont(str(mdl), model, tr, feat="1s_c")
    # sendump round trip: quantized weights match the trained ones.
    lnw, meta = read_sendump(str(mdl / "sendump"), return_raw=False), None
    got = np.asarray(lnw)[0].T            # [S, K]
    scale = np.abs(got - tr.params.lnw).max()
    assert scale < 0.06                   # 8-bit logbase quantization step

    # Decode a training utterance with the exported model via the Decoder.
    from cmusphinx_tpu.api import Decoder
    from cmusphinx_tpu.lm.estimate import count_ngrams, estimate_lm
    counts, words = count_ngrams(texts, ["ab", "ba", "cc"], n=3)
    lm = estimate_lm(counts, words, discount="witten_bell")
    lm.write_arpa(str(tmp_path / "lm.arpa"))
    with open(tmp_path / "w.dic", "w") as fh:
        fh.write("ab A B\nba B A\ncc C C\n")
    with open(tmp_path / "f.dic", "w") as fh:
        fh.write("<sil> SIL\n")
    d = Decoder(hmm=str(mdl), dict=str(tmp_path / "w.dic"),
                fdict=str(tmp_path / "f.dic"),
                lm=str(tmp_path / "lm.arpa"), ceplen=6)
    # Feature dim must match training (6): use raw features directly.
    hyp = d.search.decode(feats[3])
    assert hyp.words == ["ab", "cc"], hyp.words

"""LM estimation toolkit tests (cmuclmtk capability)."""

import math

import numpy as np
import pytest

from cmusphinx_tpu.lm.estimate import (count_ngrams, estimate_lm, interpolate,
                                       text2wfreq, train_lm, wfreq2vocab)
from cmusphinx_tpu.models.ngram import NgramModel

CORPUS = [s.split() for s in [
    "go forward ten meters", "go backward ten meters", "turn left",
    "turn right", "go forward two meters", "move forward three meters",
    "go left", "stop", "go forward five meters", "turn around",
]]


@pytest.mark.parametrize("disc", ["good_turing", "witten_bell",
                                  "absolute", "linear"])
def test_lm_normalized(disc):
    """P(.|h) sums to 1 for unigram, bigram and trigram histories."""
    m = train_lm(CORPUS, n=3, discount=disc)
    for h1, h2 in [(-1, -1), (-1, m.word_id("go")),
                   (m.word_id("go"), m.word_id("forward"))]:
        s = sum(math.exp(m.score(w, h2, h1)) for w in range(m.n_words)
                if m.words[w] != "<s>")
        assert s == pytest.approx(1.0, abs=2e-3), (disc, h1, h2, s)


def test_seen_trigram_better_than_unseen():
    m = train_lm(CORPUS, n=3)
    go, fwd = m.word_id("go"), m.word_id("forward")
    ten, left = m.word_id("ten"), m.word_id("left")
    assert m.tg_score(go, fwd, ten) > m.tg_score(go, fwd, left)


def test_vocab_pipeline():
    wf = text2wfreq(CORPUS)
    assert wf["go"] == 5
    v = wfreq2vocab(wf, top=3)
    assert v[0] == "go" and len(v) == 3
    counts, words = count_ngrams(CORPUS, v, n=2)
    assert ("<s>" in words) and ("</s>" in words)
    # OOV words break context in closed-vocab mode.
    assert all(len(g) == 2 for g in counts[1])


def test_cutoffs_reduce_counts():
    m0 = train_lm(CORPUS, n=3)
    m1 = train_lm(CORPUS, n=3, cutoffs=[0, 1, 1])
    assert m1.counts()[1] < m0.counts()[1]
    assert m1.counts()[2] < m0.counts()[2]


def test_interpolation_and_perplexity():
    m1 = train_lm(CORPUS[:5], n=3)
    m2 = train_lm(CORPUS[5:], n=3)
    mi = interpolate([m1, m2], [0.5, 0.5])
    ppl_i, n, oov = mi.perplexity(CORPUS)
    ppl_1, _, _ = m1.perplexity(CORPUS)
    assert oov == 0 and n > 0
    assert ppl_i < ppl_1  # union model fits the full corpus better


def test_arpa_dmp_roundtrip(tmp_path):
    m = train_lm(CORPUS, n=3)
    pa, pd = str(tmp_path / "x.arpa"), str(tmp_path / "x.DMP")
    m.write_arpa(pa)
    m.write_dmp(pd)
    ma, md = NgramModel.read(pa), NgramModel.read(pd)
    assert ma.counts() == m.counts() == md.counts()
    go, fwd, ten = (m.word_id(w) for w in ("go", "forward", "ten"))
    for mm in (ma, md):
        g2, f2, t2 = (mm.word_id(w) for w in ("go", "forward", "ten"))
        assert mm.tg_score(g2, f2, t2) == pytest.approx(
            m.tg_score(go, fwd, ten), abs=2e-3)


def test_decode_with_trained_lm(reference_root):
    """An LM trained here drives the decoder (toolkit -> decoder loop)."""
    import jax
    from cmusphinx_tpu.api import Decoder
    R = reference_root / "pocketsphinx"
    lsn_corpus = []
    for line in open(R / "test/data/tidigits/tidigits.lsn"):
        p = line.split()
        lsn_corpus.append([w.upper() for w in p[:-1]])
    m = train_lm(lsn_corpus, n=3)
    import tempfile, os
    tmp = tempfile.mktemp(suffix=".arpa")
    m.write_arpa(tmp)
    try:
        d = Decoder(hmm=str(R / "model/hmm/en/tidigits"), lm=tmp,
                    dict=str(R / "model/lm/en/tidigits.dic"))
        h = d.decode_cep_file(str(R / "test/data/tidigits/man.ah.111a.mfc"))
        assert h.text == "ONE ONE ONE"
    finally:
        os.unlink(tmp)

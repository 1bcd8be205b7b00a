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


# ----------------------------------------------------------------------
# Disk-scale idngram pipeline (ac_hash / mergeidngram / lm_sort capability)

def _toy_corpus(n_sent=400, seed=0):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)]
    sents = []
    for _ in range(n_sent):
        L = rng.randint(3, 9)
        # Zipf-ish draws so count-of-counts are non-degenerate.
        ids = np.minimum((rng.zipf(1.5, L) - 1), len(vocab) - 1)
        sents.append([vocab[i] for i in ids])
    return sents, vocab


def test_disk_counts_match_in_memory(tmp_path):
    from cmusphinx_tpu.lm.estimate import count_ngrams
    from cmusphinx_tpu.lm.idngram import (count_ngrams_disk,
                                          load_idngram_counts)
    sents, vocab = _toy_corpus()
    mem_counts, mem_words = count_ngrams(sents, vocab, n=3)
    # Tiny RAM bound -> dozens of spill files -> k-way merge exercised.
    paths, words = count_ngrams_disk(sents, vocab, n=3, max_ram_ngrams=200,
                                     tmpdir=str(tmp_path))
    assert words == mem_words
    disk_counts = load_idngram_counts(paths)
    for k in range(3):
        assert disk_counts[k] == dict(mem_counts[k]), f"order {k+1} differs"


def test_disk_lm_matches_in_memory_lm(tmp_path):
    from cmusphinx_tpu.lm.estimate import count_ngrams, estimate_lm
    from cmusphinx_tpu.lm.idngram import train_lm_disk
    sents, vocab = _toy_corpus()
    counts, words = count_ngrams(sents, vocab, n=3)
    m_mem = estimate_lm(counts, words, discount="witten_bell")
    m_disk = train_lm_disk(iter(sents), vocab, n=3, discount="witten_bell",
                           max_ram_ngrams=100, tmpdir=str(tmp_path))
    assert m_disk.words == m_mem.words
    np.testing.assert_allclose(m_disk.ug_prob, m_mem.ug_prob, rtol=1e-6)
    np.testing.assert_allclose(m_disk.ug_bo, m_mem.ug_bo, rtol=1e-6)
    assert np.array_equal(m_disk.bg_wid, m_mem.bg_wid)
    np.testing.assert_allclose(m_disk.bg_prob, m_mem.bg_prob, rtol=1e-5)
    assert np.array_equal(m_disk.tg_wid, m_mem.tg_wid)
    np.testing.assert_allclose(m_disk.tg_prob, m_mem.tg_prob, rtol=1e-5)


def test_heldout_perplexity_regression(tmp_path):
    """Held-out perplexity sanity: train < heldout < uniform, and the
    disk-backed path reproduces the in-memory perplexity exactly."""
    from cmusphinx_tpu.lm.estimate import train_lm
    from cmusphinx_tpu.lm.idngram import train_lm_disk
    sents, vocab = _toy_corpus(600, seed=1)
    train, held = sents[:500], sents[500:]
    m = train_lm(train, n=3, discount="good_turing")
    ppl_train = m.perplexity(train[:100])[0]
    ppl_held = m.perplexity(held)[0]
    V = m.n_words
    assert ppl_train < ppl_held < V, (ppl_train, ppl_held, V)
    m2 = train_lm_disk(iter(train), [w for w in m.words
                                     if w not in ("<s>", "</s>", "<UNK>")],
                       n=3, discount="good_turing", max_ram_ngrams=300,
                       tmpdir=str(tmp_path))
    assert abs(m2.perplexity(held)[0] - ppl_held) < 1e-6 * max(ppl_held, 1)


def test_fringe_format_tools(tmp_path, capsys):
    """cmuclmtk fringe tools: ngram2mgram / text2wngram / idngram2stats /
    binlm2arpa (VERDICT r4 #8, SURVEY row 79)."""
    import numpy as np
    from cmusphinx_tpu.lm.idngram import (idngram_stats, ngram_to_mgram,
                                          read_idngram, text_to_wngram,
                                          write_idngram)

    # ngram2mgram: truncate sorted trigram counts to bigrams, summing.
    tri = {(0, 1, 2): 3, (0, 1, 4): 2, (1, 2, 2): 1, (2, 0, 1): 5}
    p3 = tmp_path / "c.3.idngram"
    p2 = tmp_path / "c.2.idngram"
    write_idngram(str(p3), tri, 3)
    nd = ngram_to_mgram(str(p3), str(p2), n=3, m=2)
    got = dict(read_idngram(str(p2), 2))
    assert nd == 3
    assert got == {(0, 1): 5, (1, 2): 1, (2, 0): 5}

    # text2wngram: flat word-stream n-grams, sorted with counts.
    sents = [["a", "b", "a"], ["b", "a", "b"]]
    grams = text_to_wngram(sents, n=2)
    assert grams == [(("a", "b"), 3), (("b", "a"), 2)]

    # idngram2stats: frequency-of-frequencies.
    ndist, total, fof = idngram_stats(str(p3), 3)
    assert (ndist, total) == (4, 11)
    assert fof[0] == 1 and fof[1] == 1 and fof[2] == 1 and fof[4] == 1

    # CLI surface: each subcommand runs and reports.
    from cmusphinx_tpu.cli.lmtool import main
    text = tmp_path / "corpus.txt"
    text.write_text("a b a\nb a b\n")
    wng = tmp_path / "o.wngram"
    assert main(["text2wngram", "-text", str(text), "-o", str(wng),
                 "-n", "2"]) == 0
    assert wng.read_text() == "a b 3\nb a 2\n"
    assert main(["ngram2mgram", "-i", str(p3), "-o", str(tmp_path / "x"),
                 "-n", "3", "-m", "2"]) == 0
    assert main(["idngram2stats", "-i", str(p3), "-n", "3"]) == 0
    out = capsys.readouterr().out
    assert "4 distinct 3-grams (11 total)" in out

    # binlm2arpa / arpa2binlm round trip through the DMP format.
    arpa = tmp_path / "toy.arpa"
    lm = train_lm([["a", "b", "a"], ["b", "a", "b"]], n=2)
    lm.write_arpa(str(arpa))
    dmp = tmp_path / "toy.DMP"
    assert main(["arpa2binlm", "-arpa", str(arpa), "-binary", str(dmp)]) == 0
    arpa2 = tmp_path / "back.arpa"
    assert main(["binlm2arpa", "-binary", str(dmp), "-arpa",
                 str(arpa2)]) == 0
    from cmusphinx_tpu.models.ngram import NgramModel
    m2 = NgramModel.read(str(arpa2))
    assert m2.counts() == lm.counts()

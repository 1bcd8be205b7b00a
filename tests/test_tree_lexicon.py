"""Prefix-shared lexicon tree (lexmode='tree') and the sparse-LM probe.

Reference capability: pocketsphinx ngram_search_fwdtree.c:67-149 (shared
tree, last phone excluded, delayed LM scoring), sphinx3 lextree + vithist
rescoring, srch_time_switch_tree.c histogram pruning.
"""

import numpy as np
import pytest

from cmusphinx_tpu.models.ngram_device import DeviceNgram


@pytest.fixture(scope="module")
def tidigits_parts(reference_root):
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
    ctl = [l.strip() for l in
           open(R / "test/data/tidigits/tidigits.ctl") if l.strip()][:10]
    lsn = {}
    for line in open(R / "test/data/tidigits/tidigits.lsn"):
        p = line.split()
        lsn[p[-1].strip("()")] = " ".join(p[:-1])
    feats = [np.asarray(fp.compute(read_mfc(
        str(R / f"test/data/tidigits/{u}.mfc")))) for u in ctl]
    return dict(lm=lm, d=d, mdef=mdef, tmat=tmat, scorer=scorer,
                ctl=ctl, lsn=lsn, feats=feats)


def _mk_search(p, **kw):
    from cmusphinx_tpu.decode import NgramSearch
    return NgramSearch(p["lm"], p["d"], p["mdef"], p["tmat"], p["scorer"],
                       **kw)


def test_tree_requires_composite(tidigits_parts):
    with pytest.raises(ValueError):
        _mk_search(tidigits_parts, rcmode="fanout", lexmode="tree")


def test_tree_graph_structure(tidigits_parts):
    s = _mk_search(tidigits_parts, rcmode="composite", lcmode="composite",
                   lexmode="tree")
    g = s.graph
    assert g.lex_mode == "tree"
    # One contiguous word-ordered exit block.
    assert g.exit_base >= 0
    W = s.vocab.n_word
    assert np.array_equal(g.exit_tab[:, 0],
                          np.arange(g.exit_base, g.exit_base + W))
    # Trie in-degree <= 1 holds and parents precede children.
    pc = g.prev_chan
    assert np.all(pc < np.arange(g.n_chan))
    # Lookahead smear: every channel's la >= its exit word's la (the max
    # over words below can only grow toward the root).
    assert g.la is not None and g.la_word is not None
    assert np.all(g.la[g.exit_tab[:, 0]] == g.la_word)


def test_tree_decodes_like_flat(tidigits_parts):
    p = tidigits_parts
    flat = _mk_search(p, rcmode="composite", lcmode="composite",
                      lexmode="flat")
    tree = _mk_search(p, rcmode="composite", lcmode="composite",
                      lexmode="tree")
    hf = flat.decode_batch(p["feats"])
    ht = tree.decode_batch(p["feats"])
    n_f = sum(h.text == p["lsn"][u] for h, u in zip(hf, p["ctl"]))
    n_t = sum(h.text == p["lsn"][u] for h, u in zip(ht, p["ctl"]))
    # The tree's delayed-LM approximation may differ on ties, but accuracy
    # must match on this easy task.
    assert n_t >= n_f - 1 and n_t >= len(p["ctl"]) - 1


def test_tree_single_utterance_path(tidigits_parts):
    p = tidigits_parts
    tree = _mk_search(p, rcmode="composite", lcmode="composite",
                      lexmode="tree")
    hyp = tree.decode(p["feats"][0])
    assert hyp.text == p["lsn"][p["ctl"][0]]
    # Results layer on top of the tree tape.
    lat = tree.get_lattice()
    bp = lat.bestpath(lw=tree.lw, start_lmwid=tree.start_lmwid)
    assert bp.score >= hyp.score - 0.1


def test_probe_matches_csr(tidigits_parts):
    lm = tidigits_parts["lm"]
    dlm = DeviceNgram(lm, dense3_limit=0)   # force CSR/probe paths
    assert dlm.probe
    rng = np.random.RandomState(7)
    V = lm.n_words
    w1 = rng.randint(-1, V, 500).astype(np.int32)
    w2 = rng.randint(-1, V, 500).astype(np.int32)
    w3 = rng.randint(0, V, 500).astype(np.int32)
    got = np.asarray(dlm.score_tg_probe(w1, w2, w3))
    want = np.asarray([lm.tg_score(int(a), int(b), int(c))
                       for a, b, c in zip(w1, w2, w3)])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def _synthetic_big_lm(V=30000, NB=60000, NT=90000, seed=0):
    """A consistent random trigram LM too big for probe/dense paths —
    the hashed-backend (LargeTrigramModel-class) regime."""
    from cmusphinx_tpu.models.ngram import NgramModel
    rng = np.random.RandomState(seed)
    m = NgramModel()
    m.n = 3
    m.words = [f"w{i}" for i in range(V)]
    m.wid = {w: i for i, w in enumerate(m.words)}
    m.ug_prob = (-1.0 - 8.0 * rng.rand(V)).astype(np.float32)
    m.ug_bo = (-0.5 * rng.rand(V)).astype(np.float32)
    keys = np.unique(rng.randint(0, V, (NB + NB // 4, 2)).astype(np.int64),
                     axis=0)[:NB]
    keys = keys[np.lexsort((keys[:, 1], keys[:, 0]))]
    m.bg_wid = keys[:, 1].astype(np.int32)
    m.bg_ptr = np.searchsorted(keys[:, 0], np.arange(V + 1)).astype(np.int64)
    nb = len(m.bg_wid)
    m.bg_prob = (-0.5 - 6.0 * rng.rand(nb)).astype(np.float32)
    m.bg_bo = (-0.4 * rng.rand(nb)).astype(np.float32)
    trows = rng.randint(0, nb, NT).astype(np.int64)
    tw = rng.randint(0, V, NT).astype(np.int64)
    tk = np.unique(np.stack([trows, tw], 1), axis=0)
    tk = tk[np.lexsort((tk[:, 1], tk[:, 0]))]
    m.tg_wid = tk[:, 1].astype(np.int32)
    m.tg_ptr = np.searchsorted(tk[:, 0], np.arange(nb + 1)).astype(np.int64)
    m.tg_prob = (-0.5 - 6.0 * rng.rand(len(m.tg_wid))).astype(np.float32)
    return m


def test_hashed_lm_matches_host():
    """The hashed point-lookup backend (sphinx4 LargeTrigramModel home)
    must reproduce the host backoff chain exactly, including planted hits
    at every backoff level."""
    m = _synthetic_big_lm()
    dlm = DeviceNgram(m, dense3_limit=0)
    assert dlm.hashed and not dlm.probe
    rng = np.random.RandomState(3)
    L = 400
    w1 = rng.randint(-1, m.n_words, L).astype(np.int32)
    w2 = rng.randint(-1, m.n_words, L).astype(np.int32)
    w3 = rng.randint(0, m.n_words, L).astype(np.int32)
    # Plant guaranteed bigram and trigram hits among the random misses.
    bg_w1 = np.repeat(np.arange(m.n_words), np.diff(m.bg_ptr))
    for i in range(0, 60, 2):
        b = rng.randint(len(m.bg_wid))
        w2[i], w3[i] = bg_w1[b], m.bg_wid[b]
        if i >= 30:  # trigram hits: (h1, h2) = the parent bigram
            t = rng.randint(len(m.tg_wid))
            row = np.searchsorted(m.tg_ptr, t, "right") - 1
            w1[i], w2[i], w3[i] = bg_w1[row], m.bg_wid[row], m.tg_wid[t]
    got = np.asarray(dlm.score_tg_hashed(w1, w2, w3))
    want = np.asarray([m.tg_score(int(a), int(b), int(c))
                       for a, b, c in zip(w1, w2, w3)])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
    # score_tg routes small point queries through the hashed backend
    got2 = np.asarray(dlm.score_tg(w1, w2, w3))
    np.testing.assert_allclose(got2, want, rtol=1e-6, atol=1e-5)


def test_nlextree_copies(tidigits_parts):
    """N parallel tree copies (sphinx3 -Nlextree): same task accuracy,
    valid multi-copy carry."""
    p = tidigits_parts
    for n in (2, 3):
        s = _mk_search(p, rcmode="composite", lcmode="composite",
                       lexmode="tree", nlextree=n)
        assert s.nlextree == n
        hyps = s.decode_batch(p["feats"][:5])
        ok = sum(h.text == p["lsn"][u]
                 for h, u in zip(hyps, p["ctl"][:5]))
        assert ok >= 4


def test_tree_streaming_matches_batch(tidigits_parts):
    """Chunked streaming decode through the tree core must equal the
    batch decode (device-resident carry between chunks)."""
    p = tidigits_parts
    s = _mk_search(p, rcmode="composite", lcmode="composite",
                   lexmode="tree")
    for i in range(3):
        feats = p["feats"][i]
        want = s.decode(feats).text
        st = s.stream_start(max_frames=400)
        for j in range(0, feats.shape[0], 37):
            s.stream_push(st, feats[j : j + 37])
        got = s.stream_end(st).text
        assert got == want, (i, got, want)


def test_bigram_lookahead_exact_cancellation(tidigits_parts):
    """The per-history bigram lookahead smear (treela='bg') is an in-tree
    ranking aid that cancels EXACTLY at the exit readout: with pruning off
    and the shortlist covering the whole vocabulary, hypotheses and path
    scores match the unigram-smear decode bit-for-bit."""
    p = tidigits_parts
    kw = dict(lexmode="tree", rcmode="composite", lcmode="composite",
              prune=False)
    s_bg = _mk_search(p, treela="bg", **kw)
    s_ug = _mk_search(p, treela="ug", **kw)
    assert s_bg.use_bgla and not s_ug.use_bgla
    for f in p["feats"][:4]:
        h_bg = s_bg.decode(f)
        h_ug = s_ug.decode(f)
        assert h_bg.text == h_ug.text
        assert h_bg.score == pytest.approx(h_ug.score, abs=1e-3)


def test_bigram_lookahead_batched_matches_single(tidigits_parts):
    """Batched tree decode with the bigram smear == single-utterance."""
    p = tidigits_parts
    kw = dict(lexmode="tree", rcmode="composite", lcmode="composite",
              treela="bg")
    s = _mk_search(p, **kw)
    assert s.use_bgla
    singles = [s.decode(f).text for f in p["feats"][:6]]
    s2 = _mk_search(p, **kw)
    batched = [h.text for h in s2.decode_batch(p["feats"][:6])]
    assert batched == singles


def test_tree_streaming_tape_growth(tidigits_parts):
    """Streaming past the initial tape size doubles the tape AND the
    tree carry's side-tables (histories + bigram-corr rows); hypotheses
    stay equal to batch across the growth boundary (acmod_set_grow
    semantics)."""
    p = tidigits_parts
    s = _mk_search(p, rcmode="composite", lcmode="composite",
                   lexmode="tree", treela="bg")
    assert s.use_bgla
    feats = p["feats"][0]
    assert feats.shape[0] > 64
    want = s.decode(feats).text
    st = s.stream_start(max_frames=64)   # forces >= 1 doubling
    for j in range(0, feats.shape[0], 29):
        s.stream_push(st, feats[j : j + 29])
    assert st["max_frames"] > 64
    got = s.stream_end(st).text
    assert got == want

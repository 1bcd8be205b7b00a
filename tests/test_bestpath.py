"""Bestpath lattice-rescoring contract tests.

Covers the defects found in the round-3 review: (a) an oracle check that the
trigram Viterbi over a hand-built lattice finds the exhaustively-enumerated
best path (including a case where LM rescoring must FLIP the acoustically
best path), (b) native == Python == pruned agreement, (c) the decode-level
invariant that rescoring at the pass-1 language weight can only improve the
path score (the pass-1 path is in the lattice), and (d) batch rescoring
speed via the vectorized construction + pruned native DP.

Reference contract: pocketsphinx ps_lattice.c:1224 ps_lattice_bestpath
(forward link DP, lwf-scaled LM), ngram_search.c:1100 lattice construction.
"""

import itertools
import time

import numpy as np
import pytest

from cmusphinx_tpu.decode.lattice import LatNode, Lattice
from cmusphinx_tpu.lm.estimate import count_ngrams, estimate_lm


def toy_lm():
    sents = [["a", "b", "c"], ["a", "c", "b"], ["b", "a", "c"],
             ["a", "b", "b", "c"], ["c", "a", "b"]]
    vocab = ["a", "b", "c"]
    counts, words = count_ngrams(sents, vocab, n=3)
    return estimate_lm(counts, words, discount="witten_bell")


def hand_lattice(lm, boost_word="c"):
    """3-frame-boundary lattice: two start words, two middle, one end.
    Acoustics favor one middle word; the LM can favor the other."""
    n_ci = 2
    wids = {w: lm.word_id(w) for w in ("a", "b", "c")}

    def node(i, word, sf, ef, ac, entry=0.0):
        rc = np.full(n_ci, float(ac), np.float32)
        return LatNode(id=i, word=word, kidx=i, lmwid=wids[word],
                       is_filler=False, fil_pen=0.0, sf=sf, ef=ef,
                       vit_score=float(ac), rc_score=rc,
                       entry_score=float(entry))

    # frames 0-9 | 10-19 | 20-29
    nodes = [
        node(0, "a", 0, 9, -10.0),
        node(1, "b", 0, 9, -11.0),
        node(2, "a", 10, 19, -30.0, entry=-12.0),   # segment ascr -18
        node(3, "b", 10, 19, -31.0, entry=-12.0),   # segment ascr -19
        node(4, boost_word, 20, 29, -60.0, entry=-35.0),  # ascr -25
    ]
    return Lattice(nodes, np.zeros(5, np.int32), np.zeros(5, np.int32),
                   lm, lw=1.0, log_wip=0.0, sil_ci=0,
                   finish_lmwid=lm.word_id("</s>"), T=30)


def brute_force(lat, lw, start_lmwid):
    """Exhaustively enumerate every start->end path and score it with the
    lattice's own term functions (checks the DP, not the terms)."""
    best = (float("-inf"), None)
    for s in lat._starts:
        stack = [([s], lat._lm_term(-1, start_lmwid, lat.nodes[s], lw),
                  lat._next_hist(-1, start_lmwid, lat.nodes[s]))]
        while stack:
            path, sc, hist = stack.pop()
            n = lat.nodes[path[-1]]
            if not n.succs:
                tot = sc + lat.final_ascr(n)
                if not lat._is_finish(n):
                    tot += lw * lat.lm.tg_score(hist[0], hist[1],
                                                lat.finish_lmwid)
                if tot > best[0]:
                    best = (tot, path)
                continue
            for j in n.succs:
                m = lat.nodes[j]
                sc2 = (sc + lat.edge_ascr(n, m)
                       + lat._lm_term(hist[0], hist[1], m, lw))
                stack.append((path + [j], sc2,
                              lat._next_hist(hist[0], hist[1], m)))
    return best


def test_bestpath_matches_brute_force():
    lm = toy_lm()
    lat = hand_lattice(lm)
    start = lm.word_id("<s>")
    for lw in (1.0, 3.0, 8.0):
        want_score, want_path = brute_force(lat, lw, start)
        hyp = lat.bestpath(lw=lw, start_lmwid=start)
        assert hyp.score == pytest.approx(want_score, abs=1e-3)
        assert [s.word for s in hyp.segments] == [
            lat.nodes[i].word for i in want_path]


def test_lm_rescoring_flips_path():
    """At high lw the LM must override the (tied-entry) acoustic choice:
    P(c | a b) >> P(c | a a)-class alternatives in the toy corpus."""
    lm = toy_lm()
    lat = hand_lattice(lm)
    start = lm.word_id("<s>")
    ac = lat.bestpath(lw=0.001, start_lmwid=start)
    hi = lat.bestpath(lw=20.0, start_lmwid=start)
    # acoustics alone prefer a-a-c (segment ascr -18 beats -19)
    assert [s.word for s in ac.segments][1] == "a"
    # the corpus has "a b c" twice and no "a a" bigram: LM flips to a-b-c
    assert [s.word for s in hi.segments][1] == "b"
    want_score, _ = brute_force(lat, 20.0, start)
    assert hi.score == pytest.approx(want_score, abs=1e-3)


def test_pruned_equals_exact():
    lm = toy_lm()
    lat = hand_lattice(lm)
    start = lm.word_id("<s>")
    exact = lat.bestpath(lw=5.0, start_lmwid=start)
    pruned = lat.bestpath(lw=5.0, start_lmwid=start, prune_beam=200.0)
    assert pruned.text == exact.text
    assert pruned.score == pytest.approx(exact.score, abs=1e-3)


@pytest.fixture(scope="module")
def tidigits_ngram(reference_root):
    from cmusphinx_tpu.decode import NgramSearch
    from cmusphinx_tpu.frontend.fe import FE_ARGS
    from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
    from cmusphinx_tpu.models import (Mdef, TransitionMatrices, read_sendump)
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
    ctl = [l.strip() for l in
           open(R / "test/data/tidigits/tidigits.ctl") if l.strip()]
    feats = [np.asarray(fp.compute(read_mfc(
        str(R / f"test/data/tidigits/{u}.mfc")))) for u in ctl]
    return search, feats, ctl


def test_rescore_at_pass1_lw_never_degrades(tidigits_ngram, reference_root):
    """The pass-1 Viterbi path is IN the lattice, so exact rescoring at the
    pass-1 language weight must find a path scoring >= it — and with the
    finish-word contract fixed the scores are directly comparable (the
    round-3 implementation under-scored utterance-final </s> instances by
    one P(</s>|h) term).  Also pins that the whole-corpus rescoring pass is
    fast (vectorized construction + pruned native DP in parallel threads;
    the round-3 serial host loop took minutes at this scale)."""
    search, feats, ctl = tidigits_ngram
    lsn = {}
    R = reference_root / "pocketsphinx"
    for line in open(R / "test/data/tidigits/tidigits.lsn"):
        p = line.split()
        lsn[p[-1].strip("()")] = " ".join(p[:-1])
    vit = search.decode_batch(feats)
    t0 = time.time()
    search.config.update(bestpathlw=search.lw)
    bp = search._rescore_batch(vit)
    dt = time.time() - t0
    n_vit = sum(h.text == lsn[u] for h, u in zip(vit, ctl))
    n_bp = sum(h.text == lsn[u] for h, u in zip(bp, ctl))
    assert n_bp >= n_vit, (n_bp, n_vit)
    for hv, hb in zip(vit, bp):
        assert hb.score >= hv.score - 0.1, (hb.score, hv.score)
        if hb.text == hv.text and [s.word for s in hb.segments] == [
                s.word for s in hv.segments]:
            assert hb.score == pytest.approx(hv.score, abs=0.5)
    # 31 utterances; generous bound — the round-3 path was >100x this.
    assert dt < 20.0, f"batch rescoring took {dt:.1f}s"

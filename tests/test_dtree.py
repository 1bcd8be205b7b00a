"""Decision-tree senone tying (bldtree/make_quests/prunetree/tiestate
capability, VERDICT #4): question generation, likelihood-gain splits,
global pruning, and senone assignment for triphones UNSEEN in training."""

import numpy as np
import pytest

from cmusphinx_tpu.train.dtree import (Question, SenoneTree, make_questions,
                                       tie_states_dtree)
from cmusphinx_tpu.train.pipeline import TriphoneInventory, train_full_pipeline
from cmusphinx_tpu.train.sentence_hmm import FlatModel


def test_make_questions_recovers_phone_classes():
    # Two acoustic classes of "phones": 0-2 near +3, 3-5 near -3.
    rng = np.random.RandomState(0)
    D = 4
    mu = np.stack([np.full(D, 3.0) + 0.1 * rng.randn(D) for _ in range(3)]
                  + [np.full(D, -3.0) + 0.1 * rng.randn(D) for _ in range(3)])
    var = np.ones((6, D))
    occ = np.full(6, 10.0)
    qs = make_questions(mu, var, occ)
    assert frozenset({0, 1, 2}) in qs or frozenset({3, 4, 5}) in qs
    # Singletons always present; the trivial all-phone set never is.
    assert frozenset({0}) in qs and frozenset(range(6)) not in qs


def test_tree_splits_on_context_and_classifies_unseen():
    # Triphone states whose mean depends on the LEFT context class:
    # lc in {0,1,2} -> +2, lc in {3,4} -> -2.  rc/wp are noise.
    rng = np.random.RandomState(1)
    D = 3
    rows = []
    stats = []
    for lc in range(5):
        for rc in range(5):
            shift = 2.0 if lc <= 2 else -2.0
            rows.append((lc, rc, 1))
            stats.append((20.0, np.full(D, shift) + 0.05 * rng.randn(D)))
    ctx = np.asarray(rows, np.int64)
    occ = np.asarray([s[0] for s in stats])
    mu = np.stack([s[1] for s in stats])
    second = mu ** 2 + 1.0  # unit variance
    qs = [Question("lc", frozenset({0, 1, 2})),
          Question("lc", frozenset({4})),
          Question("rc", frozenset({0, 1})),
          Question("wpos", frozenset({1}))]
    # min_gain suppresses noise splits (bldtree's minimum-improvement knob).
    tree = SenoneTree(ctx, occ, mu, second, qs, min_occ=1.0, min_gain=5.0)
    assert not tree.root.is_leaf
    assert tree.root.question.ctx == "lc"
    assert tree.root.question.phones == frozenset({0, 1, 2})
    tree.label_leaves(100)
    # Unseen contexts classify by phone class, matching seen ones.
    seen_pos = tree.classify(0, 0, 1).leaf
    seen_neg = tree.classify(3, 0, 1).leaf
    assert seen_pos != seen_neg
    # lc=1/rc=4 combination unseen in *which* leaf it lands is determined
    # by the question: same class -> same leaf.
    assert tree.classify(1, 4, 1).leaf == seen_pos
    # Pruning to one leaf collapses everything.
    while tree.prune_one():
        pass
    assert tree.n_leaves() == 1


@pytest.mark.slow
def test_pipeline_dtree_tying_assigns_unseen_triphones():
    rng = np.random.RandomState(2)
    model = FlatModel.create(["SIL", "A", "B", "C"], n_state=3)
    pron = {"ab": ["A", "B"], "ba": ["B", "A"], "ca": ["C", "A"],
            "bc": ["B", "C"]}
    # Phone-dependent class means so EM has something to learn.
    base = {"SIL": 0.0, "A": 2.5, "B": -2.5, "C": 5.0}
    texts = [["ab"], ["ba"], ["ca"], ["ab", "ba"], ["bc"]] * 2
    feats = []
    for words in texts:
        phones = ["SIL"] + [p for w in words for p in pron[w]] + ["SIL"]
        f = np.concatenate([base[p] + 0.3 * rng.randn(6, 4) for p in phones])
        feats.append(f.astype(np.float32))
    inv, smap, tied, hist = train_full_pipeline(
        model, pron, texts, feats, gauss=1, ci_iters=4, cd_iters=3,
        tied_iters=3, tying="dtree", n_tied_senones=model.n_sen + 12)
    forest = inv.forest
    assert tied.means.shape[0] <= model.n_sen + 12
    # Every SEEN triphone state got a tied senone in range.
    for t, (b, lc, rc, wp) in enumerate(inv.tris):
        for s in range(inv.n_state):
            assert model.n_sen <= smap[inv.senone(t, s)] < tied.means.shape[0]
    # An UNSEEN triphone (context combo not in training) gets a senone.
    pid = model.phone_id
    unseen = (pid["A"], pid["C"], pid["C"], 1)
    assert unseen not in inv.tri_id
    for s in range(inv.n_state):
        sen = forest.senone(unseen[0], s, unseen[1], unseen[2], unseen[3])
        assert model.n_sen <= sen < tied.means.shape[0]
    # Training improved likelihood at each stage.
    assert hist["tied"][-1] >= hist["tied"][0] - 1e-6

"""Time-parallel forced alignment (SURVEY.md §2.10 P6).

The max-plus Viterbi recurrence is associative: chunk transfer matrices
computed in parallel + a cheap combine must reproduce the sequential
aligner's path score exactly, on one device and sharded over a mesh.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def aligner(reference_root):
    from cmusphinx_tpu.decode.align import AlignSearch
    from cmusphinx_tpu.frontend.fe import FE_ARGS
    from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
    from cmusphinx_tpu.models import Mdef, TransitionMatrices, read_sendump
    from cmusphinx_tpu.models.dict import Dictionary
    from cmusphinx_tpu.models.gauden import read_gauden
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
    cfg = Config(FE_ARGS, FEAT_ARGS)
    cfg.update_from_file(str(H / "feat.params"))
    fp = FeatPipeline(cfg)
    scorer = PsParityScorer(g, w, fp.stream_slices(),
                            wrap_uint8=meta["n_bits"] == 4)
    al = AlignSearch(d, mdef, tmat, scorer)
    feats = np.asarray(fp.compute(read_mfc(
        str(R / "test/data/tidigits/man.ah.35oa.mfc"))))
    return al, feats


def test_time_parallel_matches_sequential(aligner):
    from cmusphinx_tpu.decode.align_tp import align_time_parallel
    al, feats = aligner
    words = ["three", "five", "oh"]
    wsegs, phsegs, states_seq, score_seq = al.align(feats, words)
    for D in (1, 3, 4, 7):
        states, score = align_time_parallel(al, feats, words, n_chunks=D)
        assert score == pytest.approx(score_seq, abs=1e-2), D
        assert len(states) == feats.shape[0]
        # tie-breaking may differ; re-scoring the returned path must give
        # the same total (validates the path, not just the score)
        (ss, sv, sp, sw, M, entry_lp, fexit, toks, n) = al._build(words)
        import jax.numpy as jnp
        ll = np.asarray(al.scorer.score(jnp.asarray(feats)))
        ll = np.where(sv[None], ll[:, ss], -1e30)
        tot = entry_lp[states[0]] + ll[0, states[0]]
        for t in range(1, len(states)):
            tot += M[states[t - 1], states[t]] + ll[t, states[t]]
        tot += fexit[states[-1]]
        assert tot == pytest.approx(score_seq, abs=1e-2), D


def test_time_parallel_sharded(aligner):
    import jax
    from jax.sharding import Mesh
    from cmusphinx_tpu.decode.align_tp import align_time_parallel
    al, feats = aligner
    words = ["three", "five", "oh"]
    _, _, _, score_seq = al.align(feats, words)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    states, score = align_time_parallel(al, feats, words, n_chunks=4,
                                        mesh=mesh)
    assert score == pytest.approx(score_seq, abs=1e-2)

"""HTK MMF converter tests (htk2s3conv capability)."""

import numpy as np
import pytest

from cmusphinx_tpu.models.htk import HtkModelSet, convert_htk

MMF = """~o <VecSize> 4 <MFCC_D_A_0> <StreamInfo> 1 4
~v "varFloor1"
<Variance> 4
 1.0 1.0 1.0 1.0
~s "shared2"
<NumMixes> 2
<Mixture> 1 0.6
<Mean> 4
 1.0 0.0 0.0 0.0
<Variance> 4
 0.5 0.5 0.5 0.5
<Mixture> 2 0.4
<Mean> 4
 -1.0 0.0 0.0 0.0
<Variance> 4
 0.5 0.5 0.5 0.5
~h "sil"
<BeginHMM>
<NumStates> 5
<State> 2
<Mean> 4
 0.0 0.0 0.0 0.0
<Variance> 4
 1.0 1.0 1.0 1.0
<State> 3
~s "shared2"
<State> 4
<Mean> 4
 0.0 1.0 0.0 0.0
<Variance> 4
 1.0 1.0 1.0 1.0
<TransP> 5
 0.0 1.0 0.0 0.0 0.0
 0.0 0.6 0.4 0.0 0.0
 0.0 0.0 0.6 0.4 0.0
 0.0 0.0 0.0 0.6 0.4
 0.0 0.0 0.0 0.0 0.0
<EndHMM>
~h "ax"
<BeginHMM>
<NumStates> 5
<State> 2
<Mean> 4
 2.0 0.0 0.0 0.0
<Variance> 4
 1.0 1.0 1.0 1.0
<State> 3
<Mean> 4
 2.0 2.0 0.0 0.0
<Variance> 4
 1.0 1.0 1.0 1.0
<State> 4
~s "shared2"
<TransP> 5
 0.0 1.0 0.0 0.0 0.0
 0.0 0.5 0.5 0.0 0.0
 0.0 0.0 0.5 0.5 0.0
 0.0 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0 0.0
<EndHMM>
~h "sil-ax+sil"
<BeginHMM>
<NumStates> 5
<State> 2
<Mean> 4
 2.5 0.0 0.0 0.0
<Variance> 4
 1.0 1.0 1.0 1.0
<State> 3
<Mean> 4
 2.5 2.5 0.0 0.0
<Variance> 4
 1.0 1.0 1.0 1.0
<State> 4
~s "shared2"
<TransP> 5
 0.0 1.0 0.0 0.0 0.0
 0.0 0.5 0.5 0.0 0.0
 0.0 0.0 0.5 0.5 0.0
 0.0 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0 0.0
<EndHMM>
"""


def test_htk_parse(tmp_path):
    p = str(tmp_path / "model.mmf")
    open(p, "w").write(MMF)
    ms = HtkModelSet.read(p)
    assert set(ms.hmms) == {"sil", "ax", "sil-ax+sil"}
    assert ms.vecsize == 4
    h = ms.hmms["ax"]
    assert len(h.states) == 3
    # shared state: same object semantics (same parameters)
    np.testing.assert_allclose(h.states[2].weights, [0.6, 0.4])


def test_htk_convert_and_load(tmp_path):
    from cmusphinx_tpu.models import Mdef, TransitionMatrices
    from cmusphinx_tpu.models.gauden import read_gauden
    from cmusphinx_tpu.models.sendump import read_mixture_weights
    from cmusphinx_tpu.ops.gmm import ContinuousScorer

    p = str(tmp_path / "model.mmf")
    open(p, "w").write(MMF)
    out = str(tmp_path / "s3model")
    m = convert_htk(p, out)
    # sil renamed to SIL; triphone registered.
    assert "SIL" in m.ciname
    ax = m.ciphone_id["ax"]
    sil = m.ciphone_id["SIL"]
    tri = m.phone_id(ax, sil, sil, 0)
    assert tri >= m.n_ciphone  # found the sil-ax+sil triphone
    # Round trip through the framework's own readers.
    m2 = Mdef.read(out + "/mdef")
    assert m2.n_sen == m.n_sen and m2.n_ciphone == 2
    g = read_gauden(out + "/means", out + "/variances")
    lnw = read_mixture_weights(out + "/mixture_weights")
    tmat = TransitionMatrices.read(out + "/transition_matrices")
    assert tmat.check_bakis()
    assert g.n_mgau == m.n_sen and g.n_density == 2
    # Continuous scorer runs on the converted model.
    sc = ContinuousScorer(g, lnw[0].T, use_pallas=False)
    scores = np.asarray(sc.score(np.zeros((3, 4), np.float32)))
    assert scores.shape == (3, m.n_sen)
    assert np.isfinite(scores).all()
    # State 0 of sil (mean zero) must beat ax's state 0 (mean 2.0) on a
    # zero observation.
    sil_sen = int(m2.sseq[m2.phone_ssid[sil], 0])
    ax_sen = int(m2.sseq[m2.phone_ssid[ax], 0])
    assert scores[0, sil_sen] > scores[0, ax_sen]

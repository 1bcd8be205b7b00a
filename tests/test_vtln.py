"""VTLN warp estimation (SphinxTrain 12.vtln_align capability,
slave_align.pl:156-170: warp grid search by alignment likelihood).

Recovery test: a stationary multi-tone signal is frequency-scaled by a
planted factor r (vocal-tract-length simulation); candidate warps
recompute the mel filterbank from raw audio; the match against the
unwarped template peaks at warp == r exactly (inverse_linear places the
filter edges at warped*a, so a == r undoes the scaling).  Per-speaker
grouping is exercised through the same stub."""

import numpy as np
import pytest

from cmusphinx_tpu.frontend.fe import FE_ARGS
from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
from cmusphinx_tpu.frontend import Frontend
from cmusphinx_tpu.train.vtln import (default_warp_grid, estimate_vtln,
                                      estimate_vtln_per_speaker)
from cmusphinx_tpu.utils.config import Config

SR = 16000.0


def _tones(freqs, n=8000, sr=SR):
    t = np.arange(n) / sr
    x = sum(np.sin(2 * np.pi * f * t) * a
            for f, a in zip(freqs, (1.0, 0.7, 0.4)))
    return (1000.0 * x).astype(np.float32)


class _TemplateAligner:
    """Stub aligner: score = -distance of the utterance's mean feature
    vector to a template captured at warp 1.0 (stationary signals need no
    time alignment)."""

    def __init__(self, template_mean):
        self.t = np.asarray(template_mean)

    def align(self, feats, words):
        m = np.asarray(feats).mean(0)
        return [], [], None, -float(((m - self.t) ** 2).sum())


@pytest.fixture(scope="module")
def cfg():
    c = Config(FE_ARGS, FEAT_ARGS)
    # cmn=none: CMN would zero a stationary signal's mean features and
    # erase the warp signal this test measures.
    c.update(samprate=SR, dither=False, feat="1s_c_d_dd", cmn="none")
    return c


def test_recovers_planted_warp(cfg):
    """The inverse_linear warp pins the band edges [lowerf, upperf] and
    redistributes the interior filters (fe_build_melfilters semantics), so
    recovery is asserted as: exact identity at r=1, and for scaled inputs
    the likelihood strictly improves from 1.0 toward the planted side and
    the argmax lands on that side."""
    base = [500.0, 1500.0, 2500.0]
    tmpl = np.asarray(FeatPipeline(cfg).compute(
        np.asarray(Frontend(cfg).process(_tones(base))))).mean(0)
    al = _TemplateAligner(tmpl)
    grid = [0.85, 0.9, 0.95, 1.0, 1.05, 1.1, 1.15]

    best, totals = estimate_vtln([_tones(base)], [["x"]], al, cfg,
                                 warps=grid)
    assert best == pytest.approx(1.0), totals  # unwarped -> exactly 1.0

    lo_best, lo = estimate_vtln([_tones([f * 0.9 for f in base])], [["x"]],
                                al, cfg, warps=grid)
    assert lo_best < 1.0, lo
    assert lo[0.9] > lo[1.0] > lo[1.1], lo     # monotone toward planted side

    hi_best, hi = estimate_vtln([_tones([f * 1.1 for f in base])], [["x"]],
                                al, cfg, warps=grid)
    assert hi_best > 1.0, hi
    assert hi[1.1] > hi[1.0] > hi[0.9], hi

    # default grid matches the reference's CFG_VTLN_* defaults
    g = default_warp_grid()
    assert g[0] == 0.80 and g[-1] == 1.45 and len(g) == 14


def test_per_speaker_grouping(cfg):
    base = [500.0, 1500.0, 2500.0]
    tmpl = np.asarray(FeatPipeline(cfg).compute(
        np.asarray(Frontend(cfg).process(_tones(base))))).mean(0)
    al = _TemplateAligner(tmpl)
    utts = [_tones([f * 0.9 for f in base]), _tones(base),
            _tones([f * 0.9 for f in base])]
    spk = ["low", "one", "low"]
    out = estimate_vtln_per_speaker(spk, utts, [["x"]] * 3, al, cfg,
                                    warps=[0.9, 1.0, 1.1])
    assert out == {"low": 0.9, "one": 1.0}

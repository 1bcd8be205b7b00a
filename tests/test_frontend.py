"""Frontend golden tests against reference fixtures.

Mirrors sphinxbase test tiers (SURVEY.md §4): the golden cepstra file
`chan3.mfc` was produced by the reference `sphinx_fe` with the parameters in
sphinxbase/test/regression/test-sphinx_fe.sh; we require our fused JAX
pipeline to reproduce it within the regression-suite tolerance.
"""

import numpy as np
import pytest

from cmusphinx_tpu.frontend import Frontend
from cmusphinx_tpu.frontend.feat import FeatPipeline, parse_subvecs
from cmusphinx_tpu.utils.bio import read_mfc, read_raw_audio

CHAN3_ARGS = dict(
    samprate=11025, frate=105, wlen=0.024, alpha=0.97, ncep=13,
    nfft=512, nfilt=36, upperf=5400, lowerf=130,
)


@pytest.fixture(scope="module")
def chan3(reference_root):
    raw = read_raw_audio(reference_root / "sphinxbase/test/regression/chan3.raw")
    golden = read_mfc(reference_root / "sphinxbase/test/regression/chan3.mfc")
    return raw, golden


def test_frame_counting(chan3):
    raw, golden = chan3
    fe = Frontend(**CHAN3_ARGS)
    assert fe.frame_shift == 105
    assert fe.frame_size == 265
    assert fe.n_frames(len(raw)) == golden.shape[0]


def test_chan3_golden_cepstra(chan3):
    raw, golden = chan3
    fe = Frontend(**CHAN3_ARGS)
    cep = fe.process(raw)
    assert cep.shape == golden.shape
    # Reference regression tolerance is 0.1 (compare_table); we hold a much
    # tighter bound. Compare all but the zero-padded end_utt tail frame
    # strictly, tail frame as well since semantics match.
    err = np.abs(cep - golden)
    assert err.max() < 0.05, f"max abs err {err.max()}"
    assert np.mean(err) < 0.005


def test_chan3_streaming_matches_batch(chan3):
    raw, _ = chan3
    fe = Frontend(**CHAN3_ARGS)
    batch = fe.process(raw)
    stream = fe.start_utt()
    chunks = []
    # Feed in awkward chunk sizes to exercise the overflow carry.
    for start in range(0, len(raw), 3000):
        chunks.append(stream.process(raw[start : start + 3000]))
    chunks.append(stream.end_utt())
    live = np.concatenate([c for c in chunks if len(c)])
    assert live.shape == batch.shape
    # All regular frames must match tightly; the zero-padded end_utt tail
    # frame sees float32 FFT reassociation noise amplified by log() on
    # near-zero mel energies, so it gets the golden-test tolerance.
    assert np.abs(live[:-1] - batch[:-1]).max() < 1e-3
    assert np.abs(live[-1] - batch[-1]).max() < 0.05


def test_logspec_shape(chan3):
    raw, _ = chan3
    fe = Frontend(logspec=True, **CHAN3_ARGS)
    out = fe.process(raw[:40000])
    assert out.shape[1] == 36


def test_dct_variants(chan3):
    raw, _ = chan3
    for transform in ("legacy", "dct", "htk"):
        fe = Frontend(transform=transform, **CHAN3_ARGS)
        cep = fe.process(raw[:30000])
        assert np.isfinite(cep).all()
    # Unitary DCT should be invertible: dct then idct reproduces logmel.
    fe = Frontend(transform="dct", **CHAN3_ARGS)
    logmel = Frontend(logspec=True, **CHAN3_ARGS).process(raw[:30000])
    ncep_full = Frontend(transform="dct", ncep=36, **{k: v for k, v in CHAN3_ARGS.items() if k != "ncep"})
    cep_full = ncep_full.process(raw[:30000])
    recon = cep_full @ ncep_full.idct
    assert np.abs(recon - logmel).max() < 1e-2


# ---------------------------------------------------------------------------
# Dynamic features


def test_deltas_1s_c_d_dd():
    rng = np.random.RandomState(0)
    cep = rng.randn(30, 13).astype(np.float32)
    fp = FeatPipeline(feat="1s_c_d_dd", cmn="none")
    out = np.asarray(fp.compute(cep))
    assert out.shape == (30, 39)
    # Interior frame: hand-compute deltas per feat.c:726.
    t = 10
    np.testing.assert_allclose(out[t, :13], cep[t], rtol=1e-6)
    np.testing.assert_allclose(out[t, 13:26], cep[t + 2] - cep[t - 2], rtol=1e-5)
    np.testing.assert_allclose(
        out[t, 26:], (cep[t + 3] - cep[t - 1]) - (cep[t + 1] - cep[t - 3]),
        rtol=1e-4, atol=1e-5)
    # Edge: replicated first frame padding.
    np.testing.assert_allclose(out[0, 13:26], cep[2] - cep[0], rtol=1e-5)


def test_cmn_current():
    rng = np.random.RandomState(1)
    cep = (rng.randn(50, 13) + 5.0).astype(np.float32)
    fp = FeatPipeline(feat="1s_c", cmn="current")
    out = np.asarray(fp.compute(cep))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)


def test_s3_1x39_layout():
    rng = np.random.RandomState(2)
    cep = rng.randn(20, 13).astype(np.float32)
    fp = FeatPipeline(feat="s3_1x39", cmn="none")
    out = np.asarray(fp.compute(cep))
    assert out.shape == (20, 39)
    t = 8
    np.testing.assert_allclose(out[t, :12], cep[t, 1:], rtol=1e-6)
    np.testing.assert_allclose(out[t, 24], cep[t, 0], rtol=1e-6)  # c0 in pow block


def test_s2_4x_layout():
    rng = np.random.RandomState(3)
    cep = rng.randn(25, 13).astype(np.float32)
    fp = FeatPipeline(feat="s2_4x", cmn="none")
    out = np.asarray(fp.compute(cep))
    assert out.shape == (25, 51)
    assert fp.stream_lens == [12, 24, 3, 12]
    t = 12
    # Long-term delta block: cep[t+4] - cep[t-4], skipping c0.
    np.testing.assert_allclose(out[t, 24:36], (cep[t + 4] - cep[t - 4])[1:], rtol=1e-5)


def test_subvec_spec():
    sv = parse_subvecs("0-12/13-25/26-38")
    assert [len(s) for s in sv] == [13, 13, 13]
    assert sv[1][0] == 13
    fp = FeatPipeline(feat="1s_c_d_dd", cmn="none", svspec="0-12/13-25/26-38")
    rng = np.random.RandomState(4)
    out = fp.compute(rng.randn(10, 13).astype(np.float32))
    streams = fp.split_streams(np.asarray(out))
    assert [s.shape[1] for s in streams] == [13, 13, 13]


def test_prior_cmn_live():
    rng = np.random.RandomState(5)
    cep = (rng.randn(40, 13) + 3.0).astype(np.float32)
    fp = FeatPipeline(feat="1s_c", cmn="prior", cmninit="3.0")
    out = fp.compute_live(cep, beginutt=True, endutt=True)
    assert out.shape == (40, 13)
    # After the utterance the running mean should move toward the data mean.
    assert abs(float(fp._cmn_mean[0]) - float(cep[:, 0].mean())) < 1.5


def test_dither_seed_determinism(chan3):
    """-dither -seed contract (reference regression
    test-sphinx_fe-dither-seed.sh): a fixed seed makes dithered cepstra
    exactly repeatable; different seeds differ; dither off differs from
    dither on."""
    from cmusphinx_tpu.utils.config import Config
    from cmusphinx_tpu.frontend.fe import FE_ARGS
    raw, _ = chan3
    mk = lambda **kw: Frontend(Config(FE_ARGS).update(  # noqa: E731
        **CHAN3_ARGS, **kw))
    a1 = np.asarray(mk(dither=True, seed=1234).process(raw))
    a2 = np.asarray(mk(dither=True, seed=1234).process(raw))
    np.testing.assert_array_equal(a1, a2)
    # repeatable across calls of the SAME instance too (the RNG reseeds
    # per utterance, fe_start_utt genrand_seed semantics)
    fe = mk(dither=True, seed=1234)
    np.testing.assert_array_equal(np.asarray(fe.process(raw)),
                                  np.asarray(fe.process(raw)))
    b = np.asarray(mk(dither=True, seed=5678).process(raw))
    assert not np.array_equal(a1, b)
    c = np.asarray(mk(dither=False).process(raw))
    assert not np.array_equal(a1, c)

"""Forced alignment + allphone + VAD tests on the shipped tidigits model."""

import numpy as np
import pytest

from cmusphinx_tpu.decode.align import AlignSearch, allphone_search
from cmusphinx_tpu.frontend.vad import ContAD, segment_file
from cmusphinx_tpu.frontend.fe import FE_ARGS
from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
from cmusphinx_tpu.models import Mdef, TransitionMatrices, read_sendump
from cmusphinx_tpu.models.dict import Dictionary
from cmusphinx_tpu.models.gauden import read_gauden
from cmusphinx_tpu.ops.gmm import PsParityScorer
from cmusphinx_tpu.utils.bio import read_mfc
from cmusphinx_tpu.utils.config import Config


@pytest.fixture(scope="module")
def tidigits(reference_root):
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
    return d, mdef, tmat, scorer, fp, R


def test_forced_alignment(tidigits):
    d, mdef, tmat, scorer, fp, R = tidigits
    feats = np.asarray(fp.compute(read_mfc(
        str(R / "test/data/tidigits/man.ah.111a.mfc"))))
    al = AlignSearch(d, mdef, tmat, scorer)
    wsegs, phsegs, states, score = al.align(feats, ["one", "one", "one"])
    assert [s.word for s in wsegs] == ["one", "one", "one"]
    # Segments ordered, within the utterance, non-overlapping.
    for a, b in zip(wsegs, wsegs[1:]):
        assert a.end_frame < b.start_frame
    assert np.isfinite(score)
    # Phone segmentation covers every frame.
    assert phsegs[0].start_frame == 0
    assert phsegs[-1].end_frame == len(feats) - 1
    # Each 'one' contains the W_one phone.
    w_phones = [p for p in phsegs if p.phone == "W_one"]
    assert len(w_phones) == 3


def test_alignment_rejects_unknown_word(tidigits):
    d, mdef, tmat, scorer, fp, R = tidigits
    al = AlignSearch(d, mdef, tmat, scorer)
    with pytest.raises(KeyError):
        al.align(np.zeros((10, 51), np.float32), ["zzz"])


def test_allphone(tidigits):
    d, mdef, tmat, scorer, fp, R = tidigits
    feats = np.asarray(fp.compute(read_mfc(
        str(R / "test/data/tidigits/man.ah.8b.mfc"))))
    ap = allphone_search(mdef, tmat, scorer, lw=3.0)
    h = ap.decode(feats)
    # "EIGHT" = EY_eight T_eight; the phone string must contain its phones.
    assert "EY_eight" in h.text.split()


def test_vad_segments_speech():
    rng = np.random.RandomState(0)
    sr = 16000
    sil = rng.randn(sr) * 10.0
    speech = rng.randn(sr) * 2000.0
    audio = np.concatenate([sil, speech, sil]).astype(np.float32)
    segs = segment_file(audio, sample_rate=sr)
    assert len(segs) == 1
    s = segs[0]
    # Segment covers the loud second (with some padding slack).
    assert s.start_sample < sr * 1.1 and s.end_sample > sr * 1.9
    # Streaming equivalence: chunked processing finds the same segment.
    vad = ContAD(sample_rate=sr)
    segs2 = []
    for i in range(0, len(audio), 1600):
        segs2.extend(vad.process(audio[i : i + 1600]))
    segs2.extend(vad.end_stream())
    assert len(segs2) == 1
    assert abs(segs2[0].start_sample - s.start_sample) <= 1600


def test_allphone_phone_trigram(reference_root):
    """Allphone with the shipped an4 phone trigram LM loaded through the
    repo's DMP reader (srch_allphone phone-N-gram capability, reference
    sphinx3/src/libs3decoder/libsearch/srch_allphone.c; fixture
    sphinx3/model/lm/an4/an4.tg.phone.arpa.DMP)."""
    from cmusphinx_tpu.api import Decoder
    from cmusphinx_tpu.models.ngram import NgramModel
    R = str(reference_root / "pocketsphinx")
    plm_path = str(reference_root /
                   "sphinx3/model/lm/an4/an4.tg.phone.arpa.DMP")
    plm = NgramModel.read(plm_path)
    assert plm.n == 3 and plm.n_words == 35
    assert len(plm.tg_wid) == 1202  # trigram table loaded
    d = Decoder(hmm=R + "/model/hmm/en_US/hub4wsj_sc_8k",
                allphone=plm_path, lw=3.0, wip=0.05)
    h = d.decode_raw(R + "/test/data/goforward.raw")
    phones = [p for p in h.text.split() if not p.startswith("+")]
    # Phonotactics from the trigram recover the W-ER-D cluster; the phone
    # string must track "G OW F AO R W ER D ..." closely at the front.
    assert "OW" in phones[:4] and "AO" in phones[:6]
    assert "ER" in phones
    joined = " ".join(phones)
    assert "F AO R" in joined
    # Uniform-LM mode through the same API surface.
    d2 = Decoder(hmm=R + "/model/hmm/en_US/hub4wsj_sc_8k",
                 allphone="uniform", lw=3.0, wip=0.05)
    h2 = d2.decode_raw(R + "/test/data/goforward.raw")
    assert "F AO R" in h2.text

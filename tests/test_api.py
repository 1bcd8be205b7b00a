"""Decoder API tests (ps_* surface capability)."""

import numpy as np
import pytest

from cmusphinx_tpu.api import Decoder


@pytest.fixture(scope="module")
def tidigits_decoder(reference_root):
    R = reference_root / "pocketsphinx"
    return Decoder(hmm=str(R / "model/hmm/en/tidigits"),
                   lm=str(R / "model/lm/en/tidigits.DMP"),
                   dict=str(R / "model/lm/en/tidigits.dic"))


def test_decode_cep_file(tidigits_decoder, reference_root):
    R = reference_root / "pocketsphinx"
    h = tidigits_decoder.decode_cep_file(
        str(R / "test/data/tidigits/man.ah.111a.mfc"))
    assert h.text == "ONE ONE ONE"
    assert tidigits_decoder.hyp().text == h.text
    assert tidigits_decoder.seg()[0].start_frame == 0
    nb = tidigits_decoder.nbest(3)
    assert nb[0].text == "ONE ONE ONE"
    p = tidigits_decoder.get_prob()
    assert 0.0 <= p <= 1.0


def test_utt_state_machine(tidigits_decoder):
    d = tidigits_decoder
    with pytest.raises(RuntimeError):
        d.process_raw(np.zeros(10, np.float32))
    d.start_utt()
    with pytest.raises(RuntimeError):
        d.start_utt()
    h = d.end_utt()
    assert h.words == []


def test_feat_params_layering(reference_root):
    """Model-carried feat.params must configure the frontend (s2_4x)."""
    R = reference_root / "pocketsphinx"
    d = Decoder(hmm=str(R / "model/hmm/en/tidigits"),
                lm=str(R / "model/lm/en/tidigits.DMP"),
                dict=str(R / "model/lm/en/tidigits.dic"))
    assert d.fp.feat_type == "s2_4x"
    assert d.fp.dim == 51


def test_add_word(tidigits_decoder):
    wid = tidigits_decoder.add_word("testword", ["W_one", "AX_one"])
    assert tidigits_decoder.dict.wordid("testword") == wid

"""Class LM, LM set, and confusion network tests."""

import numpy as np
import pytest

from cmusphinx_tpu.models.lmset import (NgramModelSet, expand_classes,
                                        read_probdef)
from cmusphinx_tpu.models.ngram import NgramModel


def test_probdef_and_class_expansion(reference_root):
    """Expand the shipped an4 class LM ([a_class] containing A)."""
    base = reference_root / "sphinx3/model/lm/an4"
    classes = read_probdef(str(base / "an4.cls.probdef"))
    assert "[a_class]" in classes
    assert classes["[a_class]"][0][0] == "A"
    m = NgramModel.read(str(base / "an4.ug.cls.lm.DMP"))
    assert m.word_id("[a_class]") >= 0
    ex = expand_classes(m, classes)
    assert ex.word_id("[a_class]") < 0  # tag gone
    assert ex.word_id("A") >= 0
    # Member inherits the class's probability (x in-class prob 1.0).
    tag, mem = m.word_id("[a_class]"), ex.word_id("A")
    assert ex.ug_score(mem) == pytest.approx(float(m.ug_prob[tag]), abs=1e-4)


def test_lmctl(reference_root, tmp_path):
    base = reference_root / "sphinx3/model/lm/an4"
    ctl = tmp_path / "lm.ctl"
    ctl.write_text("{ %s }\n%s an4class { [a_class] }\n%s plain\n" % (
        base / "an4.cls.probdef", base / "an4.ug.cls.lm.DMP",
        base / "an4.ug.lm.DMP"))
    s = NgramModelSet.read_lmctl(str(ctl))
    assert set(s.names()) == {"an4class", "plain"}
    assert s.current == "an4class"
    assert s.lm().word_id("A") >= 0
    m2 = s.select("plain")
    assert s.current == "plain" and m2 is s.lm()
    with pytest.raises(KeyError):
        s.select("nope")


def test_sausage_and_consensus(reference_root):
    from cmusphinx_tpu.api import Decoder
    R = reference_root / "pocketsphinx"
    d = Decoder(hmm=str(R / "model/hmm/en/tidigits"),
                lm=str(R / "model/lm/en/tidigits.DMP"),
                dict=str(R / "model/lm/en/tidigits.dic"))
    h = d.decode_cep_file(str(R / "test/data/tidigits/man.ah.2934za.mfc"))
    assert h.text == "TWO NINE THREE FOUR ZERO"
    lat = d.get_lattice()
    saus = lat.sausage()
    # Sausage slots in time order; best path words appear as slot winners.
    winners = [slot[0][0] for slot in saus if slot]
    for w in ["TWO", "NINE", "THREE", "FOUR", "ZERO"]:
        assert w in winners
    # Probabilities are valid.
    for slot in saus:
        assert all(0.0 <= p <= 1.0 + 1e-6 for _, p in slot)
    ch = lat.consensus_hyp()
    assert "NINE" in ch.words and "ZERO" in ch.words

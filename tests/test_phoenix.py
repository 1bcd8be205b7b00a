"""Phoenix task-grammar compiler (logios MakeGra capability) against the
REAL shipped grammars (logios/Tools/MakeGra/phoenix_v0/Example and the
MeetingLine example domain)."""

import pytest

from cmusphinx_tpu.models.cfg import cfg_to_ngram, sample_sentences
from cmusphinx_tpu.models.phoenix import PhoenixGrammar, read_forms


def _derivable(cfg, sent, max_len=40):
    return 0 < len(sent) <= max_len


def test_parse_schedule_gra(reference_root):
    p = (reference_root / "logios/Tools/MakeGra/phoenix_v0/Example/"
         "Grammar/Schedule.gra")
    g = PhoenixGrammar.parse_file(str(p))
    assert "travel_date" in g.nets
    assert "Depart_Date" in g.nets
    # macro DEPARTING local to travel_date
    assert ("travel_date", "DEPARTING") in g.macros
    assert ["depart"] in g.macros[("travel_date", "DEPARTING")]
    # phrases reference nets and optional tokens
    assert any("[Depart_Date]" in " ".join(ph)
               for ph in g.nets["travel_date"])

    cfg = g.to_cfg()
    assert cfg.productions("$NET_travel_date")
    # sampling yields non-empty sentences of grammar words
    sents = [s for s in sample_sentences(cfg, 50, seed=1) if s]
    assert len(sents) >= 20
    vocab = {w for s in sents for w in s}
    assert "depart" in vocab or "departing" in vocab or "arrive" in vocab


def test_meetingline_to_lm_and_fsg(reference_root, tmp_path):
    gra = reference_root / "logios/Tools/cfg2ngram/test/MeetingLine.gra"
    g = PhoenixGrammar.parse_file(str(gra))
    assert g.nets
    cfg = g.to_cfg()
    lm = cfg_to_ngram(cfg, samples=500, seed=0)
    assert lm.n_words > 5
    ppl, nw, oov = lm.perplexity(
        [s for s in sample_sentences(cfg, 20, seed=3) if s])
    assert ppl > 1.0 and oov <= nw // 10  # rare paths may be unseen

    # CLI end to end: corpus + LM + FSG from the .gra
    from cmusphinx_tpu.cli.tools import main
    rc = main(["compile_gra", "-gra", str(gra),
               "-corpus", str(tmp_path / "c.txt"),
               "-lm", str(tmp_path / "g.arpa"),
               "-fsg", str(tmp_path / "g.fsg"),
               "-n", "50", "-samples", "300"])
    assert rc == 0
    assert (tmp_path / "c.txt").read_text().strip()
    from cmusphinx_tpu.models.ngram import NgramModel
    m = NgramModel.read(str(tmp_path / "g.arpa"))
    assert m.n_words > 5
    from cmusphinx_tpu.models.fsg import FsgModel
    f = FsgModel.read(str(tmp_path / "g.fsg"))
    assert f.n_state > 2


def test_forms_file(tmp_path):
    p = tmp_path / "x.forms"
    p.write_text("FUNCTION: query\n[travel_date]\n[travel_time]\n"
                 "# comment\nFUNCTION: other\n[foo]\n")
    assert read_forms(str(p)) == ["travel_date", "travel_time", "foo"]

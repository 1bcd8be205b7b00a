"""FSG results-layer parity: lattice, N-best, streaming partials, JSGF e2e.

Reference: fsg_search_lattice (pocketsphinx/src/libpocketsphinx/
fsg_search.c:74), fsg_history.c Viterbi history, ps_astar N-best, and the
gst plugin's partial results in grammar mode.
"""

import numpy as np
import pytest

from cmusphinx_tpu.api import Decoder
from cmusphinx_tpu.utils.bio import read_mfc

R = "/root/reference/pocketsphinx"


@pytest.fixture(scope="module")
def fsg_decoder(reference_root):
    return Decoder(hmm=R + "/model/hmm/en/tidigits",
                   fsg=R + "/model/lm/en/tidigits.fsg",
                   dict=R + "/model/lm/en/tidigits.dic")


def _decode(d, utt):
    cep = read_mfc(R + f"/test/data/tidigits/{utt}.mfc")
    d.start_utt()
    d.process_cep(cep)
    return d.end_utt()


def test_fsg_lattice_bestpath_nbest(fsg_decoder):
    d = fsg_decoder
    goldens = {"man.ah.111a": "ONE ONE ONE",
               "man.ah.2934za": "TWO NINE THREE FOUR ZERO"}
    for utt, gold in goldens.items():
        h = _decode(d, utt)
        assert h.text == gold
        lat = d.search.get_lattice()
        bp = lat.bestpath()
        assert bp.text == gold
        nb = lat.nbest(5)
        assert nb and nb[0].text == gold
        # A* first path score == exact Viterbi bestpath score.
        assert abs(nb[0].score - bp.score) < 1e-3
        scores = [hy.score for hy in nb]
        assert all(a >= b - 1e-6 for a, b in zip(scores, scores[1:]))
        # Posteriors: the 1-best path's nodes carry high posterior mass.
        post = lat.posterior()
        assert np.isfinite(post[np.argmax(post)])


def test_fsg_lattice_write(fsg_decoder, tmp_path):
    d = fsg_decoder
    _decode(d, "man.ah.111a")
    lat = d.search.get_lattice()
    p = str(tmp_path / "utt.lat")
    lat.write(p)
    txt = open(p).read()
    assert "Frames" in txt and "Edges" in txt and "ONE" in txt


def test_fsg_streaming_partials(fsg_decoder):
    d = fsg_decoder
    cep = read_mfc(R + "/test/data/tidigits/man.ah.111a.mfc")
    feats = np.asarray(d.fp.compute(cep))
    s = d.search.stream_start()
    partials = []
    for i in range(0, len(feats), 37):
        d.search.stream_push(s, feats[i : i + 37])
        partials.append(d.search.stream_partial(s).text)
    hyp = d.search.stream_end(s)
    assert hyp.text == "ONE ONE ONE"
    assert partials[-1]  # partial available mid-stream
    # Lattice from the streaming history too.
    assert d.search.get_lattice().bestpath().text == "ONE ONE ONE"


def test_jsgf_end_to_end_goforward(reference_root):
    """JSGF grammar decode of real audio, golden hypothesis + lattice
    (sphinx_jsgf2fsg + fsg decode + fsg_search_lattice chain)."""
    d = Decoder(hmm=R + "/model/hmm/en_US/hub4wsj_sc_8k",
                jsgf=R + "/test/data/goforward.gram",
                dict=R + "/model/lm/en/turtle.dic")
    h = d.decode_raw(R + "/test/data/goforward.raw")
    assert h.text == "go forward ten meters"
    lat = d.search.get_lattice()
    assert lat.bestpath().text == "go forward ten meters"
    nb = lat.nbest(3)
    assert nb[0].text == "go forward ten meters"

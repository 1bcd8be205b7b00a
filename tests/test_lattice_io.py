"""Lattice file reader + offline rescoring (VERDICT #8): write -> read ->
bestpath idempotence on a decoder-produced lattice, plus the dag/astar/conf
CLI subcommands over the dumped file."""

import numpy as np
import pytest

from cmusphinx_tpu.decode import NgramSearch
from cmusphinx_tpu.decode.lattice import read_lattice
from cmusphinx_tpu.frontend.fe import FE_ARGS
from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
from cmusphinx_tpu.models import Mdef, TransitionMatrices, read_sendump
from cmusphinx_tpu.models.dict import Dictionary
from cmusphinx_tpu.models.gauden import read_gauden
from cmusphinx_tpu.models.ngram import NgramModel
from cmusphinx_tpu.ops.gmm import PsParityScorer
from cmusphinx_tpu.utils.bio import read_mfc
from cmusphinx_tpu.utils.config import Config


@pytest.fixture(scope="module")
def decoded(reference_root):
    R = reference_root / "pocketsphinx"
    H = R / "model/hmm/en/tidigits"
    mdef = Mdef.read(str(H / "mdef"))
    g = read_gauden(str(H / "means"), str(H / "variances"))
    w, meta = read_sendump(str(H / "sendump"), return_raw=True)
    tmat = TransitionMatrices.read(str(H / "transition_matrices"))
    d = Dictionary.read(str(R / "model/lm/en/tidigits.dic"), mdef)
    lm = NgramModel.read(str(R / "model/lm/en/tidigits.DMP"))
    cfg = Config(FE_ARGS, FEAT_ARGS)
    cfg.update_from_file(str(H / "feat.params"))
    fp = FeatPipeline(cfg)
    scorer = PsParityScorer(g, w, fp.stream_slices(),
                            wrap_uint8=meta["n_bits"] == 4)
    search = NgramSearch(lm, d, mdef, tmat, scorer)
    cep = read_mfc(str(R / "test/data/tidigits/man.ah.2934za.mfc"))
    hyp = search.decode(np.asarray(fp.compute(cep)))
    assert hyp.text == "TWO NINE THREE FOUR ZERO"
    return search, lm, hyp


def test_write_read_bestpath_roundtrip(decoded, tmp_path):
    search, lm, hyp = decoded
    lat = search.get_lattice()
    p = tmp_path / "utt.lat"
    lat.write(str(p))
    start = search.start_lmwid
    want = lat.bestpath(lw=9.5, start_lmwid=start).text

    lat2 = read_lattice(str(p), lm, lw=9.5, log_wip=search.log_wip)
    assert len(lat2.nodes) == len(lat.nodes)
    got = lat2.bestpath(lw=9.5, start_lmwid=start)
    assert got.text == want
    # N-best over the read lattice contains the bestpath.
    nb = lat2.nbest(5, lw=9.5, start_lmwid=start)
    assert any(h.text == want for h in nb)
    # Posteriors finite and <= 0 for reachable nodes.
    post = lat2.posterior()
    assert np.isfinite(post).any()
    # Confidence for every hyp word.
    confs = lat2.word_confidence(got.segments)
    assert len(confs) == len(got.segments)
    assert all(lp <= 0.0 for _, _, _, lp in confs)


def test_dag_astar_conf_cli(decoded, tmp_path, capsys, reference_root):
    search, lm, hyp = decoded
    lat = search.get_lattice()
    p = tmp_path / "utt.lat"
    lat.write(str(p))
    from cmusphinx_tpu.cli.tools import main
    lmpath = str(reference_root / "pocketsphinx/model/lm/en/tidigits.DMP")
    assert main(["dag", "-lat", str(p), "-lm", lmpath]) == 0
    out = capsys.readouterr().out
    assert "BSTPTH:" in out and "TWO NINE THREE FOUR ZERO" in out
    assert main(["astar", "-lat", str(p), "-lm", lmpath, "-n", "3"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) >= 1
    assert main(["conf", "-lat", str(p), "-lm", lmpath]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) >= 5


def test_htk_slf_roundtrip(decoded, tmp_path):
    """write_htk -> read_htk_lattice -> bestpath reproduces the hypothesis
    (VERDICT r4 #7: SLF read so external lattices can be rescored)."""
    from cmusphinx_tpu.decode.lattice import read_htk_lattice
    search, lm, hyp = decoded
    lat = search.get_lattice()
    p = tmp_path / "utt.slf"
    lat.write_htk(str(p))
    start = search.start_lmwid
    want = lat.bestpath(lw=9.5, start_lmwid=start).text

    lat2 = read_htk_lattice(str(p), lm, lw=9.5, log_wip=search.log_wip)
    assert len(lat2.nodes) == len(lat.nodes)
    got = lat2.bestpath(lw=9.5, start_lmwid=start)
    assert got.text == want
    nb = lat2.nbest(5, lw=9.5, start_lmwid=start)
    assert any(h.text == want for h in nb)
    post = lat2.posterior()
    assert np.isfinite(post).any()
    # Sausage/consensus runs over the external lattice too (row 83 intake).
    slots = lat2.sausage()
    assert slots and all(slots)


def test_htk_external_word_on_link(tmp_path):
    """HTK-convention lattice (words on links, lmscale header, quoted
    values, start/end header) scores from its own a=/l= fields when no LM
    is given — the htk2dag/CLP intake path."""
    from cmusphinx_tpu.decode.lattice import read_htk_lattice
    slf = tmp_path / "ext.slf"
    slf.write_text(
        "VERSION=1.0\n"
        "UTTERANCE=ext\n"
        "lmscale=2.0\tstart=0\tend=4\n"
        "N=5\tL=6\n"
        "I=0\tt=0.00\n"
        "I=1\tt=0.10\n"
        "I=2\tt=0.10\n"
        "I=3\tt=0.30\n"
        "I=4\tt=0.50\n"
        'J=0\tS=0\tE=1\tW="hello"\ta=-10.0\tl=-1.0\n'
        'J=1\tS=0\tE=2\tW="yellow"\ta=-30.0\tl=-1.0\n'
        'J=2\tS=1\tE=3\tW="world"\ta=-12.0\tl=-0.5\n'
        'J=3\tS=2\tE=3\tW="world"\ta=-12.0\tl=-0.5\n'
        'J=4\tS=3\tE=4\tW="!NULL"\ta=0.0\tl=0.0\n'
        'J=5\tS=1\tE=4\tW="!NULL"\ta=-50.0\tl=0.0\n')
    lat = read_htk_lattice(str(slf))
    assert len(lat.nodes) == 5
    # words landed on link end nodes
    assert lat.nodes[1].word == "hello"
    assert lat.nodes[2].word == "yellow"
    assert lat.nodes[3].word == "world"
    hyp = lat.bestpath()
    assert hyp.words == ["hello", "world"]
    # best path total = a-sum + lmscale * l-sum = (-10-12) + 2*(-1.5) = -25
    assert abs(hyp.score - (-25.0)) < 1e-6
    nb = lat.nbest(3)
    assert nb[0].words == ["hello", "world"]
    assert any(h.words == ["yellow", "world"] for h in nb)

"""sphinx4 NetworkLanguageModel wire-protocol parity: serve the shipped
turtle LM over the probserver line protocol and score against the host
model through the socket."""

import math

import pytest

from cmusphinx_tpu.lm.server import LmServer, NetworkLm
from cmusphinx_tpu.models.ngram import NgramModel


@pytest.fixture(scope="module")
def served(reference_root):
    lm = NgramModel.read(
        str(reference_root / "pocketsphinx/model/lm/en/turtle.DMP"))
    srv = LmServer(lm, port=0)
    srv.start()
    yield lm, srv
    srv.stop()


def test_probserver_protocol(served):
    lm, srv = served
    cli = NetworkLm("127.0.0.1", srv.port)
    ln10 = math.log(10.0)
    # unigram / bigram / trigram queries match the host model's backoff
    w = ["go", "forward", "ten"]
    ids = [lm.word_id(x) for x in w]
    assert all(i >= 0 for i in ids)
    assert cli.log10_prob(["go"]) == pytest.approx(
        lm.tg_score(-1, -1, ids[0]) / ln10, abs=1e-4)
    assert cli.log10_prob(["go", "forward"]) == pytest.approx(
        lm.tg_score(-1, ids[0], ids[1]) / ln10, abs=1e-4)
    assert cli.log10_prob(w) == pytest.approx(
        lm.tg_score(ids[0], ids[1], ids[2]) / ln10, abs=1e-4)
    # unknown word -> -inf -> LOG_ZERO
    assert cli.log10_prob(["xyzzy_unknown"]) == NetworkLm.LOG_ZERO
    # cache answers repeat queries identically
    assert cli.log10_prob(w) == cli.log10_prob(w)
    # natural-log convenience
    assert cli.ln_prob(["go"]) == pytest.approx(
        lm.tg_score(-1, -1, ids[0]), abs=1e-3)
    cli.close()


def test_multiple_clients(served):
    lm, srv = served
    a = NetworkLm("127.0.0.1", srv.port)
    b = NetworkLm("127.0.0.1", srv.port)
    assert a.log10_prob(["go"]) == b.log10_prob(["go"])
    a.close()
    b.close()

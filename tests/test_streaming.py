"""Streaming decode with device-resident carry and partial hypotheses
(VERDICT #5; ps_process_raw incremental loop + gst partial results)."""

import numpy as np
import pytest

from cmusphinx_tpu.api import Decoder
from cmusphinx_tpu.utils.bio import read_mfc


@pytest.fixture(scope="module")
def tidigits(reference_root):
    R = reference_root / "pocketsphinx"
    return Decoder(hmm=str(R / "model/hmm/en/tidigits"),
                   dict=str(R / "model/lm/en/tidigits.dic"),
                   lm=str(R / "model/lm/en/tidigits.DMP"))


def test_stream_matches_batch_exactly(tidigits, reference_root):
    """Chunked streaming over the same features == whole-utterance decode,
    tape-for-tape (the carry math is identical)."""
    d = tidigits
    search = d.search
    cep = read_mfc(str(reference_root /
                       "pocketsphinx/test/data/tidigits/man.ah.2934za.mfc"))
    feats = np.asarray(d.fp.compute(cep))
    batch_hyp = search.decode(feats)
    batch_tape = search._last

    st = search.stream_start(max_frames=1000)
    partials = []
    for i in range(0, feats.shape[0], 37):
        search.stream_push(st, feats[i : i + 37])
        p = search.stream_partial(st)
        partials.append(p.words)
    final = search.stream_end(st)
    assert final.text == batch_hyp.text == "TWO NINE THREE FOUR ZERO"
    # Tape slots agree exactly on the decoded region.
    T = feats.shape[0]
    E = search.E
    stream_tape = search._last
    np.testing.assert_array_equal(stream_tape[0][: T * E],
                                  batch_tape[0][: T * E])
    np.testing.assert_allclose(stream_tape[1][: T * E],
                               batch_tape[1][: T * E], rtol=1e-5)
    # Partial hypotheses grow and converge to the final answer.
    assert any(partials), "no partial results produced"
    assert partials[-1] == final.words
    # Each partial is a prefix of the final hypothesis on this fixture.
    for words in partials:
        if words:
            assert final.words[: len(words)] == words, (words, final.words)


def test_decoder_streaming_api_cep(tidigits, reference_root):
    """Decoder-level streaming via process_cep: partial hyps mid-utterance,
    golden final hypothesis."""
    d = tidigits
    cep = read_mfc(str(reference_root /
                       "pocketsphinx/test/data/tidigits/woman.ak.99731a.mfc"))
    d.start_utt(streaming=True)
    partials = []
    for i in range(0, cep.shape[0], 60):
        d.process_cep(cep[i : i + 60])
        h = d.hyp()
        partials.append(h.words if h else [])
    hyp = d.end_utt()
    assert hyp.text == "NINE NINE SEVEN THREE ONE"
    assert d.hyp().text == hyp.text
    assert any(partials)


def test_decoder_streaming_api_raw(reference_root):
    """Raw-audio streaming through the incremental frontend on
    goforward.raw with the hub4 model (the reference's canonical live
    demo)."""
    R = reference_root / "pocketsphinx"
    d = Decoder(hmm=str(R / "model/hmm/en_US/hub4wsj_sc_8k"),
                dict=str(R / "model/lm/en/turtle.dic"),
                fdict=str(R / "model/hmm/en_US/hub4wsj_sc_8k/noisedict"),
                lm=str(R / "model/lm/en/turtle.DMP"))
    raw = np.frombuffer(
        open(str(R / "test/data/goforward.raw"), "rb").read(),
        np.int16).astype(np.float32)
    d.start_utt(streaming=True)
    step = 4000  # 0.25 s chunks
    for i in range(0, len(raw), step):
        d.process_raw(raw[i : i + step])
    hyp = d.end_utt()
    assert hyp.text == "go forward ten meters"


def test_phone_loop_lookahead_integration(tidigits, reference_root):
    """Phone-loop lookahead (pl_window) tightens beams inside the main
    search without changing the golden hypothesis at a sane weight."""
    from cmusphinx_tpu.decode import NgramSearch
    d = tidigits
    search = NgramSearch(d.search.lm, d.dict, d.mdef, d.tmat, d.scorer,
                         pl_window=5, pl_weight=2.0)
    assert search.pl_window == 5
    cep = read_mfc(str(reference_root /
                       "pocketsphinx/test/data/tidigits/man.ah.2934za.mfc"))
    feats = np.asarray(d.fp.compute(cep))
    hyp = search.decode(feats)
    assert hyp.text == "TWO NINE THREE FOUR ZERO"
    # The lookahead penalties are real (some phones penalized).
    import jax.numpy as jnp
    scores = search.scorer.score(jnp.asarray(feats))
    cis = jnp.where(search._ci_sen_valid[None], scores[:, search._ci_sen],
                    jnp.float32(-1e30)).max(-1)
    rel = np.asarray(cis - cis.max(axis=1, keepdims=True))
    assert (rel < -1.0).any()


def test_streaming_lookahead_active(tidigits, reference_root):
    """With pl_window set, STREAMING decode feeds real lookahead into the
    chunked step (fix for the la=zeros hole) and still produces the
    golden transcript; frames are held back so every decoded frame sees
    its full window."""
    from cmusphinx_tpu.decode import NgramSearch
    d = tidigits
    search = NgramSearch(d.search.lm, d.dict, d.mdef, d.tmat, d.scorer,
                         pl_window=5, pl_weight=2.0)
    cep = read_mfc(str(reference_root /
                       "pocketsphinx/test/data/tidigits/man.ah.2934za.mfc"))
    feats = np.asarray(d.fp.compute(cep))
    st = search.stream_start(max_frames=1000)
    for i in range(0, feats.shape[0], 37):
        search.stream_push(st, feats[i : i + 37])
    # Lookahead hold-back: pending retains >= pl_window frames.
    assert st["pending"].shape[0] >= 5
    hyp = search.stream_end(st)
    assert hyp.text == "TWO NINE THREE FOUR ZERO"
    assert st["t"] == feats.shape[0]


def test_streaming_tape_growth_long_audio(tidigits, reference_root):
    """Audio past max_frames GROWS the tape instead of raising (long-form
    streaming, acmod_set_grow semantics): a 3x-concatenated utterance
    decodes through a tape sized for a third of it."""
    d = tidigits
    search = d.search
    cep = read_mfc(str(reference_root /
                       "pocketsphinx/test/data/tidigits/man.ah.2934za.mfc"))
    feats = np.asarray(d.fp.compute(cep))
    long_feats = np.concatenate([feats, feats, feats])
    st = search.stream_start(max_frames=100)  # deliberately undersized
    for i in range(0, long_feats.shape[0], 64):
        search.stream_push(st, long_feats[i : i + 64])
    hyp = search.stream_end(st)
    assert st["max_frames"] >= long_feats.shape[0]
    assert st["t"] == long_feats.shape[0]
    # All three repetitions decoded.
    assert hyp.text.split().count("NINE") == 3
    assert hyp.text.split().count("ZERO") == 3

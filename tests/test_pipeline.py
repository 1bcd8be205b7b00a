"""Audio front door: AudioSource seam + VAD-gated push pipeline.

Reference capability: libsphinxad source contract (ad_alsa.c ad_read),
gst-plugin decoder element with partial-result bus messages + vader gate
(gstpocketsphinx.c).
"""

import wave

import numpy as np
import pytest

from cmusphinx_tpu.frontend.source import (BufferSource, RawFileSource,
                                           WavFileSource)


def test_raw_file_source(reference_root, tmp_path):
    path = str(reference_root / "pocketsphinx/test/data/goforward.raw")
    src = RawFileSource(path)
    blocks = list(src)
    total = sum(len(b) for b in blocks)
    want = len(np.frombuffer(open(path, "rb").read(), np.int16))
    assert total == want
    assert src.read(10) is None


def test_wav_file_source(tmp_path):
    sr = 16000
    x = (np.sin(np.arange(sr) * 0.1) * 8000).astype(np.int16)
    p = tmp_path / "t.wav"
    with wave.open(str(p), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())
    src = WavFileSource(str(p))
    assert src.sample_rate == sr
    got = np.concatenate(list(src))
    assert np.array_equal(got, x.astype(np.float32))


def test_buffer_source_push_pull():
    src = BufferSource()
    assert len(src.read(100)) == 0            # dry, not EOS
    src.push(np.arange(10, dtype=np.float32))
    src.push(np.arange(10, 20, dtype=np.float32))
    a = src.read(15)
    assert np.array_equal(a, np.arange(15, dtype=np.float32))
    src.end()
    b = src.read(15)
    assert np.array_equal(b, np.arange(15, 20, dtype=np.float32))
    assert src.read(1) is None


@pytest.fixture(scope="module")
def turtle_decoder(reference_root):
    from cmusphinx_tpu.api import Decoder
    R = reference_root / "pocketsphinx"
    return Decoder(hmm=str(R / "model/hmm/en_US/hub4wsj_sc_8k"),
                   lm=str(R / "model/lm/en/turtle.DMP"),
                   dict=str(R / "model/lm/en/turtle.dic"))


def test_push_pipeline_partials_and_result(reference_root, turtle_decoder):
    """Drive goforward.raw through the push pipeline in small chunks:
    the VAD must produce one speech segment, partial callbacks must fire
    during it, and the final result must be the golden hypothesis."""
    from cmusphinx_tpu.pipeline import SpeechPipeline
    path = str(reference_root / "pocketsphinx/test/data/goforward.raw")
    partials, results = [], []
    pipe = SpeechPipeline(
        turtle_decoder,
        on_partial=lambda text, t: partials.append((t, text)),
        on_result=lambda hyp, t0, t1: results.append((t0, t1, hyp.text)))
    data = np.frombuffer(open(path, "rb").read(), np.int16)
    for i in range(0, len(data), 4000):        # 250 ms pushes
        pipe.push(data[i : i + 4000].astype(np.float32))
    pipe.finish()
    assert len(results) == 1
    t0, t1, text = results[0]
    assert text == "go forward ten meters"
    assert 0.0 <= t0 < t1
    assert len(partials) >= 2
    # Partials converge onto the final text.
    assert partials[-1][1] == "go forward ten meters"


def test_pipeline_run_from_source(reference_root, turtle_decoder):
    from cmusphinx_tpu.pipeline import SpeechPipeline
    path = str(reference_root / "pocketsphinx/test/data/goforward.raw")
    results = []
    pipe = SpeechPipeline(
        turtle_decoder,
        on_result=lambda hyp, t0, t1: results.append(hyp.text))
    pipe.run(RawFileSource(path))
    assert results == ["go forward ten meters"]

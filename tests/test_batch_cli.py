"""Batch CLI per-utterance failure isolation.

The reference's batch driver logs a failed utterance and continues the
corpus run (sphinx3 libAPI/utt.c; SURVEY §5 failure detection).  A corrupt
MFC file in the middle of a ctl file must not abort the run: the good
utterances decode, the bad one lands on the skip list, and the exit code
stays 0.
"""

import pytest

from cmusphinx_tpu.cli import batch


def test_batch_skips_corrupt_utterance(tmp_path, capsys, reference_root):
    R = reference_root / "pocketsphinx"
    cepdir = tmp_path / "cep"
    cepdir.mkdir()
    good = (R / "test/data/tidigits/man.ah.111a.mfc").read_bytes()
    (cepdir / "good1.mfc").write_bytes(good)
    (cepdir / "bad.mfc").write_bytes(b"\x00\x01not an mfc file")
    (cepdir / "good2.mfc").write_bytes(good)
    ctl = tmp_path / "test.ctl"
    ctl.write_text("good1\nbad\ngood2\n")
    hyp = tmp_path / "out.hyp"

    rc = batch.main([
        "-hmm", str(R / "model/hmm/en/tidigits"),
        "-lm", str(R / "model/lm/en/tidigits.DMP"),
        "-dict", str(R / "model/lm/en/tidigits.dic"),
        "-ctl", str(ctl), "-cepdir", str(cepdir), "-cepext", ".mfc",
        "-hyp", str(hyp),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SKIPPED 1: bad" in out
    lines = hyp.read_text().splitlines()
    assert len(lines) == 2  # both good utterances decoded
    assert all("ONE ONE ONE" in l for l in lines)

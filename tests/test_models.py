"""Model zoo I/O tests against the shipped reference models
(pocketsphinx/model/hmm/en_US/hub4wsj_sc_8k and en/tidigits)."""

import numpy as np
import pytest

from cmusphinx_tpu.models import Mdef, TransitionMatrices, read_sendump
from cmusphinx_tpu.models.gauden import read_gauden


@pytest.fixture(scope="module")
def hub4(reference_root):
    return reference_root / "pocketsphinx/model/hmm/en_US/hub4wsj_sc_8k"


@pytest.fixture(scope="module")
def tidigits(reference_root):
    return reference_root / "pocketsphinx/model/hmm/en/tidigits"


def test_bin_mdef_hub4(hub4):
    m = Mdef.read(str(hub4 / "mdef"))
    assert m.n_ciphone == 50
    assert m.n_sen == 5150
    assert m.n_ci_sen == 150
    assert m.n_emit_state == 3
    assert m.ciname[m.sil] == "SIL"
    assert m.is_filler(m.sil)
    # Triphone lookup: every CD phone must be findable through the index.
    pid = m.phone_id(m.ciphone_id["AA"], m.ciphone_id["B"], m.ciphone_id["K"], 0)
    assert pid >= m.n_ciphone
    b, lc, rc, wp = m.phone_ctx[pid]
    assert b == m.ciphone_id["AA"] and lc == m.ciphone_id["B"]
    # Senone maps: CI senones map to themselves.
    assert (m.cd2cisen[: m.n_ci_sen] == np.arange(m.n_ci_sen)).all()
    assert (m.sen2cimap >= 0).all()


def test_gauden_hub4(hub4):
    g = read_gauden(str(hub4 / "means"), str(hub4 / "variances"))
    assert (g.n_mgau, g.n_feat, g.n_density) == (1, 3, 256)
    assert g.veclen == [13, 13, 13]
    assert np.isfinite(g.lrd).all()
    assert (g.prec >= 0).all()


def test_tmat_hub4(hub4):
    t = TransitionMatrices.read(str(hub4 / "transition_matrices"))
    assert t.n_tmat == 50
    assert t.n_state == 3
    assert t.check_bakis()
    # Rows sum to 1 in linear domain.
    p = np.exp(np.where(t.log_tp > -1e29, t.log_tp, -np.inf))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_sendump_hub4_4bit(hub4):
    w = read_sendump(str(hub4 / "sendump"))
    assert w.shape == (3, 256, 5150)
    # ln weights, should be negative and exp-sum to ~1 per senone.
    assert (w < 0).all()
    sums = np.exp(w[:, :, :50].astype(np.float64)).sum(axis=1)
    assert (np.abs(sums - 1.0) < 0.35).all()


def test_sendump_tidigits_8bit(tidigits):
    m = Mdef.read(str(tidigits / "mdef"))
    assert m.n_emit_state == 5
    g = read_gauden(str(tidigits / "means"), str(tidigits / "variances"))
    assert g.veclen == [12, 24, 3, 12]  # s2_4x streams
    w = read_sendump(str(tidigits / "sendump"))
    assert w.shape == (4, 256, 670)


def test_mdef_binary_writer_roundtrip(tidigits, hub4, tmp_path):
    """BMDF writer (bin_mdef.c:517-599 layout) round-trips both a text mdef
    (tidigits) and a shipped binary mdef (hub4) bit-compatibly."""
    for src in (str(tidigits / "mdef"), str(hub4 / "mdef")):
        m = Mdef.read(src)
        out = str(tmp_path / "out.bmdf")
        m.write_binary(out)
        with open(out, "rb") as fh:
            assert fh.read(4) == b"BMDF"
        m2 = Mdef.read(out)
        assert m2.n_ciphone == m.n_ciphone and m2.n_phone == m.n_phone
        assert m2.n_sen == m.n_sen and m2.n_sseq == m.n_sseq
        assert m2.ciname == m.ciname
        assert np.array_equal(m2.phone_ssid, m.phone_ssid)
        assert np.array_equal(m2.phone_tmat, m.phone_tmat)
        assert np.array_equal(m2.sseq, m.sseq)
        assert np.array_equal(m2.phone_ctx, m.phone_ctx)
        assert np.array_equal(m2.cd2cisen, m.cd2cisen)
        assert np.array_equal(m2.sen2cimap, m.sen2cimap)
        assert m2._tri_index == m._tri_index


def test_mdef_text_writer_roundtrip(tidigits, tmp_path):
    m = Mdef.read(str(tidigits / "mdef"))
    out = str(tmp_path / "out.mdef")
    m.write_text(out)
    m2 = Mdef.read(out)
    assert m2.ciname == m.ciname
    assert np.array_equal(m2.sseq[m2.phone_ssid], m.sseq[m.phone_ssid])
    assert m2._tri_index.keys() == m._tri_index.keys()
    assert np.array_equal(m2.phone_tmat, m.phone_tmat)

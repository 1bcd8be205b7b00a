"""Trainer tests: sentence HMM, Baum-Welch EM, sharded reduction,
checkpointing, model export round-trip, Viterbi alignment."""

import numpy as np
import pytest

import jax

from cmusphinx_tpu.train.bw import forward_backward, pack_batch, viterbi_align
from cmusphinx_tpu.train.model_io import export_model
from cmusphinx_tpu.train.sentence_hmm import FlatModel, build_sentence_hmm
from cmusphinx_tpu.train.trainer import HmmParams, Trainer, flat_start


PRON = {"ab": ["A", "B"], "ba": ["B", "A"]}


def _toy_corpus(n_utt=6, seed=0):
    """Synthetic 2-phone corpus with distinct per-phone distributions."""
    rng = np.random.RandomState(seed)
    model = FlatModel.create(["SIL", "A", "B"], n_state=3)
    centers = {"SIL": 0.0, "A": 3.0, "B": -3.0}
    feats, trans = [], []
    for i in range(n_utt):
        words = ["ab", "ba"][i % 2 : i % 2 + 1] * (1 + i % 2)
        seq = ["SIL"]
        for w in words:
            seq += PRON[w] + ["SIL"]
        f = []
        for p in seq:
            f.append(rng.randn(6, 4).astype(np.float32) * 0.3 + centers[p])
        feats.append(np.concatenate(f))
        trans.append(words)
    return model, feats, trans


def test_sentence_hmm_shapes():
    model = FlatModel.create(["SIL", "A", "B"], n_state=3)
    h = build_sentence_hmm(["ab"], PRON, model)
    # SIL A B SIL = 4 phones x 3 states
    assert len(h.state_sen) == 12
    assert h.entry.sum() >= 2          # optional initial silence: SIL or A
    assert len(h.fsrc) >= 2            # optional final silence
    assert (h.etj <= 3).all()


def test_em_likelihood_increases():
    model, feats, trans = _toy_corpus()
    tr = Trainer(model, PRON, trans, feats, K=2)
    hist = [tr.em_step() for _ in range(5)]
    assert all(b >= a - 1e-4 for a, b in zip(hist, hist[1:])), hist


def test_sharded_em_matches_single():
    """psum-reduced data-parallel EM == single-device EM (the 'norm over
    accumulator dirs' equivalence, SURVEY.md §4 multi-node testing)."""
    from jax.sharding import Mesh
    model, feats, trans = _toy_corpus(n_utt=8)
    tr1 = Trainer(model, PRON, trans, feats, K=2)
    tr2 = Trainer(model, PRON, trans, feats, K=2)
    ll1 = tr1.em_step()
    devs = jax.devices()
    mesh = Mesh(np.array(devs[: min(4, len(devs))]).reshape(-1), ("dp",))
    ll2 = tr2.em_step_sharded(mesh)
    assert ll1 == pytest.approx(ll2, abs=1e-3)
    np.testing.assert_allclose(tr1.params.means, tr2.params.means,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(tr1.params.tp, tr2.params.tp,
                               rtol=1e-4, atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    model, feats, trans = _toy_corpus()
    tr = Trainer(model, PRON, trans, feats, K=1, ckpt_dir=str(tmp_path))
    tr.em_step()
    tr.em_step()
    path = tmp_path / "ckpt_002.npz"
    assert path.exists()
    params, it, hist = Trainer.load_checkpoint(str(path))
    assert it == 2 and len(hist) == 2
    np.testing.assert_array_equal(params.means, tr.params.means)


def test_export_reload_roundtrip(tmp_path):
    from cmusphinx_tpu.models import Mdef, TransitionMatrices
    from cmusphinx_tpu.models.gauden import read_gauden
    from cmusphinx_tpu.models.sendump import read_mixture_weights
    model, feats, trans = _toy_corpus()
    tr = Trainer(model, PRON, trans, feats, K=2)
    tr.em_step()
    export_model(str(tmp_path), model, tr.params)
    mdef = Mdef.read(str(tmp_path / "mdef"))
    assert mdef.n_ciphone == 3 and mdef.n_sen == model.n_sen
    g = read_gauden(str(tmp_path / "means"), str(tmp_path / "variances"))
    np.testing.assert_allclose(g.means[:, 0], tr.params.means, atol=1e-6)
    lnw = read_mixture_weights(str(tmp_path / "mixture_weights"))
    np.testing.assert_allclose(np.exp(lnw[0].T), np.exp(tr.params.lnw),
                               rtol=1e-4)
    tm = TransitionMatrices.read(str(tmp_path / "transition_matrices"))
    assert tm.n_tmat == model.n_tmat and tm.check_bakis()


def test_viterbi_align():
    """Forced alignment recovers the phone layout of synthetic data."""
    model, feats, trans = _toy_corpus()
    tr = Trainer(model, PRON, trans, feats, K=1)
    for _ in range(4):
        tr.em_step()
    scores, states = jax.jit(viterbi_align)(
        tr.batch, tr.params.means, tr.params.prec, tr.params.lnw,
        tr.params.log_tp)
    states = np.asarray(states)
    b = 0
    T = int(tr.batch.T[b])
    st = states[b, :T]
    assert (st >= 0).all()
    phones = tr.batch.state_phone[b][st]
    # First frames align to SIL (phone 0), and the A phone (center +3)
    # aligns to frames with positive feature mean.
    a_id = model.phone_id["A"]
    a_frames = phones == a_id
    assert a_frames.any()
    assert tr.batch.feats[b, :T][a_frames].mean() > 1.0
    assert tr.batch.feats[b, :T][phones == model.phone_id["B"]].mean() < -1.0


def test_cd_pipeline_and_export(tmp_path):
    """CI -> CD-untied -> tie -> split pipeline improves likelihood and the
    exported triphone model round-trips through the decoder stack."""
    from cmusphinx_tpu.train.pipeline import (TriphoneInventory,
                                              export_cd_model,
                                              split_gaussians,
                                              train_full_pipeline)
    model, feats, trans = _toy_corpus(n_utt=8)
    inv, smap, tied, hist = train_full_pipeline(
        model, PRON, trans, feats, gauss=2, ci_iters=5, cd_iters=4,
        tied_iters=4)
    assert inv.n_tri > 0
    assert hist["cd_untied"][-1] >= hist["ci"][-1] - 0.1
    assert hist["split_2"][-1] >= hist["tied"][-1] - 0.1
    # smap maps every untied senone onto a kept senone id.
    assert smap.max() < tied.means.shape[0]
    export_cd_model(str(tmp_path), inv, smap, tied, feat="4")
    from cmusphinx_tpu.models import Mdef, TransitionMatrices
    from cmusphinx_tpu.models.gauden import read_gauden
    mdef = Mdef.read(str(tmp_path / "mdef"))
    assert mdef.n_phone == len(model.phones) + inv.n_tri
    assert mdef.n_sen == tied.means.shape[0]
    # Triphone lookup through the exported mdef works.
    a, b = model.phone_id["A"], model.phone_id["B"]
    pid = mdef.phone_id(a, model.phone_id["SIL"], b, 1)  # A(SIL,B) begin
    assert pid >= mdef.n_ciphone
    g = read_gauden(str(tmp_path / "means"), str(tmp_path / "variances"))
    assert g.n_mgau == tied.means.shape[0]
    tm = TransitionMatrices.read(str(tmp_path / "transition_matrices"))
    assert tm.check_bakis()


def test_split_gaussians():
    from cmusphinx_tpu.train.pipeline import split_gaussians
    model, feats, trans = _toy_corpus()
    tr = Trainer(model, PRON, trans, feats, K=1)
    ll1 = [tr.em_step() for _ in range(3)][-1]
    tr.params = split_gaussians(tr.params)
    assert tr.params.means.shape[1] == 2
    ll2 = [tr.em_step() for _ in range(3)][-1]
    assert ll2 >= ll1 - 0.05


def test_phseg_constrained_bw():
    """-phsegdir gating (bw/forward.c:223-224 can_prune_phseg): an all-(-1)
    phseg is exactly unconstrained; a real segmentation constrains the
    posterior mass to matching states and can only lower the likelihood;
    rasterization helper covers PhoneSeg lists."""
    import jax.numpy as jnp
    from cmusphinx_tpu.train.bw import phseg_to_frames
    model, feats, trans = _toy_corpus(n_utt=2)
    tr = Trainer(model, PRON, trans, feats, K=2)
    batch = tr.batch
    params = tr.params
    args = (jnp.asarray(params.means), jnp.asarray(params.prec),
            jnp.asarray(params.lnw), jnp.asarray(params.log_tp))
    llh0, acc0 = forward_backward(batch, *args)

    # all -1 == unconstrained, bit-for-bit
    B, Tmax = batch.feats.shape[:2]
    free = np.full((B, Tmax), -1, np.int32)
    llh1, acc1 = forward_backward(batch, *args, phseg=free)
    np.testing.assert_array_equal(np.asarray(llh0), np.asarray(llh1))
    np.testing.assert_array_equal(np.asarray(acc0["mixw"]),
                                  np.asarray(acc1["mixw"]))

    # constrain to the Viterbi alignment's own phone sequence: valid paths
    # remain, llh can only drop (fewer paths), and it stays finite.
    _, states = viterbi_align(batch, *args)
    states = np.asarray(states)
    seg = np.full((B, Tmax), -1, np.int32)
    for b in range(B):
        T = int(batch.T[b])
        seg[b, :T] = batch.state_phone[b][states[b, :T]]
    llh2, acc2 = forward_backward(batch, *args, phseg=seg)
    assert np.all(np.asarray(llh2) <= np.asarray(llh0) + 1e-4)
    assert np.all(np.isfinite(np.asarray(llh2)))

    # an impossible constraint (phone id 99 everywhere) kills all paths
    bad = np.full((B, Tmax), 99, np.int32)
    llh3, _ = forward_backward(batch, *args, phseg=bad)
    assert np.all(np.asarray(llh3) < -1e29)

    # rasterizer
    from cmusphinx_tpu.decode.align import PhoneSeg
    segs = [PhoneSeg("A", 0, 2, "ab", 0), PhoneSeg("B", 3, 5, "ab", 0)]
    v = phseg_to_frames(segs, 8, {"A": 1, "B": 2})
    np.testing.assert_array_equal(v, [1, 1, 1, 2, 2, 2, -1, -1])

#!/usr/bin/env python
"""Train-to-decode validation (AN4-tutorial capability on shipped data):
flat-start CI Baum-Welch training on the 31 shipped tidigits utterances
(sphinx3/model/hmm/tidigits/cepstra + word-dependent phone dictionary),
export the model in Sphinx-3 formats, reload it through the standard model
readers, and decode the training set with the trigram decoder."""

import argparse
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from run_tidigits_fsg import wer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gauss", type=int, default=4)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--lw", type=float, default=6.5)
    ap.add_argument("--wip", type=float, default=0.65)
    ap.add_argument("--silprob", type=float, default=0.005)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cmusphinx_tpu.decode import NgramSearch
    from cmusphinx_tpu.frontend.fe import FE_ARGS
    from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
    from cmusphinx_tpu.models import Mdef, TransitionMatrices
    from cmusphinx_tpu.models.dict import Dictionary
    from cmusphinx_tpu.models.gauden import read_gauden
    from cmusphinx_tpu.models.ngram import NgramModel
    from cmusphinx_tpu.models.sendump import read_mixture_weights
    from cmusphinx_tpu.ops.gmm import ContinuousScorer
    from cmusphinx_tpu.train.model_io import export_model
    from cmusphinx_tpu.train.sentence_hmm import FlatModel
    from cmusphinx_tpu.train.trainer import Trainer
    from cmusphinx_tpu.utils.bio import read_mfc
    from cmusphinx_tpu.utils.config import Config

    R = "/root/reference"
    lsn = {}
    for line in open(R + "/pocketsphinx/test/data/tidigits/tidigits.lsn"):
        p = line.split()
        lsn[p[-1].strip("()")] = [w.lower() for w in p[:-1]]
    pron = {}
    for line in open(R + "/sphinx3/model/hmm/tidigits/dictionary"):
        p = line.split()
        pron[p[0].lower()] = p[1:]
    phones = sorted({ph for ps in pron.values() for ph in ps} | {"SIL"})
    model = FlatModel.create(phones, n_state=3)
    fp = FeatPipeline(Config(FE_ARGS, FEAT_ARGS), feat="1s_c_d_dd")
    feats, trans, utts = [], [], []
    for mfc in sorted(glob.glob(
            R + "/sphinx3/model/hmm/tidigits/cepstra/*/*.mfc")):
        utt = os.path.basename(mfc)[:-4]
        if utt not in lsn:
            continue
        feats.append(np.asarray(fp.compute(read_mfc(mfc))))
        trans.append(lsn[utt])
        utts.append(utt)
    print(f"training: {len(feats)} utts, {sum(len(f) for f in feats)} frames, "
          f"{model.n_sen} senones, {args.gauss} Gaussians")

    t0 = time.time()
    tr = Trainer(model, pron, trans, feats, K=args.gauss)
    hist = tr.train(max_iter=args.iters, conv_ratio=1e-4)
    print(f"EM: {len(hist)} iterations in {time.time() - t0:.1f}s; "
          f"per-frame ll {hist[0]:.3f} -> {hist[-1]:.3f}")
    assert all(b >= a - 1e-3 for a, b in zip(hist, hist[1:])), \
        "likelihood must be non-decreasing"

    # Export + reload through the standard model zoo readers.
    outdir = tempfile.mkdtemp(prefix="tidigits_ci_")
    export_model(outdir, model, tr.params)
    mdef = Mdef.read(outdir + "/mdef")
    g = read_gauden(outdir + "/means", outdir + "/variances")
    lnw = read_mixture_weights(outdir + "/mixture_weights")
    tmat = TransitionMatrices.read(outdir + "/transition_matrices")
    scorer = ContinuousScorer(g, lnw[0].T)
    d = Dictionary(mdef)
    for w, ps in pron.items():
        d.add_word(w, ps)
    d.filler_start = d.n_word
    for w in ("<s>", "</s>", "<sil>"):
        d.add_word(w, ["SIL"])
    d.filler_end = d.n_word - 1
    lm = NgramModel.read(R + "/pocketsphinx/model/lm/en/tidigits.DMP")
    search = NgramSearch(lm, d, mdef, tmat, scorer, lw=args.lw,
                         wip=args.wip, silprob=args.silprob)

    n_ok = n_err = n_ref = 0
    for utt, f in zip(utts, feats):
        hyp = search.decode(f)
        ref = " ".join(lsn[utt]).upper()
        got = hyp.text.upper()
        ok = got == ref
        n_ok += ok
        e, n = wer(ref, got)
        n_err += e
        n_ref += n
        if not ok:
            print(f"  {utt}: {got!r} want {ref!r}")
    print(f"train-set decode: {n_ok}/{len(utts)} sentences, "
          f"WER {100.0 * n_err / n_ref:.2f}%")
    print("model dir:", outdir)
    return 0 if n_ok >= len(utts) - 3 else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Pallas fused-GMM kernel, end-to-end: train -> decode -> verdict.

Trains a CD-tied CONTINUOUS acoustic model on the shipped tidigits data
with the repo's own pipeline (CI -> CD-untied -> decision-tree tying ->
CD-tied -> mixture splitting), sized so the fused Pallas scoring kernel
engages (S*K >= 4096, the ContinuousScorer auto-enable threshold), then:

1. decodes the corpus with the XLA dense scorer and with the Pallas kernel
   and asserts the hypotheses are IDENTICAL;
2. benches both scorer paths and both end-to-end decodes;
3. prints the keep/delete verdict line for EVALS.md.

This closes the round-2/round-3 gap: the kernel is exercised on a real
model on the real decode path, not just unit-tested.  Reference scorer:
sphinx3 cont_mgau.c:1174 mgau_eval (the continuous-density hot loop).
"""

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
    ap.add_argument("--gauss", type=int, default=16)
    ap.add_argument("--nstate", type=int, default=5)
    ap.add_argument("--senones", type=int, default=560)
    ap.add_argument("--repeat", type=int, default=5)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    jax.device_get(jnp.zeros(()))

    from cmusphinx_tpu.decode import NgramSearch
    from cmusphinx_tpu.frontend.fe import FE_ARGS
    from cmusphinx_tpu.frontend.feat import FEAT_ARGS, FeatPipeline
    from cmusphinx_tpu.models import Mdef, TransitionMatrices
    from cmusphinx_tpu.models.dict import Dictionary
    from cmusphinx_tpu.models.gauden import read_gauden
    from cmusphinx_tpu.models.ngram import NgramModel
    from cmusphinx_tpu.models.sendump import read_mixture_weights
    from cmusphinx_tpu.ops.gmm import ContinuousScorer
    from cmusphinx_tpu.train.pipeline import (export_cd_model,
                                              train_full_pipeline)
    from cmusphinx_tpu.train.sentence_hmm import FlatModel
    from cmusphinx_tpu.utils.bio import read_mfc
    from cmusphinx_tpu.utils.config import Config

    import cd_tidigits
    t0 = time.time()
    cd_tidigits.train_and_export("/tmp/tidigits_cd_model",
                                 gauss=args.gauss, nstate=args.nstate,
                                 senones=args.senones)
    p = cd_tidigits.load_decoder_parts("/tmp/tidigits_cd_model")
    mdef, g, lnw2, tmat = p["mdef"], p["gauden"], p["lnw"], p["tmat"]
    lsn, feats, utts = p["lsn"], p["feats"], p["utts"]
    S, K = g.n_mgau, g.n_density
    print(f"CD-tied continuous AM ready: {S} senones x {K} Gaussians "
          f"(S*K = {S*K}) in {time.time()-t0:.0f}s", flush=True)
    assert S * K >= 4096, f"S*K = {S*K} below the Pallas threshold"

    dense = ContinuousScorer(g, lnw2, use_pallas=False)
    fused = ContinuousScorer(g, lnw2, use_pallas=True)
    print(f"fused path active: {fused.use_pallas}")

    # --- scorer-level agreement + bench on the whole corpus ---
    X = jnp.asarray(np.concatenate(feats, 0))
    sd = jax.block_until_ready(dense.score(X))
    sf = jax.block_until_ready(fused.score(X))
    dmax = float(jnp.max(jnp.abs(sd - sf)))
    print(f"scores [T={X.shape[0]}, S={S}]: max |dense - pallas| = "
          f"{dmax:.2e}")

    def bench_x(f, arr):
        jax.block_until_ready(f(arr))
        ts = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            jax.block_until_ready(f(arr))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    def bench(f):
        return bench_x(f, X)

    td, tf = bench(dense.score), bench(fused.score)
    print(f"scorer bench: dense {td:.2f} ms, pallas {tf:.2f} ms "
          f"({td/tf:.2f}x)", flush=True)

    # --- end-to-end decode agreement + bench ---
    d, lm = p["d"], p["lm"]
    audio = sum(f.shape[0] for f in feats) * 0.01
    res = {}
    for name, sc in (("dense", dense), ("pallas", fused)):
        search = NgramSearch(lm, d, mdef, tmat, sc)
        hyps = search.decode_batch(feats)
        t0 = time.time()
        for _ in range(args.repeat):
            hyps = search.decode_batch(feats)
        steady = (time.time() - t0) / args.repeat
        errs = tot = 0
        for utt, h in zip(utts, hyps):
            e, n = wer(" ".join(lsn[utt]).upper(), h.text.upper())
            errs += e
            tot += n
        res[name] = ([h.text for h in hyps], steady, errs, tot)
        print(f"{name}: WER {100.0*errs/tot:.2f}% ({errs}/{tot}), "
              f"steady {steady*1e3:.0f} ms = {audio/steady:.0f}x RT",
              flush=True)

    same = res["dense"][0] == res["pallas"][0]
    print(f"hypotheses identical: {same}")
    assert same, "dense and pallas decodes disagree"
    speedup = res["dense"][1] / res["pallas"][1]
    print(f"VERDICT: scorer {td/tf:.2f}x, end-to-end {speedup:.2f}x "
          f"({'pallas wins' if tf < td else 'dense wins'} at the scorer; "
          f"S*K={S*K}, T={X.shape[0]})")

    # --- reduced-precision serving modes (-gmmprec high / bf16) ---
    # Real trained GMMs have floored variances -> huge prec*mean^2 terms in
    # the expanded-quadratic GEMM form; single-pass bf16 operand rounding
    # (2^-9 relative) turns that cancellation into THOUSANDS of nats of
    # density error, so bf16 must be validated per model, not assumed.
    # Precision.HIGH (3-pass operand splitting, ~2^-19) is the safe fast
    # mode.  This block prints the measured verdict for both.
    for pname in ("high", "bf16"):
        ps = ContinuousScorer(g, lnw2, use_pallas=fused.use_pallas,
                              precision=pname)
        sb = jax.block_until_ready(ps.score(X))
        err_nats = float(jnp.max(jnp.abs(sf - sb)))
        tb = bench(ps.score)
        search = NgramSearch(lm, d, mdef, tmat, ps)
        hyps = search.decode_batch(feats)
        errs = tot = 0
        for utt, h in zip(utts, hyps):
            e, n = wer(" ".join(lsn[utt]).upper(), h.text.upper())
            errs += e
            tot += n
        same_p = res["pallas"][0] == [h.text for h in hyps]
        print(f"gmmprec={pname}: max score err {err_nats:.3f} nats, WER "
              f"{100.0*errs/tot:.2f}% ({errs}/{tot}), scorer {tb:.2f} ms "
              f"({tf/tb:.2f}x over f32 pallas), hypotheses identical to "
              f"f32: {same_p}", flush=True)

    # --- production-scale scorer bench (synthetic params, hub4-class) ---
    from cmusphinx_tpu.models.gauden import GaussianParams
    rng = np.random.RandomState(0)
    for Sp, Kp in ((1024, 16), (5150, 16), (5150, 32)):
        D = 39
        means = rng.randn(Sp, 1, Kp, D).astype(np.float32)
        var = (0.5 + rng.rand(Sp, 1, Kp, D)).astype(np.float32)
        prec = 1.0 / (2.0 * var)
        lrd = -0.5 * (np.log(var).sum(-1)
                      + D * np.log(2.0 * np.pi)).astype(np.float32)
        gp = GaussianParams(means=means, var=var, prec=prec, lrd=lrd,
                            veclen=[D], n_mgau=Sp, n_feat=1, n_density=Kp)
        lw = np.log(np.full((Sp, Kp), 1.0 / Kp, np.float32))
        dn = ContinuousScorer(gp, lw, use_pallas=False)
        pl = ContinuousScorer(gp, lw, use_pallas=True)
        Xs = jnp.asarray(rng.randn(2000, D).astype(np.float32))
        e = float(jnp.max(jnp.abs(dn.score(Xs) - pl.score(Xs))))
        tdn, tpl = bench_x(dn.score, Xs), bench_x(pl.score, Xs)
        print(f"synthetic S={Sp} K={Kp}: dense {tdn:.2f} ms, pallas "
              f"{tpl:.2f} ms ({tdn/tpl:.2f}x), max|diff| {e:.2e}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

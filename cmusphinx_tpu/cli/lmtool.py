"""LM toolkit CLI (cmuclmtk + sphinx_lmtools capability).

Subcommands mirror the reference pipeline programs:

    python -m cmusphinx_tpu.cli.lmtool train -text corpus.txt -lm out.arpa \
        [-n 3] [-discount good_turing] [-top 5000] [-cutoffs 0,0,0]
    python -m cmusphinx_tpu.cli.lmtool convert -i in.arpa -o out.DMP
    python -m cmusphinx_tpu.cli.lmtool eval -lm lm.arpa -text test.txt
    python -m cmusphinx_tpu.cli.lmtool interpolate -lms a.arpa,b.arpa \
        -weights 0.5,0.5 -lm out.arpa

(reference: cmuclmtk text2wfreq/wfreq2vocab/text2idngram/idngram2lm/evallm,
lm_combine/lm_interpolate; sphinxbase sphinx_lm_convert / sphinx_lm_eval)
"""

from __future__ import annotations

import sys

from ..lm.estimate import interpolate, train_lm
from ..models.ngram import NgramModel
from .batch import parse_argv


def _read_corpus(path: str):
    out = []
    for line in open(path, errors="replace"):
        ws = line.split()
        # strip NIST-style (uttid) trailers
        if ws and ws[-1].startswith("(") and ws[-1].endswith(")"):
            ws = ws[:-1]
        if ws:
            out.append(ws)
    return out


def _write_lm(m: NgramModel, path: str) -> None:
    if path.upper().endswith(".DMP"):
        m.write_dmp(path)
    else:
        m.write_arpa(path)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 1
    cmd, kv = argv[0], parse_argv(argv[1:])
    if cmd == "train":
        corpus = _read_corpus(kv["text"])
        cutoffs = ([int(x) for x in kv["cutoffs"].split(",")]
                   if "cutoffs" in kv else None)
        m = train_lm(corpus, n=int(kv.get("n", 3)),
                     discount=kv.get("discount", "good_turing"),
                     top=int(kv.get("top", 0)), cutoffs=cutoffs,
                     use_unk=kv.get("unk", "no") == "yes")
        _write_lm(m, kv["lm"])
        print(f"trained {m.n}-gram LM: counts {m.counts()} -> {kv['lm']}")
    elif cmd == "convert":
        m = NgramModel.read(kv["i"])
        _write_lm(m, kv["o"])
        print(f"converted {kv['i']} -> {kv['o']} (counts {m.counts()})")
    elif cmd == "eval":
        m = NgramModel.read(kv["lm"])
        ppl, n, oov = m.perplexity(_read_corpus(kv["text"]),
                                   use_unk=kv.get("unk", "no") == "yes")
        print(f"perplexity {ppl:.2f} over {n} words ({oov} OOV)")
    elif cmd == "interpolate":
        lms = [NgramModel.read(p) for p in kv["lms"].split(",")]
        ws = [float(x) for x in kv["weights"].split(",")]
        m = interpolate(lms, ws)
        _write_lm(m, kv["lm"])
        print(f"interpolated {len(lms)} LMs -> {kv['lm']} "
              f"(counts {m.counts()})")
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

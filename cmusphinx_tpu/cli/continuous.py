"""Continuous decoder CLI (pocketsphinx_continuous capability, file mode).

Reference: pocketsphinx/src/programs/continuous.c — live decoding with
cont_ad VAD segmentation.  Microphone capture isn't available in this
environment; `-infile` mode (the reference supports it too) segments a long
recording with the VAD and decodes each speech segment:

    python -m cmusphinx_tpu.cli.continuous -hmm DIR -lm LM -dict DICT \
        -infile audio.raw [-platform cpu]
"""

from __future__ import annotations

import sys

import numpy as np

from ..api import DECODER_ARGS, Decoder
from ..frontend.vad import ContAD
from ..utils.config import Arg, Config
from .batch import parse_argv

CONT_ARGS = [
    Arg("infile", str, "", "Audio file to transcribe (16-bit headerless PCM)"),
    Arg("vad_delta", float, 9.0, "Speech onset threshold over noise floor (dB)"),
    Arg("platform", str, "", "Force a JAX platform (e.g. cpu)"),
]


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    kv = parse_argv(argv)
    from ..frontend.fe import FE_ARGS
    from ..frontend.feat import FEAT_ARGS
    from ..decode.ngram_search import NGRAM_ARGS
    cfg = Config(DECODER_ARGS, FE_ARGS, FEAT_ARGS, NGRAM_ARGS).register(CONT_ARGS)
    cfg.update(**kv)
    if str(cfg["platform"]):
        import jax
        jax.config.update("jax_platforms", str(cfg["platform"]))
    if not str(cfg["infile"]):
        raise SystemExit("-infile is required (no audio device in this environment)")
    dec = Decoder(cfg)
    sr = float(cfg["samprate"])
    vad = ContAD(sample_rate=sr, delta=float(cfg["vad_delta"]))
    data = np.frombuffer(open(str(cfg["infile"]), "rb").read(),
                         np.int16).astype(np.float32)
    # Stream in ~250 ms chunks as a live source would.
    chunk = int(sr // 4)
    segs = []
    for i in range(0, len(data), chunk):
        segs.extend(vad.process(data[i : i + chunk]))
    segs.extend(vad.end_stream())
    for k, seg in enumerate(segs):
        dec.start_utt()
        dec.process_raw(seg.data)
        hyp = dec.end_utt()
        t0 = seg.start_sample / sr
        t1 = seg.end_sample / sr
        print(f"[{t0:8.2f} - {t1:8.2f}] {hyp.text}", flush=True)
    if not segs:
        print("(no speech detected)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

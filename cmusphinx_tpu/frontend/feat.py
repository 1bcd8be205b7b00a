"""Dynamic feature computation: cepstra -> feature vectors.

Capability parity with sphinxbase feat (reference:
sphinxbase/src/libsphinxbase/feat/feat.c:852-960 `feat_init` type dispatch,
:726 `feat_1s_c_d_dd_cep2feat`, :772 `feat_1s_c_d_ld_dd_cep2feat`,
:559 `feat_s2_4x_cep2feat`, :623 `feat_s3_1x39_cep2feat`,
:1240 `feat_s2mfc2feat_block_utt` edge padding, :277 `feat_set_subvecs`;
cmn.c:130 batch CMN, cmn_prior.c live CMN, agc.c, lda.c) — reformulated as
batched array programs: the whole utterance's deltas are shifted slices of a
replicate-padded [T+2w, ncep] array, computed in one fused XLA op.

Feature types and layouts (dimension order matters — GMM models are trained
against these exact layouts):

- ``1s_c_d_dd``  (39): [c(13), d(13), dd(13)], window 3
- ``1s_c_d_ld_dd`` (52): [c, d, longd, dd], window 4
- ``s3_1x39``    (39): [c1-12, d1-12, c0 dc0 ddc0, dd1-12], window 3
- ``s2_4x``      (12/24/3/12 in 4 streams), window 4
- ``1s_c``/``cep`` (13): cepstra only, window 0
- ``1s_c_d``     (26): [c, d], window 2
- ``a,b,c...``   : pass-through streams of given widths (feat_copy)

Deltas: d[t] = c[t+2] - c[t-2]; dd[t] = (c[t+3]-c[t-1]) - (c[t+1]-c[t-3]);
long d[t] = c[t+4] - c[t-4].  Edges replicate the first/last frame
(feat_s2mfc2feat_block_utt).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import Arg, Config
from ..utils.bio import S3File

FEAT_ARGS = [
    Arg("feat", str, "1s_c_d_dd", "Feature stream type"),
    Arg("ceplen", int, 13, "Number of components in the input feature vector"),
    Arg("cmn", str, "current", "Cepstral mean normalization scheme (current, prior, none)"),
    Arg("cmninit", str, "8.0", "Initial values (comma-separated) for cepstral mean when 'prior' is used"),
    Arg("varnorm", bool, False, "Variance normalize each utterance"),
    Arg("agc", str, "none", "Automatic gain control for c0 (max, emax, noise, none)"),
    Arg("agcthresh", float, 2.0, "Initial threshold for automatic gain control"),
    Arg("lda", str, "", "File containing transformation (LDA/MLLT) matrix"),
    Arg("ldadim", int, 0, "Dimensionality of output of feature transformation (0 to use entire matrix)"),
    Arg("svspec", str, "", 'Subvector specification, e.g. "24,0-11/25,12-23/26-38"'),
]

FEAT_DCEP_WIN = 2  # reference feat.c:141


def parse_subvecs(spec: str) -> List[List[int]]:
    """Parse an svspec string like ``0-12/13-25/26-38`` or ``24,0-11/25,12-23``
    into per-stream index lists (reference: feat_parse_subvecs feat.c:177)."""
    out: List[List[int]] = []
    for sub in spec.split("/"):
        idxs: List[int] = []
        for part in sub.split(","):
            part = part.strip()
            if not part:
                continue
            m = re.match(r"^(\d+)-(\d+)$", part)
            if m:
                lo, hi = int(m.group(1)), int(m.group(2))
                idxs.extend(range(lo, hi + 1))
            else:
                idxs.append(int(part))
        if idxs:
            out.append(idxs)
    if not out:
        raise ValueError(f"bad subvector spec {spec!r}")
    return out


class FeatPipeline:
    """Cepstra [T, ncep] -> features [T, D] (+ stream structure)."""

    def __init__(self, config: Optional[Config] = None, **kwargs):
        cfg = (config.copy() if config else Config(FEAT_ARGS)).register(FEAT_ARGS)
        cfg.update(**kwargs)
        self.config = cfg
        self.cepsize = int(cfg["ceplen"])
        self.feat_type = str(cfg["feat"]).lower()
        self.cmn_type = str(cfg["cmn"]).lower()
        self.varnorm = bool(cfg["varnorm"])
        self.agc_type = str(cfg["agc"]).lower()
        self._setup_type()

        # LDA/MLLT projection (reference feat/lda.c:61 feat_read_lda).
        self.lda: Optional[np.ndarray] = None
        self.out_dim = self.dim
        lda_path = str(cfg.get("lda") or "")
        if lda_path:
            self.load_lda(lda_path, int(cfg.get("ldadim") or 0))

        # Subvector spec re-slices the (single) output stream.
        sv = str(cfg.get("svspec") or "")
        if sv:
            self.subvecs = parse_subvecs(sv)
            self.stream_lens = [len(s) for s in self.subvecs]
        else:
            self.subvecs = None

        # Live-mode CMN state.
        init = [float(x) for x in str(cfg["cmninit"]).split(",") if x.strip()]
        self._cmn_mean = np.zeros(self.cepsize, np.float32)
        self._cmn_mean[: len(init)] = init[: self.cepsize]
        # Prior-mode CMN primes BOTH the sum and the frame count with the
        # init mean's virtual window (cmn_prior.c:73-75: sum = mean *
        # CMN_WIN; nframe = CMN_WIN).  Priming only the sum inflated the
        # first refreshed mean by ~(1 + 500/T) and wrecked the SECOND
        # streaming utterance of a session (found driving consecutive
        # utterances through the push pipeline).
        self._cmn_sum = self._cmn_mean * 500.0
        self._cmn_nframe = 500
        self._agc_max = 5.0 if self.cmn_type != "none" else 10.0
        self._agc_obs_max = -np.inf
        self._agc_obs_sum = 0.0
        self._agc_obs_utt = 0

    # ------------------------------------------------------------------
    def _setup_type(self) -> None:
        t, n = self.feat_type, self.cepsize
        if t == "s2_4x":
            self.window = 4
            self.stream_lens = [12, 24, 3, 12]
        elif t == "s3_1x39":
            self.window = 3
            self.stream_lens = [39]
        elif t in ("1s_c_d_dd", "1s_12c_12d_3p_12dd"):
            self.window = FEAT_DCEP_WIN + 1
            self.stream_lens = [n * 3]
        elif t == "1s_c_d_ld_dd":
            self.window = FEAT_DCEP_WIN * 2
            self.stream_lens = [n * 4]
        elif t == "1s_c_d":
            self.window = FEAT_DCEP_WIN
            self.stream_lens = [n * 2]
        elif t in ("1s_c", "cep"):
            self.window = 0
            self.stream_lens = [n]
        elif re.match(r"^\d+(,\d+)*$", t):
            self.window = 0
            self.stream_lens = [int(x) for x in t.split(",")]
        else:
            raise ValueError(f"unknown feature type {self.feat_type!r}")
        self.dim = sum(self.stream_lens)

    @property
    def n_streams(self) -> int:
        return len(self.stream_lens)

    def stream_slices(self) -> List[np.ndarray]:
        """Index arrays into the flat feature vector for each stream."""
        if self.subvecs is not None:
            return [np.asarray(s, np.int32) for s in self.subvecs]
        out, pos = [], 0
        for ln in self.stream_lens:
            out.append(np.arange(pos, pos + ln, dtype=np.int32))
            pos += ln
        return out

    # ------------------------------------------------------------------
    def load_lda(self, path: str, ldadim: int = 0) -> None:
        with S3File.open(path) as s3:
            n = int(s3.read_uint32(1)[0])
            rows = int(s3.read_uint32(1)[0])
            cols = int(s3.read_uint32(1)[0])
            mat = s3.read_float32(n * rows * cols).reshape(n, rows, cols)[0]
        if mat.shape[1] != self.dim:
            raise ValueError(f"LDA input dim {mat.shape[1]} != feature dim {self.dim}")
        self.lda = mat.astype(np.float32)
        self.out_dim = ldadim if ldadim > 0 else mat.shape[0]

    # ------------------------------------------------------------------
    # Batch path: to avoid one XLA compile per utterance length (and, on a
    # remote device, one dispatch per op in eager mode), utterances are
    # zero-padded up to a multiple of T_BUCKET and run through ONE jitted
    # masked kernel; `compute_batch` further vmaps it over a whole corpus so
    # feature extraction is a single device call.
    T_BUCKET = 100

    def _padded_kernel(self, cep_pad, T, batch_cmn: bool):
        """[Tp, ncep] zero-padded cepstra + true length T -> [Tp, D] feats.

        Rows >= T of the output replicate the final frame (harmless; callers
        slice [:T]).  Matches feat_s2mfc2feat_block_utt beginutt=endutt=1
        semantics: replicate-pad by the window FIRST, then CMN over the
        padded block of T + 2*window frames (feat_compute_utt includes the
        padding frames in the CMN statistics), AGC, deltas, LDA."""
        w = self.window
        Tp = cep_pad.shape[0]
        # Replicate padding via clamped gather — works for any T <= Tp.
        idx = jnp.clip(jnp.arange(Tp + 2 * w, dtype=jnp.int32) - w, 0, T - 1)
        pad = cep_pad[idx]                                  # [Tp+2w, ncep]
        nvalid = (T + 2 * w).astype(jnp.float32)
        mask = (jnp.arange(Tp + 2 * w) < T + 2 * w)[:, None]
        if self.cmn_type == "current" and batch_cmn:
            mean = jnp.sum(jnp.where(mask, pad, 0.0), axis=0,
                           keepdims=True) / nvalid
            if self.varnorm:
                var = jnp.sum(jnp.where(mask, jnp.square(pad - mean), 0.0),
                              axis=0, keepdims=True) / nvalid
                pad = (pad - mean) / jnp.sqrt(var)
            else:
                pad = pad - mean
        elif self.cmn_type == "prior":
            pad = pad - jnp.asarray(self._cmn_mean)[None, :]
        if self.agc_type == "max":
            c0max = jnp.max(jnp.where(mask[:, 0], pad[:, 0], -jnp.inf))
            pad = pad.at[:, 0].add(-c0max)
        feats = self._dynamic(pad, padded=True)
        if self.lda is not None:
            feats = jnp.dot(feats, jnp.asarray(self.lda[: self.out_dim]).T,
                            precision=jax.lax.Precision.HIGHEST)
        return feats

    def _bucket_fn(self, Tp: int, batch_cmn: bool, batched: bool):
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        key = (Tp, batch_cmn, batched)
        if key not in cache:
            fn = lambda c, T: self._padded_kernel(c, T, batch_cmn)  # noqa: E731
            if batched:
                fn = jax.vmap(fn)
            cache[key] = jax.jit(fn)
        return cache[key]

    def compute(self, cep: np.ndarray, batch_cmn: bool = True) -> np.ndarray:
        """Batch (whole-utterance) path: [T, ncep] -> [T, D]."""
        cep = np.asarray(cep, np.float32)
        T = cep.shape[0]
        Tp = -(-max(T, 1) // self.T_BUCKET) * self.T_BUCKET
        cpad = np.zeros((Tp, cep.shape[1]), np.float32)
        cpad[:T] = cep
        fn = self._bucket_fn(Tp, batch_cmn, batched=False)
        return fn(jnp.asarray(cpad), jnp.int32(T))[:T]

    def compute_batch(self, ceps: Sequence[np.ndarray],
                      batch_cmn: bool = True) -> List[np.ndarray]:
        """Whole-corpus path: list of [T_i, ncep] -> list of [T_i, D] in ONE
        vmapped device call (utterance-level data parallelism, SURVEY §2.10
        P1/P3)."""
        if not len(ceps):
            return []
        Ts = [int(c.shape[0]) for c in ceps]
        Tp = -(-max(max(Ts), 1) // self.T_BUCKET) * self.T_BUCKET
        n = int(ceps[0].shape[1])
        cpad = np.zeros((len(ceps), Tp, n), np.float32)
        for i, c in enumerate(ceps):
            cpad[i, : Ts[i]] = np.asarray(c, np.float32)
        fn = self._bucket_fn(Tp, batch_cmn, batched=True)
        out = np.asarray(fn(jnp.asarray(cpad),
                            jnp.asarray(Ts, dtype=jnp.int32)))
        return [out[i, : Ts[i]] for i in range(len(ceps))]

    def _dynamic(self, cep, padded: bool = False):
        """Compute the configured dynamic feature layout.  `cep` is either the
        raw [T, n] cepstra (padded=False: replicate-pad here) or already
        window-padded [T+2w, n] (padded=True)."""
        w = self.window
        n = self.cepsize
        if w == 0 and self.feat_type not in ("s2_4x", "s3_1x39"):
            return cep
        if padded and w:
            pad = cep
            cep = pad[w:-w]
        else:
            pad = jnp.concatenate([
                jnp.repeat(cep[:1], w, axis=0), cep,
                jnp.repeat(cep[-1:], w, axis=0)
            ])
        T = cep.shape[0]

        def sh(k):  # frame t+k for t in [0, T)
            return jax.lax.dynamic_slice_in_dim(pad, w + k, T, axis=0)

        t = self.feat_type
        if t in ("1s_c_d_dd", "1s_12c_12d_3p_12dd"):
            d = sh(2) - sh(-2)
            dd = (sh(3) - sh(-1)) - (sh(1) - sh(-3))
            return jnp.concatenate([cep, d, dd], axis=1)
        if t == "1s_c_d_ld_dd":
            d = sh(2) - sh(-2)
            ld = sh(4) - sh(-4)
            dd = (sh(3) - sh(-1)) - (sh(1) - sh(-3))
            return jnp.concatenate([cep, d, ld, dd], axis=1)
        if t == "1s_c_d":
            d = sh(2) - sh(-2)
            return jnp.concatenate([cep, d], axis=1)
        if t == "s3_1x39":
            d = sh(2) - sh(-2)
            dd = (sh(3) - sh(-1)) - (sh(1) - sh(-3))
            pow_ = jnp.stack([cep[:, 0], d[:, 0], dd[:, 0]], axis=1)
            return jnp.concatenate([cep[:, 1:], d[:, 1:], pow_, dd[:, 1:]], axis=1)
        if t == "s2_4x":
            d = sh(2) - sh(-2)
            ld = sh(4) - sh(-4)
            dd = (sh(3) - sh(-1)) - (sh(1) - sh(-3))
            pow_ = jnp.stack([cep[:, 0], d[:, 0], dd[:, 0]], axis=1)
            return jnp.concatenate(
                [cep[:, 1:], d[:, 1:], ld[:, 1:], pow_, dd[:, 1:]], axis=1)
        raise ValueError(self.feat_type)

    # ------------------------------------------------------------------
    def compute_live(self, cep: np.ndarray, beginutt: bool, endutt: bool) -> np.ndarray:
        """Live/streaming path with prior CMN and emax AGC (stateful)."""
        cep = self.normalize_live(cep, endutt)
        feats = np.asarray(self._dynamic(jnp.asarray(cep)))
        if self.lda is not None:
            feats = feats @ self.lda[: self.out_dim].T
        return feats

    def normalize_live(self, cep: np.ndarray, endutt: bool) -> np.ndarray:
        """Stateful per-chunk normalization for streaming: prior-mode CMN
        (cmn_prior.c: subtract the running mean, refresh it past CMN_WIN_HWM
        and at utterance end) and AGC on c0.  Shared by compute_live and the
        incremental Decoder streaming path so both see identical CMN/AGC
        state evolution."""
        cep = np.asarray(cep, np.float32).copy()
        # cmn_prior (cmn_prior.c): accumulate raw cepstra, subtract current mean.
        if self.cmn_type != "none":
            self._cmn_sum += cep.sum(axis=0)
            self._cmn_nframe += len(cep)
            cep -= self._cmn_mean
            if self._cmn_nframe > 800:  # CMN_WIN_HWM
                self._cmn_mean = (self._cmn_sum / self._cmn_nframe).astype(np.float32)
                self._cmn_sum *= 500.0 / self._cmn_nframe
                self._cmn_nframe = 500
            elif endutt and self._cmn_nframe > 0:
                self._cmn_mean = (self._cmn_sum / self._cmn_nframe).astype(np.float32)
                if self._cmn_nframe > 800:
                    self._cmn_sum *= 500.0 / self._cmn_nframe
                    self._cmn_nframe = 500
        if self.agc_type in ("emax", "max", "noise") and len(cep):
            self._agc_obs_max = max(self._agc_obs_max, float(cep[:, 0].max()))
            cep[:, 0] -= self._agc_max
            if endutt and np.isfinite(self._agc_obs_max):
                self._agc_obs_sum += self._agc_obs_max
                self._agc_obs_utt += 1
                self._agc_max = self._agc_obs_sum / self._agc_obs_utt
                if self._agc_obs_utt == 8:
                    self._agc_obs_sum /= 2
                    self._agc_obs_utt = 4
                self._agc_obs_max = -np.inf
        return cep

    def split_streams(self, feats) -> List[np.ndarray]:
        """Split a flat [T, D] feature array into per-stream arrays."""
        return [feats[:, idx] for idx in self.stream_slices()]

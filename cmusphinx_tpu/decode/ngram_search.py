"""N-gram (trigram) large-vocabulary decoder: dense flat-lexicon Viterbi.

Capability parity with the pocketsphinx two-pass N-gram search (reference:
pocketsphinx/src/libpocketsphinx/ngram_search_fwdtree.c token-passing pass 1,
ngram_search_fwdflat.c flat-lexicon pass 2, ngram_search.c:360-440 backpointer
table) — redesigned as ONE dense exact pass for TPU (SURVEY.md §7 step 6):

- The reference's lexicon *tree* exists to skip compute on scalar CPUs; on TPU
  the flat lexicon is evaluated densely instead: every word's phone chain is a
  contiguous run of HMM channels, and one batched `hmm_step` updates ALL
  channels' [C, S] scores per frame.  No active lists, no pruning required for
  exactness (optional beam reproduces the reference's behavior).
- The backpointer table becomes a fixed-size device tape in the scan carry:
  E slots per frame (top-E word exits, the analog of -maxwpf absolute
  pruning), each recording (word, score, prev-slot, LM history pair).  The
  per-token payload riding through `hmm_step` is the entry slot id.
- Cross-word LM application follows ngram_search word_transition semantics:
  per frame, entry score of word w = max over this frame's exit slots e of
  exit[e] + lw*P(w | h1[e], h2[e]) + log(wip); fillers instead add
  silpen/fillpen = log(pip)+log(sil/fillprob) (ngram_search.c:118-124) and are
  transparent to the LM history (real_wid semantics).  The [E, V] trigram
  batch resolves on device via DeviceNgram row-wise binary search.
- Trigram history is exact per backpointer (the reference approximates with
  single-best cross-word entries per root channel; we keep single-best per
  (word, frame), i.e. fwdflat-equivalent accuracy, which its second pass
  also settles for).

Cross-word triphone contexts use silence at word boundaries (word-internal
positions get full triphones) — the same approximation as fsg_search.py,
to be upgraded with multiplexed left contexts.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dict import Dictionary
from ..models.dict2pid import Dict2Pid
from ..models.mdef import BAD_SENID, Mdef
from ..models.ngram import NgramModel
from ..models.ngram_device import DeviceNgram
from ..models.tmat import TransitionMatrices
from ..ops.hmm import NEG_INF, hmm_enter, hmm_step
from ..utils.config import Arg, Config
from .fsg_search import Hypothesis, Segment

NGRAM_ARGS = [
    Arg("lw", float, 6.5, "Language model probability weight"),
    Arg("wip", float, 0.65, "Word insertion penalty"),
    Arg("pip", float, 1.0, "Phone insertion penalty"),
    Arg("silprob", float, 0.005, "Silence word transition probability"),
    Arg("fillprob", float, 1e-8, "Filler word transition probability"),
    Arg("beam", float, 1e-48, "Beam width applied to every frame in Viterbi search"),
    Arg("maxwpf", int, 32, "Maximum distinct word exits recorded per frame"),
    Arg("prune", bool, False, "Apply beam pruning (dense search is exact by default)"),
]


class NgramGraph:
    """Host-compiled dense decode graph: flat lexicon x LM vocabulary."""

    def __init__(self, lm: NgramModel, d: Dictionary, mdef: Mdef, d2p: Dict2Pid):
        words: List[int] = []        # dict wids in search
        lmwid: List[int] = []        # LM word id (base), -1 for fillers
        is_fil: List[bool] = []
        # Real words: every dict pronunciation whose base word is in the LM.
        # Fillers: silence + noise words + </s> (decodable, ends the search).
        for wid in range(d.n_word):
            w = d.base_str(wid)
            if w == "<s>":
                continue
            if d.is_filler(wid):
                words.append(wid)
                lmwid.append(-1)
                is_fil.append(True)
            else:
                lw = lm.word_id(w)
                if lw < 0:
                    continue
                words.append(wid)
                lmwid.append(lw)
                is_fil.append(False)
        if not words:
            raise ValueError("no dictionary word occurs in the LM")

        self.dict_wid = np.asarray(words, np.int32)
        self.lmwid = np.asarray(lmwid, np.int32)
        self.is_filler = np.asarray(is_fil, bool)
        self.is_finish = np.asarray(
            [d.base_str(w) == "</s>" for w in words], bool)
        self.word_str = [d.word_str(w) for w in words]
        self.n_word = len(words)

        chan_ssid: List[int] = []
        chan_tmat: List[int] = []
        first: List[int] = []
        last: List[int] = []
        for wid in words:
            ssids = d2p.word_ssids(wid)
            first.append(len(chan_ssid))
            chan_ssid.extend(ssids)
            chan_tmat.extend(d2p.word_tmats(wid))
            last.append(len(chan_ssid) - 1)
        self.first = np.asarray(first, np.int32)
        self.last = np.asarray(last, np.int32)
        self.n_chan = len(chan_ssid)
        S = mdef.max_emit_state
        self.n_emit_state = S

        ssid = np.asarray(chan_ssid, np.int32)
        sen = mdef.sseq[ssid].astype(np.int32)              # [C, S]
        bad = int(np.int32(np.uint16(BAD_SENID)))
        self.sen_valid = sen != bad
        self.sen_idx = np.where(sen == bad, 0, sen)
        self.tmat_idx = np.asarray(chan_tmat, np.int32)

        is_first = np.zeros(self.n_chan, bool)
        is_first[self.first] = True
        self.is_first = is_first
        word_of = np.zeros(self.n_chan, np.int32)
        for k, (f, l) in enumerate(zip(first, last)):
            word_of[f : l + 1] = k
        self.word_of = word_of


class NgramSearch:
    """Trigram flat-lexicon decoder over a senone scorer."""

    def __init__(self, lm: NgramModel, d: Dictionary, mdef: Mdef,
                 tmat: TransitionMatrices, scorer,
                 config: Optional[Config] = None, **kwargs):
        cfg = (config.copy() if config else Config(NGRAM_ARGS)).register(NGRAM_ARGS)
        cfg.update(**kwargs)
        self.config = cfg
        self.lw = float(cfg["lw"])
        self.log_wip = math.log(float(cfg["wip"]))
        log_pip = math.log(float(cfg["pip"]))
        self.log_pip = log_pip
        self.silpen = log_pip + math.log(float(cfg["silprob"]))
        self.fillpen = log_pip + math.log(float(cfg["fillprob"]))
        self.E = int(cfg["maxwpf"])

        self.lm = lm
        self.dict = d
        self.mdef = mdef
        self.scorer = scorer
        g = self.graph = NgramGraph(lm, d, mdef, Dict2Pid(mdef, d))
        self.E = min(self.E, g.n_word)
        self.dlm = DeviceNgram(lm)
        self.start_lmwid = lm.word_id("<s>")
        self.finish_lmwid = lm.word_id("</s>")

        # Device constants.
        self._tp = jnp.asarray(tmat.log_tp[g.tmat_idx])      # [C, S, S+1]
        self._sen_idx = jnp.asarray(g.sen_idx)
        self._sen_valid = jnp.asarray(g.sen_valid)
        self._first = jnp.asarray(g.first)
        self._last = jnp.asarray(g.last)
        self._is_first = jnp.asarray(g.is_first)
        self._word_of = jnp.asarray(g.word_of)
        self._lmwid = jnp.asarray(g.lmwid)
        self._lmwid_c = jnp.asarray(np.maximum(g.lmwid, 0))
        self._is_filler = jnp.asarray(g.is_filler)
        # <sil> gets silpen; other fillers fillpen (ngram_search.c:645-650).
        sil = np.full(g.n_word, self.fillpen, np.float32)
        for k, w in enumerate(g.word_str):
            if w in ("<sil>", "</s>", "<s>"):
                sil[k] = self.silpen
        self._fil_pen = jnp.asarray(sil)
        self._step_fn = jax.jit(self._make_step())

    # ------------------------------------------------------------------
    def _make_step(self):
        g = self.graph
        E, W = self.E, g.n_word
        neg = jnp.float32(NEG_INF)
        lw = jnp.float32(self.lw)
        log_wip = jnp.float32(self.log_wip)
        log_pip = jnp.float32(self.log_pip)
        start_h = jnp.int32(self.start_lmwid)

        def entries_from_exits(vals, ok, h1, h2, slot_ids):
            """Word entry scores [W] + entry bp ids from E exit slots."""
            lmw = self.dlm.score_tg(
                h1[:, None], h2[:, None],
                jnp.broadcast_to(self._lmwid_c[None, :], (E, W)))
            bonus = jnp.where(self._is_filler[None, :],
                              self._fil_pen[None, :],
                              lw * lmw + log_wip)
            cand = jnp.where(ok[:, None], vals[:, None] + bonus, neg)  # [E, W]
            e_best = jnp.argmax(cand, axis=0)                           # [W]
            ent = jnp.take_along_axis(cand, e_best[None], axis=0)[0]
            ebp = slot_ids[e_best]
            return ent, ebp

        def step(carry, inputs):
            alpha0, hist0, tape0 = carry
            tw0, tsc0, tprev0, th20, th10 = tape0
            sen_t, t, valid = inputs
            sen_c = jnp.where(self._sen_valid, sen_t[self._sen_idx], neg)
            alpha, (hist,), ex, (exh,) = hmm_step(alpha0, (hist0,), sen_c, self._tp)

            # Word exits -> top-E tape slots.
            wex = ex[self._last]                                # [W]
            wexh = exh[self._last]
            vals, wsel = jax.lax.top_k(wex, E)
            ok = (vals > neg * 0.5) & valid
            pe = wexh[wsel]                                     # prev slot (-1 = <s>)
            pc = jnp.maximum(pe, 0)
            prev_h2 = jnp.where(pe >= 0, th20[pc], start_h)
            prev_h1 = jnp.where(pe >= 0, th10[pc], -1)
            wl = self._lmwid[wsel]
            fil = self._is_filler[wsel]
            h2 = jnp.where(fil, prev_h2, wl)
            h1 = jnp.where(fil, prev_h1, prev_h2)
            slot_ids = t * E + jnp.arange(E, dtype=jnp.int32)
            tw = jax.lax.dynamic_update_slice(tw0, jnp.where(ok, wsel, -1), (t * E,))
            tsc = jax.lax.dynamic_update_slice(tsc0, jnp.where(ok, vals, neg), (t * E,))
            tprev = jax.lax.dynamic_update_slice(tprev0, pe, (t * E,))
            th2 = jax.lax.dynamic_update_slice(th20, h2, (t * E,))
            th1 = jax.lax.dynamic_update_slice(th10, h1, (t * E,))

            # Word entries (take effect next frame, as in word_transition).
            ent, ebp = entries_from_exits(vals, ok, h1, h2, slot_ids)
            # Within-word chain propagation: channel c gets exit of c-1 + pip.
            chain_ent = jnp.concatenate([jnp.full((1,), neg), ex[:-1] + log_pip])
            chain_bp = jnp.concatenate([jnp.full((1,), -1, jnp.int32), exh[:-1]])
            entry_c = jnp.where(self._is_first, ent[self._word_of], chain_ent)
            entry_b = jnp.where(self._is_first, ebp[self._word_of], chain_bp)
            alpha, (hist,) = hmm_enter(alpha, (hist,), entry_c, (entry_b,))

            # Padded frames are identity.
            alpha = jnp.where(valid, alpha, alpha0)
            hist = jnp.where(valid, hist, hist0)
            return (alpha, hist, (tw, tsc, tprev, th2, th1)), None

        return step

    # ------------------------------------------------------------------
    FRAME_BUCKET = 100

    def decode(self, feats: np.ndarray) -> Hypothesis:
        """feats [T, D] -> best hypothesis."""
        g, E = self.graph, self.E
        T = int(feats.shape[0])
        if T == 0:
            return Hypothesis([], float("-inf"), [])
        Tpad = -(-T // self.FRAME_BUCKET) * self.FRAME_BUCKET
        fpad = np.zeros((Tpad, feats.shape[1]), np.float32)
        fpad[:T] = feats
        scores = self.scorer.score(jnp.asarray(fpad))           # [Tpad, n_sen]
        valid = jnp.arange(Tpad) < T

        # Initial entries with history (<s>,).
        ent0 = np.zeros(g.n_word, np.float32)
        for k in range(g.n_word):
            if g.is_filler[k]:
                ent0[k] = float(np.asarray(self._fil_pen)[k])
            else:
                ent0[k] = self.lw * self.lm.bg_score(
                    self.start_lmwid, int(g.lmwid[k])) + self.log_wip
        alpha = jnp.full((g.n_chan, g.n_emit_state), NEG_INF)
        hist = jnp.full((g.n_chan, g.n_emit_state), -1, jnp.int32)
        entry_c = jnp.where(self._is_first,
                            jnp.asarray(ent0)[self._word_of], NEG_INF)
        entry_b = jnp.full((g.n_chan,), -1, jnp.int32)
        alpha, (hist,) = hmm_enter(alpha, (hist,), entry_c, (entry_b,))

        B = Tpad * E
        tape = (jnp.full((B,), -1, jnp.int32), jnp.full((B,), NEG_INF),
                jnp.full((B,), -1, jnp.int32), jnp.full((B,), -1, jnp.int32),
                jnp.full((B,), -1, jnp.int32))
        (alpha, hist, tape), _ = jax.lax.scan(
            self._step_fn, (alpha, hist, tape),
            (scores, jnp.arange(Tpad, dtype=jnp.int32), valid))
        tw, tsc, tprev, th2, th1 = (np.asarray(a) for a in tape)
        return self._backtrace(tw, tsc, tprev, th2, th1, T)

    # ------------------------------------------------------------------
    def _final_slot(self, tw, tsc, th2, th1, T):
        """Best utterance-final tape slot, preferring a </s> exit at the last
        frame with exits, else best exit + P(</s> | h) (ngram_search_finish
        semantics)."""
        E = self.E
        for t in range(T - 1, -1, -1):
            sl = slice(t * E, t * E + E)
            ws = tw[sl]
            if not (ws >= 0).any():
                continue
            best, best_s = -1, -np.inf
            for e in range(E):
                if ws[e] < 0:
                    continue
                s = tsc[sl][e]
                if not self.graph.is_finish[ws[e]]:
                    s += self.lw * self.lm.tg_score(
                        int(th1[sl][e]), int(th2[sl][e]), self.finish_lmwid)
                if s > best_s:
                    best, best_s = t * E + e, float(s)
            if best >= 0:
                return best, best_s
        return -1, float("-inf")

    def _backtrace(self, tw, tsc, tprev, th2, th1, T) -> Hypothesis:
        slot, score = self._final_slot(tw, tsc, th2, th1, T)
        if slot < 0:
            return Hypothesis([], float("-inf"), [])
        g, E = self.graph, self.E
        segs: List[Segment] = []
        while slot >= 0:
            k = int(tw[slot])
            t = slot // E
            prev = int(tprev[slot])
            start = prev // E + 1 if prev >= 0 else 0
            segs.append(Segment(g.word_str[k], start, t, float(tsc[slot])))
            slot = prev
        segs.reverse()
        words = []
        for s in segs:
            wid = self.dict.wordid(s.word)
            if wid < 0 or not self.dict.is_filler(wid):
                words.append(self.dict.base_str(wid) if wid >= 0 else s.word)
        return Hypothesis(words, score, segs)

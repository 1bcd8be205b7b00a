"""Forced alignment and allphone decoding.

Capability parity with pocketsphinx state_align_search + ps_alignment
(reference: pocketsphinx/src/libpocketsphinx/{state_align_search.c:312,
ps_alignment.c:487} build word->phone->state graph + time-synchronous
Viterbi with per-state backtraces) and the sphinx3 aligner
(sphinx3/src/programs/main_align.c + s3_align.c, -phsegdir/-wdsegdir
outputs) and allphone mode (srch_allphone.c).

Alignment builds a sentence HMM over the *real* acoustic model's triphone
senones (word-internal triphones via Dict2Pid, silence-padded cross-word
contexts), runs a dense Viterbi over frames x states on device, and
backtraces to state/phone/word segmentations.

Allphone decoding is the N-gram decoder over a phone "dictionary" (every CI
phone is a one-phone word), optionally with a phone N-gram LM — the
cross-word variant machinery then models phonotactic triphone contexts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dict import Dictionary
from ..models.dict2pid import Dict2Pid
from ..models.mdef import BAD_SENID, Mdef
from ..models.ngram import NgramModel
from ..models.tmat import TransitionMatrices
from .fsg_search import Hypothesis, Segment

NEG = -1.0e30


@dataclass
class PhoneSeg:
    phone: str
    start_frame: int
    end_frame: int
    word: str
    word_idx: int = -1   # transcript position (-1 = silence)


class AlignSearch:
    """Forced aligner over a senone scorer."""

    def __init__(self, d: Dictionary, mdef: Mdef, tmat: TransitionMatrices,
                 scorer):
        self.dict = d
        self.mdef = mdef
        self.tmat = tmat
        self.scorer = scorer
        self.d2p = Dict2Pid(mdef, d)

    # ------------------------------------------------------------------
    def _build(self, words: Sequence[str], add_sil: bool = True):
        """Sentence HMM over real triphone pids; returns arrays."""
        mdef, d = self.mdef, self.dict
        n = mdef.max_emit_state
        pids: List[int] = []
        pword: List[int] = []   # index into `tokens` (-1 for silence)
        opt: List[bool] = []
        tokens = list(words)
        sil_pid = mdef.sil if mdef.sil >= 0 else 0
        if add_sil:
            pids.append(sil_pid)
            pword.append(-1)
            opt.append(True)
        for wi, w in enumerate(tokens):
            wid = d.wordid(w)
            if wid < 0:
                raise KeyError(f"word {w!r} not in dictionary")
            for pid in self.d2p.word_pids(wid):
                pids.append(pid)
                pword.append(wi)
                opt.append(False)
            if add_sil:
                pids.append(sil_pid)
                pword.append(-1)
                opt.append(True)

        S = len(pids) * n
        state_sen = np.zeros(S, np.int32)
        state_valid = np.ones(S, bool)
        state_phone = np.zeros(S, np.int32)
        state_word = np.full(S, -1, np.int32)
        M = np.full((S, S), NEG, np.float32)
        bad = int(np.uint16(BAD_SENID))
        log_tp = self.tmat.log_tp
        entry_lp = np.full(S, NEG, np.float32)
        sources: List = ["START"]
        finals: List[tuple] = []
        for k, pid in enumerate(pids):
            base = k * n
            ssid = int(self.mdef.phone_ssid[pid])
            tm = int(self.mdef.phone_tmat[pid])
            sen = self.mdef.sseq[ssid]
            for s in range(n):
                state_sen[base + s] = 0 if sen[s] == bad else int(sen[s])
                state_valid[base + s] = sen[s] != bad
                state_phone[base + s] = pid
                state_word[base + s] = pword[k]
            for i in range(n):
                for j in range(i, min(i + 3, n)):
                    M[base + i, base + j] = log_tp[tm, i, j]
            for src in sources:
                if src == "START":
                    entry_lp[base] = 0.0
                else:
                    st, stm, srow = src
                    M[st, base] = log_tp[stm, srow, n]
            new_sources = [(base + n - 1, tm, n - 1)]
            if n >= 2:
                new_sources.append((base + n - 2, tm, n - 2))
            sources = (sources + new_sources) if opt[k] else new_sources
        for src in sources:
            if src != "START":
                finals.append(src)
        fexit = np.full(S, NEG, np.float32)
        for (st, stm, srow) in finals:
            fexit[st] = log_tp[stm, srow, self.tmat.n_state]
        return (state_sen, state_valid, state_phone, state_word,
                M, entry_lp, fexit, tokens, n)

    # ------------------------------------------------------------------
    def align(self, feats: np.ndarray, words: Sequence[str]
              ) -> tuple:
        """Returns (word segments, phone segments, state ids per frame,
        alignment score)."""
        (state_sen, state_valid, state_phone, state_word, M, entry_lp,
         fexit, tokens, n) = self._build(words)
        T = int(feats.shape[0])
        scores = np.asarray(self.scorer.score(jnp.asarray(
            np.asarray(feats, np.float32))))

        ll = np.where(state_valid[None, :], scores[:, state_sen], NEG)
        S = len(state_sen)

        @jax.jit
        def run(ll, M, entry_lp, fexit):
            a0 = entry_lp + ll[0]

            def step(a, llt):
                cand = a[:, None] + M
                nxt = jnp.max(cand, axis=0) + llt
                bp = jnp.argmax(cand, axis=0)
                return jnp.maximum(nxt, NEG), (jnp.maximum(nxt, NEG), bp)

            _, (alphas, bps) = jax.lax.scan(step, a0, ll[1:])
            alpha = jnp.concatenate([a0[None], alphas])
            fin = alpha[-1] + fexit
            return fin, bps

        fin, bps = run(jnp.asarray(ll), jnp.asarray(M),
                       jnp.asarray(entry_lp), jnp.asarray(fexit))
        fin, bps = np.asarray(fin), np.asarray(bps)
        s = int(np.argmax(fin))
        score = float(fin[s])
        states = [s]
        for t in range(T - 2, -1, -1):
            s = int(bps[t, states[-1]])
            states.append(s)
        states.reverse()

        # Segment into phones and words.
        phsegs: List[PhoneSeg] = []
        wsegs: List[Segment] = []
        t0 = 0
        for t in range(1, T + 1):
            changed = t == T or state_phone[states[t]] != state_phone[states[t - 1]] \
                or (t < T and states[t] < states[t - 1] - 2)
            if changed:
                pid = int(state_phone[states[t - 1]])
                wi = int(state_word[states[t - 1]])
                ci = pid if pid < self.mdef.n_ciphone else int(
                    self.mdef.phone_ctx[pid][0])
                phsegs.append(PhoneSeg(self.mdef.ciname[ci], t0, t - 1,
                                       tokens[wi] if wi >= 0 else "<sil>",
                                       wi))
                t0 = t
        # Word segments from phone segments (grouped by transcript index,
        # so repeated words stay distinct).
        cur, ws = None, 0
        for seg in phsegs:
            if seg.word_idx != cur:
                if cur is not None and cur >= 0:
                    wsegs.append(Segment(tokens[cur], ws,
                                         seg.start_frame - 1, 0.0))
                cur, ws = seg.word_idx, seg.start_frame
        if cur is not None and cur >= 0:
            wsegs.append(Segment(tokens[cur], ws, T - 1, 0.0))
        return wsegs, phsegs, states, score


def make_phone_dict(mdef: Mdef) -> Dictionary:
    """Phone dictionary for allphone decoding: every CI phone is a word."""
    d = Dictionary(mdef)
    for ci in range(mdef.n_ciphone):
        name = mdef.ciname[ci]
        if name == "SIL":
            continue
        d.add_word(name, [ci])
    d.filler_start = d.n_word
    for w in ("<s>", "</s>", "<sil>"):
        d.add_word(w, [mdef.sil if mdef.sil >= 0 else 0])
    d.filler_end = d.n_word - 1
    return d


def uniform_phone_lm(mdef: Mdef) -> NgramModel:
    """Uniform unigram phone LM (allphone without -allphone_lm)."""
    m = NgramModel()
    names = [mdef.ciname[ci] for ci in range(mdef.n_ciphone)
             if mdef.ciname[ci] != "SIL"] + ["<s>", "</s>"]
    m.n = 1
    m.words = names
    m.wid = {w: i for i, w in enumerate(names)}
    m.ug_prob = np.full(len(names), -np.log(len(names)), np.float32)
    m.ug_bo = np.zeros(len(names), np.float32)
    m.bg_ptr = np.zeros(len(names) + 1, np.int64)
    return m


def allphone_search(mdef: Mdef, tmat: TransitionMatrices, scorer,
                    lm: Optional[NgramModel] = None, **kwargs):
    """Allphone decoder (sphinx3 mode 1 / pocketsphinx allphone_search)."""
    from .ngram_search import NgramSearch
    d = make_phone_dict(mdef)
    if lm is None:
        lm = uniform_phone_lm(mdef)
    return NgramSearch(lm, d, mdef, tmat, scorer, **kwargs)

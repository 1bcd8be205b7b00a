"""FSG (grammar) decoder: dense time-synchronous Viterbi on TPU.

Capability parity with fsg_search.c / fsg_lextree.c / fsg_history.c
(reference: pocketsphinx/src/libpocketsphinx/fsg_search.c:118-146 beams,
fsg_lextree.c per-transition phone networks with cross-word triphone
contexts, fsg_history.c Viterbi history) — redesigned as a dense tensor
program (SURVEY.md §7 design stance):

- Every grammar link's word is compiled into cross-word triphone variant
  channels (lexgraph.py): left-context variants at the first phone,
  right-context fan-out at the last, (lc, rc) grids for single-phone words.
- Decoding is a `lax.scan` over frames.  Every frame: gather senone scores,
  one batched `hmm_step` over ALL channels, within-word propagation over an
  edge list, per-link right-context exit readout, and link-to-link handoff
  through the epsilon-closed grammar: entry of link k2 = max over links k of
  exit(k, rc = firstphone(k2)) + closure(dst_k, src_k2) + entry_logprob(k2),
  routed into the left-context variant channel matching k's final phone.
- The backpointer "table" is the scan's stacked per-frame output: dense
  [T, K] exit scores + predecessor ids — no dynamic allocation, no host
  sync inside the loop.  Backtrace is a host-side walk.

Exact search (no pruning) is the default: for grammar-sized state spaces the
dense program evaluates everything faster than bookkeeping an active list.

Word insertion penalty and language weight follow the reference semantics:
entry logprob = lw * link_logprob + log(wip); silence/filler self-loops are
added to every state with -silprob/-fillprob (fsg_search.c:293-301).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dict import Dictionary
from ..models.dict2pid import Dict2Pid
from ..models.fsg import FsgModel
from ..models.mdef import Mdef
from ..models.tmat import TransitionMatrices
from ..ops.hmm import NEG_INF, hmm_enter, hmm_step
from ..utils.config import Arg, Config
from .lexgraph import build_word_graph

FSG_ARGS = [
    Arg("lw", float, 6.5, "Language model probability weight"),
    Arg("wip", float, 0.65, "Word insertion penalty"),
    Arg("silprob", float, 0.005, "Silence word transition probability"),
    Arg("fillprob", float, 1e-8, "Filler word transition probability"),
    Arg("beam", float, 1e-48, "Beam width applied to every frame in Viterbi search"),
    Arg("wbeam", float, 7e-29, "Beam width applied to word exits"),
    Arg("prune", bool, False, "Apply beam pruning (dense search is exact by default)"),
]


@dataclass
class Segment:
    word: str
    start_frame: int
    end_frame: int
    score: float


@dataclass
class Hypothesis:
    words: List[str]
    score: float
    segments: List[Segment]

    @property
    def text(self) -> str:
        return " ".join(self.words)


class FsgSearch:
    """Grammar decoder over a senone scorer."""

    def __init__(self, fsg: FsgModel, d: Dictionary, mdef: Mdef,
                 tmat: TransitionMatrices, scorer,
                 config: Optional[Config] = None, **kwargs):
        cfg = (config.copy() if config else Config(FSG_ARGS)).register(FSG_ARGS)
        cfg.update(**kwargs)
        self.config = cfg
        lw = float(cfg["lw"])
        self.lw = lw
        log_wip = math.log(float(cfg["wip"]))
        # Add silence/filler loops and alternate pronunciations, as the
        # reference does at search init (fsg_search.c:290-355).
        silprob = float(cfg["silprob"])
        fillprob = float(cfg["fillprob"])
        fsg.lw = lw
        if silprob > 0 and fsg.word_id("<sil>") < 0 and d.silwid >= 0:
            fsg.add_silence("<sil>", -1, silprob)
            for fwid in range(d.filler_start, d.filler_end + 1):
                w = d.word_str(fwid)
                if w in ("<s>", "</s>", "<sil>"):
                    continue
                if d.basewid[fwid] == fwid:
                    fsg.add_silence(w, -1, fillprob)
        for word in list(fsg.vocab):
            wid = d.wordid(word)
            if wid >= 0:
                for alt in d.alternates(wid):
                    if alt != wid:
                        fsg.add_alt(word, d.word_str(alt))

        self.fsg = fsg
        self.dict = d
        self.mdef = mdef
        self.scorer = scorer
        self.sil_ci = mdef.sil if mdef.sil >= 0 else 0

        # One word instance per grammar link.
        links = list(fsg.word_links())
        wids, src, dst, lp, words = [], [], [], [], []
        for link in links:
            word = fsg.vocab[link.wid]
            wid = d.wordid(word)
            if wid < 0:
                raise KeyError(f"FSG word {word!r} not in dictionary")
            wids.append(wid)
            src.append(link.from_state)
            dst.append(link.to_state)
            lp.append(lw * link.logprob + log_wip)
            words.append(word)
        self.words = words
        self.wids = wids
        self.n_link = K = len(links)
        self.n_state = fsg.n_state
        g = self.graph = build_word_graph(wids, d, mdef, Dict2Pid(mdef, d))
        self.src = np.asarray(src, np.int32)
        self.dst = np.asarray(dst, np.int32)
        self.entry_lp = np.asarray(lp, np.float32)
        self.closure = fsg.null_closure()          # [N, N] lw-scaled, 0 diag

        # Device constants.
        self._tp = jnp.asarray(tmat.log_tp[g.tmat_idx])
        self._sing_sen = jnp.asarray(g.sing_sen)
        self._sing_valid = jnp.asarray(g.sing_valid)
        self._comp_mem = jnp.asarray(g.comp_mem)
        self._comp_valid = jnp.asarray(g.comp_valid)
        self._static_xs = jnp.asarray(g.static_xs)
        self._word_of = jnp.asarray(g.word_of)
        self._is_entry = jnp.asarray(g.is_entry)
        self._lc_row = jnp.asarray(g.lc_row)
        self._lcmap = jnp.asarray(g.lcmap)
        self._exit_tab = jnp.asarray(g.exit_tab)
        self._exit_tab_c = jnp.asarray(np.maximum(g.exit_tab, 0))
        self._rssid = jnp.asarray(g.rssid.astype(np.int32))
        self._prev_chan = jnp.asarray(g.prev_chan)
        self._prev_chan_c = jnp.asarray(np.maximum(g.prev_chan, 0))
        self._firstci = jnp.asarray(g.firstci)
        self._lastci = jnp.asarray(g.lastci)
        # Link-to-link transition weights: W[k, k2] = closure(dst_k, src_k2)
        # + entry_lp[k2]; -inf where no grammar path.
        W = self.closure[self.dst][:, self.src] + self.entry_lp[None, :]
        self._W = jnp.asarray(W.astype(np.float32))
        # Initial entries: start state through closure.
        st0 = self.closure[fsg.start_state]                  # [N]
        ent0 = st0[self.src] + self.entry_lp                 # [K]
        entc0 = np.full(g.n_chan, float(NEG_INF), np.float32)
        entc0[g.is_entry] = ent0[g.word_of[g.is_entry]]
        self._entc0 = jnp.asarray(entc0)
        xs0 = g.static_xs.copy()
        xs0[g.is_entry] = g.lcmap[g.lc_row[g.is_entry], self.sil_ci]
        self._entxs0 = jnp.asarray(xs0)
        # Final weights: exit of link k (rc=SIL) + closure to final state.
        self._finw = np.asarray(
            self.closure[self.dst, fsg.final_state], np.float32)
        self._step_fn = jax.jit(self._make_step())

    # ------------------------------------------------------------------
    def _make_step(self):
        g = self.graph
        K, C, S = self.n_link, g.n_chan, g.n_emit_state
        neg = jnp.float32(NEG_INF)

        def step(carry, inputs):
            alpha0, hist0, xsr0 = carry
            sen_t, t, valid = inputs
            base = jnp.where(self._sing_valid, sen_t[self._sing_sen], neg)
            comp = jnp.where(self._comp_valid,
                             jnp.max(sen_t[self._comp_mem], axis=-1), neg)
            xscores = jnp.concatenate(
                [base[: g.n_sing], comp[: g.n_xs - g.n_sing]], axis=0)
            sen_c = xscores[xsr0, jnp.arange(S)[None, :]]
            alpha, (hist, xsr), ex, (exh, _) = hmm_step(
                alpha0, (hist0, xsr0), sen_c, self._tp)

            if bool(self.config["prune"]):
                bestscr = jnp.max(alpha)
                beam = jnp.float32(math.log(float(self.config["beam"])))
                keep = jnp.max(alpha, axis=1) > bestscr + beam
                alpha = jnp.where(keep[:, None], alpha, neg)

            # Per-link exits with per-rc-variant readout.
            exv = jnp.where(self._exit_tab >= 0,
                            ex[self._exit_tab_c], neg)         # [K, Vr]
            wex = jnp.max(exv, axis=1)                         # [K]
            vwin = jnp.argmax(exv, axis=1)
            wexh = exh[jnp.take_along_axis(
                self._exit_tab_c, vwin[:, None], axis=1)[:, 0]]

            # Link-to-link handoff: A[k, k2] = exit(k, rc=firstci(k2)) + W.
            rcv = self._rssid[:, self._firstci]                # [K, K]
            A = jnp.take_along_axis(exv, rcv, axis=1) + self._W
            bp_id = t * K + jnp.arange(K, dtype=jnp.int32)
            ent = jnp.max(A, axis=0)                           # [K]
            kstar = jnp.argmax(A, axis=0)                      # [K]
            ebp = jnp.where(ent > neg * 0.5, bp_id[kstar], -1)
            lcstar = self._lastci[kstar]                       # [K]

            wo = self._word_of
            ent_c = jnp.where(self._is_entry, ent[wo], neg)
            ent_xs_c = self._lcmap[self._lc_row, lcstar[wo]]
            ebp_c = ebp[wo]

            # Within-word propagation: in-degree <= 1 -> pure gather.
            has_prev = self._prev_chan >= 0
            prop = jnp.where(has_prev, ex[self._prev_chan_c], neg)
            bprop = jnp.where(has_prev, exh[self._prev_chan_c], -1)

            entry_c = jnp.where(self._is_entry, ent_c, prop)
            entry_b = jnp.where(self._is_entry, ebp_c, bprop)
            entry_x = jnp.where(self._is_entry, ent_xs_c, self._static_xs)
            alpha, (hist, xsr) = hmm_enter(alpha, (hist, xsr), entry_c,
                                           (entry_b, entry_x))

            alpha = jnp.where(valid, alpha, alpha0)
            hist = jnp.where(valid, hist, hist0)
            xsr = jnp.where(valid, xsr, xsr0)
            wex = jnp.where(valid, wex, neg)
            wexsil = jnp.where(
                valid,
                jnp.take_along_axis(
                    exv, self._rssid[:, self.sil_ci][:, None], axis=1)[:, 0],
                neg)
            return (alpha, hist, xsr), (wex, wexh, wexsil)

        return step

    # ------------------------------------------------------------------
    FRAME_BUCKET = 100

    def decode(self, feats: np.ndarray) -> Hypothesis:
        """feats [T, D] -> best hypothesis."""
        g = self.graph
        T = int(feats.shape[0])
        if T == 0:
            return Hypothesis([], float("-inf"), [])
        Tpad = -(-T // self.FRAME_BUCKET) * self.FRAME_BUCKET
        fpad = np.zeros((Tpad, feats.shape[1]), np.float32)
        fpad[:T] = feats
        scores = self.scorer.score(jnp.asarray(fpad))
        valid = jnp.arange(Tpad) < T

        alpha = jnp.full((g.n_chan, g.n_emit_state), NEG_INF)
        hist = jnp.full((g.n_chan, g.n_emit_state), -1, jnp.int32)
        xsr = jnp.broadcast_to(self._static_xs[:, None],
                               (g.n_chan, g.n_emit_state)).astype(jnp.int32)
        alpha, (hist, xsr) = hmm_enter(
            alpha, (hist, xsr), self._entc0,
            (jnp.full((g.n_chan,), -1, jnp.int32), self._entxs0))

        (alpha, hist, xsr), (wex_t, wexh_t, wexsil_t) = jax.lax.scan(
            self._step_fn, (alpha, hist, xsr),
            (scores, jnp.arange(Tpad, dtype=jnp.int32), valid))
        wex_t = np.asarray(wex_t)
        wexh_t = np.asarray(wexh_t)
        wexsil_t = np.asarray(wexsil_t)

        # Final: last-frame exits (rc = SIL) reaching the final state.
        finals = wexsil_t[T - 1] + self._finw
        k = int(np.argmax(finals))
        score = float(finals[k])
        if not np.isfinite(score) or score <= float(NEG_INF) / 2:
            return Hypothesis([], float("-inf"), [])

        K = self.n_link
        segs: List[Segment] = []
        t = T - 1
        while True:
            prev = int(wexh_t[t, k])
            start = (prev // K) + 1 if prev >= 0 else 0
            segs.append(Segment(self.words[k], start, t, float(wex_t[t, k])))
            if prev < 0:
                break
            t, k = prev // K, prev % K
        segs.reverse()
        words = [s.word for s in segs if not self._is_filler_word(s.word)]
        return Hypothesis(words, score, segs)

    def _is_filler_word(self, word: str) -> bool:
        wid = self.dict.wordid(word)
        return wid >= 0 and self.dict.is_filler(wid)

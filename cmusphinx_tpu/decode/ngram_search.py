"""N-gram (trigram) large-vocabulary decoder: dense Viterbi over mpx channels.

Capability parity with the pocketsphinx two-pass N-gram search (reference:
pocketsphinx/src/libpocketsphinx/ngram_search_fwdtree.c token-passing pass 1,
ngram_search_fwdflat.c flat-lexicon pass 2, ngram_search.c:360-440 backpointer
table) and the sphinx3 time-switch-tree decoder
(sphinx3/src/libs3decoder/libsearch/srch_time_switch_tree.c) — redesigned as
ONE dense pass for TPU (SURVEY.md §7 step 6):

- Channels (one HMM each, lexgraph.py) are evaluated densely: one batched
  `hmm_step` updates ALL channels' [C, S] scores per frame.  Left cross-word
  context is *multiplexed*: the senone-sequence id is an int payload riding
  the Viterbi argmax (the reference's mpx hmm ssid switching, hmm.h:155-177),
  so word-begin channels need no per-context fan-out.  Right cross-word
  context is exact fan-out for small vocabularies and sphinx3-style
  composite triphones for large ones (rc_mode, lexgraph.py).
- The backpointer table is a fixed-size device tape in the scan carry:
  E slots per frame (top-E word exits, the analog of -maxwpf absolute
  pruning), each recording (word, score, prev-slot, LM history pair) plus
  per-right-context-variant exit scores — the dense analog of the per-bp
  `bscore_stack` (ngram_search.h:109-126).
- Cross-word LM application follows ngram_search word_transition semantics:
  per frame, entry score of word w = max over this frame's exit slots e of
  exit[e, rssid(e, firstphone(w))] + lw*P(w | h1[e], h2[e]) + log(wip);
  fillers instead add silpen/fillpen = log(pip)+log(sil/fillprob)
  (ngram_search.c:118-124) and are transparent to the LM history (real_wid
  semantics).  Each word takes a single best entry per frame (the
  reference's single-best cross-word approximation).  Trigram scores come
  from a dense [V+1,V+1,V] table for tiny vocabularies or per-slot dense
  rows built by scattering DMP successor lists (DeviceNgram.score_rows) —
  the device analog of the reference's tginfo caches
  (lm/lm3g_templates.c:46-260).
- Trigram history is exact per backpointer; like the reference we keep a
  single history per (word, frame) — its rc score stack shares the best
  path's history (ngram_search_save_bp semantics).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dict import Dictionary
from ..models.dict2pid import Dict2Pid
from ..models.mdef import Mdef
from ..models.ngram import NgramModel
from ..models.ngram_device import DeviceNgram
from ..models.tmat import TransitionMatrices
from ..ops.hmm import NEG_INF, hmm_enter, hmm_step
from ..utils.config import Arg, Config
from .fsg_search import Hypothesis, Segment
from .lexgraph import WordGraph, build_word_graph

NGRAM_ARGS = [
    Arg("lw", float, 6.5, "Language model probability weight"),
    Arg("wip", float, 0.65, "Word insertion penalty"),
    Arg("pip", float, 1.0, "Phone insertion penalty"),
    Arg("silprob", float, 0.005, "Silence word transition probability"),
    Arg("fillprob", float, 1e-8, "Filler word transition probability"),
    Arg("beam", float, 1e-48, "Beam width applied to every frame in Viterbi search"),
    Arg("wbeam", float, 7e-29, "Beam width applied to word exits"),
    Arg("maxwpf", int, 32, "Maximum distinct word exits recorded per frame"),
    Arg("pl_window", int, 0,
        "Phone-loop lookahead window in frames (0 = off).  When set, a "
        "CI-phone loop evaluated over the next pl_window frames tightens "
        "the channel beam (phone_loop_search capability consulted by the "
        "main search, ngram_search_fwdtree.c:1390-1420)"),
    Arg("pl_weight", float, 3.0, "Weight on phone-loop lookahead penalties"),
    Arg("rcmode", str, "auto",
        "Cross-word right-context handling: 'fanout' (exact per-context "
        "word-final channels, pocketsphinx alloc_all_rc) or 'composite' "
        "(sphinx3 composite triphones, scalable to large vocabularies); "
        "'auto' picks fanout below 1000 words"),
    Arg("bestpath", bool, False,
        "Run lattice trigram rescoring after Viterbi (ps -bestpath)"),
    Arg("bestpathlw", float, 9.5, "Language weight for bestpath rescoring"),
    Arg("ascale", float, 20.0, "Inverse acoustic scale for lattice posteriors"),
    Arg("prune", bool, True,
        "Apply beam pruning.  Matches the reference's behavior: the beams act "
        "as a path-stability prior, not just a speed knob — marginal "
        "minimum-duration word insertions die at the beam as they do in the "
        "reference (ngram_search_fwdtree.c prune_channels/save_bp)"),
]


class NgramVocab:
    """Search vocabulary: dict words in the LM + fillers, with LM ids."""

    def __init__(self, lm: NgramModel, d: Dictionary):
        words: List[int] = []
        lmwid: List[int] = []
        is_fil: List[bool] = []
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
        self.is_finish = np.asarray([d.base_str(w) == "</s>" for w in words], bool)
        self.word_str = [d.word_str(w) for w in words]
        self.n_word = len(words)


class NgramSearch:
    """Trigram decoder over a senone scorer."""

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
        self.prune = bool(cfg["prune"])
        self.log_beam = math.log(float(cfg["beam"]))
        self.log_wbeam = math.log(float(cfg["wbeam"]))

        self.lm = lm
        self.dict = d
        self.mdef = mdef
        self.scorer = scorer
        self.vocab = v = NgramVocab(lm, d)
        rc_mode = str(cfg["rcmode"])
        if rc_mode == "auto":
            rc_mode = "fanout" if v.n_word < 1000 else "composite"
        self.rc_mode = rc_mode
        g = self.graph = build_word_graph(v.dict_wid, d, mdef,
                                          Dict2Pid(mdef, d), rc_mode=rc_mode)
        self.E = min(self.E, v.n_word)
        self.dlm = DeviceNgram(lm)
        self.start_lmwid = lm.word_id("<s>")
        self.finish_lmwid = lm.word_id("</s>")
        self.sil_ci = mdef.sil if mdef.sil >= 0 else 0

        # Device constants.
        self._tp = jnp.asarray(tmat.log_tp[g.tmat_idx])      # [C, S, S+1]
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
        self._ci_of = jnp.asarray(g.ci_of)
        # Phone-loop lookahead tables: each CI phone's senone row.
        self.pl_window = int(cfg["pl_window"])
        self.pl_weight = float(cfg["pl_weight"])
        ci_sen = mdef.sseq[mdef.phone_ssid[: mdef.n_ciphone]].astype(np.int64)
        bad = int(np.int32(np.uint16(0xFFFF)))
        self._ci_sen = jnp.asarray(np.where(ci_sen == bad, 0, ci_sen))
        self._ci_sen_valid = jnp.asarray(ci_sen != bad)
        self._firstci = jnp.asarray(g.firstci)
        self._lastci = jnp.asarray(g.lastci)
        self._lmwid = jnp.asarray(v.lmwid)
        self._lmwid_c = jnp.asarray(np.maximum(v.lmwid, 0))
        self._is_filler = jnp.asarray(v.is_filler)
        # <sil>/<s>/</s> get silpen; other fillers fillpen (ngram_search.c:645-650).
        fp = np.full(v.n_word, self.fillpen, np.float32)
        for k, w in enumerate(v.word_str):
            if w in ("<sil>", "</s>", "<s>"):
                fp[k] = self.silpen
        self._fil_pen = jnp.asarray(fp)
        # Static initial entries with history (<s>,) and silence left context.
        ent0 = np.zeros(v.n_word, np.float32)
        for k in range(v.n_word):
            if v.is_filler[k]:
                ent0[k] = fp[k]
            else:
                ent0[k] = self.lw * self.lm.bg_score(
                    self.start_lmwid, int(v.lmwid[k])) + self.log_wip
        entc0 = np.full((g.n_chan,), float(NEG_INF), np.float32)
        entc0[g.is_entry] = ent0[g.word_of[g.is_entry]]
        self._entc0 = jnp.asarray(entc0)
        # Initial mpx rows: silence left context.
        xs0 = g.static_xs.copy()
        xs0[g.is_entry] = g.lcmap[g.lc_row[g.is_entry], self.sil_ci]
        self._entxs0 = jnp.asarray(xs0)
        self._ent0 = ent0
        self._fil_pen_np = fp
        self._step_fn = jax.jit(self._make_step())
        self._last: Optional[tuple] = None

    # ------------------------------------------------------------------
    def _make_step(self):
        g, v = self.graph, self.vocab
        E, W, C = self.E, v.n_word, g.n_chan
        S, Vr = g.n_emit_state, g.n_rcvar
        neg = jnp.float32(NEG_INF)
        lw = jnp.float32(self.lw)
        log_wip = jnp.float32(self.log_wip)
        log_pip = jnp.float32(self.log_pip)
        start_h = jnp.int32(self.start_lmwid)
        use_rows = self.dlm.tg_dense is None

        def step(carry, inputs):
            alpha0, hist0, xsr0, tape0 = carry
            tw0, tsc0, tprev0, th20, th10, trc0 = tape0
            sen_t, la_t, t, valid = inputs

            # Extended-senone-sequence scores: singleton rows are a direct
            # gather; composite rows (ordered last) gather members and max
            # (composite triphones, lextree.c semantics).  All vectorized
            # gathers — no scatters (they serialize on TPU).
            base = jnp.where(self._sing_valid, sen_t[self._sing_sen], neg)
            comp = jnp.where(self._comp_valid,
                             jnp.max(sen_t[self._comp_mem], axis=-1), neg)
            xscores = jnp.concatenate(
                [base[: g.n_sing], comp[: g.n_xs - g.n_sing]], axis=0)
            sen_c = xscores.reshape(-1)[
                xsr0 * S + jnp.arange(S, dtype=jnp.int32)[None, :]]  # [C, S]

            alpha, (hist, xsr), ex, (exh, _) = hmm_step(
                alpha0, (hist0, xsr0), sen_c, self._tp)

            if self.prune:
                # Channel beam + word-exit beam relative to the frame best
                # (prune_channels / save_bp threshold semantics); with
                # lookahead, channels whose phone is unsupported by the
                # next pl_window frames' CI phone loop are penalized into
                # the beam (phone_loop_search_score consultation).
                bestscr = jnp.max(alpha)
                amax = jnp.max(alpha, axis=1)
                if self.pl_window:
                    amax = amax + la_t[self._ci_of]
                keep = amax > bestscr + jnp.float32(self.log_beam)
                alpha = jnp.where(keep[:, None], alpha, neg)
                ex = jnp.where(ex > bestscr + jnp.float32(self.log_wbeam), ex, neg)

            # ---- word exits: per-variant readout [W, Vr] ----
            exv = jnp.where(self._exit_tab >= 0,
                            ex[self._exit_tab_c], neg)           # [W, Vr]
            wex = jnp.max(exv, axis=1)                           # [W]
            vwin = jnp.argmax(exv, axis=1)                       # [W]
            wexh = exh[jnp.take_along_axis(
                self._exit_tab_c, vwin[:, None], axis=1)[:, 0]]  # [W]

            # ---- top-E word exits -> tape slots ----
            vals, wsel = jax.lax.top_k(wex, E)
            ok = (vals > neg * 0.5) & valid
            slot_rc = exv[wsel]                                  # [E, Vr]
            pe = wexh[wsel]                                      # prev slot (-1 = <s>)
            pc = jnp.maximum(pe, 0)
            prev_h2 = jnp.where(pe >= 0, th20[pc], start_h)
            prev_h1 = jnp.where(pe >= 0, th10[pc], -1)
            wl = self._lmwid[wsel]
            fil = self._is_filler[wsel]
            h2 = jnp.where(fil, prev_h2, wl)
            h1 = jnp.where(fil, prev_h1, prev_h2)
            slot_ids = t * E + jnp.arange(E, dtype=jnp.int32)
            upd = jax.lax.dynamic_update_slice
            tw = upd(tw0, jnp.where(ok, wsel, -1), (t * E,))
            tsc = upd(tsc0, jnp.where(ok, vals, neg), (t * E,))
            tprev = upd(tprev0, pe, (t * E,))
            th2 = upd(th20, h2, (t * E,))
            th1 = upd(th10, h1, (t * E,))
            trc = upd(trc0, jnp.where(ok[:, None], slot_rc, neg), (t * E, 0))

            # ---- word entries (take effect next frame) ----
            if use_rows:
                rows = self.dlm.score_rows(h1, h2)               # [E, Vlm]
                lmw = jnp.take(rows, self._lmwid_c, axis=1)      # [E, W]
            else:
                lmw = self.dlm.score_tg(
                    h1[:, None], h2[:, None],
                    jnp.broadcast_to(self._lmwid_c[None, :], (E, W)))
            bonus = jnp.where(self._is_filler[None, :],
                              self._fil_pen[None, :],
                              lw * lmw + log_wip)                # [E, W]
            # Acoustic part: the exiting word's rc variant serving THIS
            # word's initial CI phone (rssid readout; composite mode has a
            # single variant so this is just the composite exit score).
            if Vr == 1:
                ac = slot_rc                                     # [E, 1]
            else:
                rcv = self._rssid[wsel][:, self._firstci]        # [E, W]
                ac = jnp.take_along_axis(slot_rc, rcv, axis=1)   # [E, W]
            cand = jnp.where(ok[:, None], ac + bonus, neg)
            # Single best entry per word (word_transition semantics).
            ent_w = jnp.max(cand, axis=0)                        # [W]
            estar = jnp.argmax(cand, axis=0)                     # [W]
            has_ent = ent_w > neg * 0.5
            ebp_w = jnp.where(has_ent, slot_ids[estar], -1)
            lcstar = self._lastci[wsel][estar]                   # [W]

            # Entry channel routing: score + mpx xs row by left context.
            wo = self._word_of
            ent_c = jnp.where(self._is_entry, ent_w[wo], neg)
            ent_xs_c = self._lcmap.reshape(-1)[
                self._lc_row * g.n_ci + lcstar[wo]]
            ent_bp_c = ebp_w[wo]

            # ---- within-word propagation: in-degree <= 1 -> pure gather ----
            has_prev = self._prev_chan >= 0
            prop = jnp.where(has_prev, ex[self._prev_chan_c] + log_pip, neg)
            bprop = jnp.where(has_prev, exh[self._prev_chan_c], -1)

            entry_c = jnp.where(self._is_entry, ent_c, prop)
            entry_b = jnp.where(self._is_entry, ent_bp_c, bprop)
            entry_x = jnp.where(self._is_entry, ent_xs_c, self._static_xs)
            alpha, (hist, xsr) = hmm_enter(alpha, (hist, xsr), entry_c,
                                           (entry_b, entry_x))

            # Padded frames are identity.
            alpha = jnp.where(valid, alpha, alpha0)
            hist = jnp.where(valid, hist, hist0)
            xsr = jnp.where(valid, xsr, xsr0)
            return (alpha, hist, xsr, (tw, tsc, tprev, th2, th1, trc)), None

        return step

    # ------------------------------------------------------------------
    FRAME_BUCKET = 100
    # Unrolling the frame scan amortizes per-iteration loop overhead and
    # lets XLA fuse across consecutive frames; the step is latency- (not
    # bandwidth-) bound at small channel counts, so this is nearly free.
    SCAN_UNROLL = 8

    def device_decode(self, feats, valid):
        """Pure device program: padded feats [Tpad, D] + valid mask [Tpad] ->
        backpointer tape arrays.  jit/vmap/shard_map-compatible."""
        g, E = self.graph, self.E
        Tpad = feats.shape[0]
        scores = self.scorer.score(feats)                        # [Tpad, n_sen]
        if self.pl_window:
            # CI phone-loop lookahead: best per-phone frame score relative
            # to the frame best, maxed over the next pl_window frames.
            cis = jnp.where(self._ci_sen_valid[None],
                            scores[:, self._ci_sen],
                            jnp.float32(NEG_INF)).max(-1)        # [T, nci]
            rel = cis - jnp.max(cis, axis=1, keepdims=True)
            shifts = [jnp.concatenate([rel[dt:], jnp.repeat(rel[-1:], dt, 0)])
                      for dt in range(self.pl_window)]
            la = jnp.float32(self.pl_weight) * jnp.stack(shifts).max(0)
        else:
            la = jnp.zeros((Tpad, 1), jnp.float32)
        alpha = jnp.full((g.n_chan, g.n_emit_state), NEG_INF)
        hist = jnp.full((g.n_chan, g.n_emit_state), -1, jnp.int32)
        xsr = jnp.broadcast_to(self._static_xs[:, None],
                               (g.n_chan, g.n_emit_state)).astype(jnp.int32)
        alpha, (hist, xsr) = hmm_enter(
            alpha, (hist, xsr), self._entc0,
            (jnp.full((g.n_chan,), -1, jnp.int32), self._entxs0))
        B = Tpad * E
        tape = (jnp.full((B,), -1, jnp.int32), jnp.full((B,), NEG_INF),
                jnp.full((B,), -1, jnp.int32), jnp.full((B,), -1, jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                jnp.full((B, g.n_rcvar), NEG_INF))
        (alpha, hist, xsr, tape), _ = jax.lax.scan(
            self._step_fn, (alpha, hist, xsr, tape),
            (scores, la, jnp.arange(Tpad, dtype=jnp.int32), valid),
            unroll=self.SCAN_UNROLL)
        return tape

    # ------------------------------------------------------------------
    # Streaming decode: the scan carry lives on device BETWEEN chunks, so
    # audio can be decoded as it arrives with partial hypotheses at any
    # point (ps_process_raw incremental loop, pocketsphinx.c:699-719, and
    # the gst plugin's partial results).
    CHUNK = 50

    def stream_start(self, max_frames: int = 3000) -> dict:
        """Begin a streaming utterance; returns the device-resident state.

        `max_frames` sizes the initial backpointer tape; the tape GROWS
        (doubling) when audio runs past it — long-form streams degrade to
        an occasional reallocation+recompile instead of an error
        (acmod_set_grow semantics, pocketsphinx acmod.c)."""
        g, E = self.graph, self.E
        alpha = jnp.full((g.n_chan, g.n_emit_state), NEG_INF)
        hist = jnp.full((g.n_chan, g.n_emit_state), -1, jnp.int32)
        xsr = jnp.broadcast_to(self._static_xs[:, None],
                               (g.n_chan, g.n_emit_state)).astype(jnp.int32)
        alpha, (hist, xsr) = hmm_enter(
            alpha, (hist, xsr), self._entc0,
            (jnp.full((g.n_chan,), -1, jnp.int32), self._entxs0))
        B = max_frames * E
        tape = (jnp.full((B,), -1, jnp.int32), jnp.full((B,), NEG_INF),
                jnp.full((B,), -1, jnp.int32), jnp.full((B,), -1, jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                jnp.full((B, g.n_rcvar), NEG_INF))
        W = self.pl_window
        if not hasattr(self, "_chunk_fn"):
            def chunk(carry, scores_ext, t0, valid):
                # scores_ext has CHUNK + pl_window frames: the lookahead
                # window of every emitted frame is fully inside the
                # extended block, so streaming lookahead == batch
                # (phone_loop consultation, ngram_search_fwdtree.c:1390).
                ts = t0 + jnp.arange(self.CHUNK, dtype=jnp.int32)
                if W:
                    cis = jnp.where(self._ci_sen_valid[None],
                                    scores_ext[:, self._ci_sen],
                                    jnp.float32(NEG_INF)).max(-1)
                    rel = cis - jnp.max(cis, axis=1, keepdims=True)
                    shifts = [rel[dt : dt + self.CHUNK] for dt in range(W)]
                    la = jnp.float32(self.pl_weight) * jnp.stack(shifts).max(0)
                else:
                    la = jnp.zeros((self.CHUNK, 1), jnp.float32)
                carry, _ = jax.lax.scan(self._step_fn, carry,
                                        (scores_ext[: self.CHUNK], la, ts,
                                         valid))
                return carry
            self._chunk_fn = jax.jit(chunk)
        return {"carry": (alpha, hist, xsr, tape), "t": 0,
                "max_frames": max_frames,
                "pending": np.zeros((0, 0), np.float32)}

    def _ensure_tape(self, state: dict, need_frames: int) -> None:
        """Grow the device tape (doubling) to hold `need_frames` frames."""
        while state["t"] + need_frames > state["max_frames"]:
            E, g = self.E, self.graph
            grow = state["max_frames"] * E  # double
            alpha, hist, xsr, tape = state["carry"]
            tw, tsc, tprev, th2, th1, trc = tape
            tape = (
                jnp.concatenate([tw, jnp.full((grow,), -1, jnp.int32)]),
                jnp.concatenate([tsc, jnp.full((grow,), NEG_INF)]),
                jnp.concatenate([tprev, jnp.full((grow,), -1, jnp.int32)]),
                jnp.concatenate([th2, jnp.full((grow,), -1, jnp.int32)]),
                jnp.concatenate([th1, jnp.full((grow,), -1, jnp.int32)]),
                jnp.concatenate([trc, jnp.full((grow, g.n_rcvar), NEG_INF)]),
            )
            state["carry"] = (alpha, hist, xsr, tape)
            state["max_frames"] *= 2

    def stream_push(self, state: dict, feats: np.ndarray) -> dict:
        """Feed feature frames; full CHUNK quanta are decoded on device,
        the remainder is buffered until the next push or stream_end.
        With pl_window set, the last pl_window frames are additionally
        held back so every decoded frame sees its full lookahead."""
        feats = np.asarray(feats, np.float32)
        W = self.pl_window
        pend = state["pending"]
        buf = feats if pend.size == 0 else np.concatenate([pend, feats])
        n = buf.shape[0]
        k = max(n - W, 0) // self.CHUNK
        for i in range(k):
            chunk = buf[i * self.CHUNK : (i + 1) * self.CHUNK + W]
            self._ensure_tape(state, self.CHUNK)
            scores = self.scorer.score(jnp.asarray(chunk))
            state["carry"] = self._chunk_fn(
                state["carry"], scores, jnp.int32(state["t"]),
                jnp.ones((self.CHUNK,), bool))
            state["t"] += self.CHUNK
        state["pending"] = buf[k * self.CHUNK :]
        return state

    def _stream_flush(self, state: dict) -> int:
        """Decode the buffered remainder (padded, masked).  Returns the
        total number of REAL frames decoded.  Padding replicates the last
        real frame so end-of-stream lookahead matches the batch path's
        repeat-last-frame shifts."""
        pend = state["pending"]
        n = pend.shape[0]
        W = self.pl_window
        while n:
            take = min(n, self.CHUNK)
            blk = pend[:take]
            rest = pend[take:]
            need = self.CHUNK + W
            pad = np.repeat(blk[-1:], need, axis=0)
            pad[:take] = blk
            avail = min(rest.shape[0], need - take)
            if avail:
                pad[take : take + avail] = rest[:avail]
            self._ensure_tape(state, take)
            scores = self.scorer.score(jnp.asarray(pad))
            state["carry"] = self._chunk_fn(
                state["carry"], scores, jnp.int32(state["t"]),
                jnp.arange(self.CHUNK) < take)
            state["t"] += take
            pend = rest
            n = pend.shape[0]
        state["pending"] = np.zeros((0, 0), np.float32)
        return state["t"]

    def stream_partial(self, state: dict) -> Hypothesis:
        """Best hypothesis so far (partial result) — does not disturb the
        stream; the buffered remainder is not included."""
        if state["t"] == 0:
            return Hypothesis([], float("-inf"), [])
        tape = tuple(np.asarray(a) for a in state["carry"][3])
        return self._backtrace(*tape, state["t"])

    def stream_end(self, state: dict) -> Hypothesis:
        """Finish the stream: flush the remainder and return the final
        hypothesis; the lattice is available via get_lattice()."""
        T = self._stream_flush(state)
        tape = tuple(np.asarray(a) for a in state["carry"][3])
        self._last = tape + (T,)
        return self._backtrace(*tape, T)

    def decode(self, feats: np.ndarray,
               bestpath: Optional[bool] = None) -> Hypothesis:
        """feats [T, D] -> best hypothesis.  With bestpath, the Viterbi
        result is rescored over the word lattice at -bestpathlw (the
        reference's third pass, ps_search default pipeline)."""
        T = int(feats.shape[0])
        if T == 0:
            return Hypothesis([], float("-inf"), [])
        Tpad = -(-T // self.FRAME_BUCKET) * self.FRAME_BUCKET
        fpad = np.zeros((Tpad, feats.shape[1]), np.float32)
        fpad[:T] = feats
        valid = jnp.arange(Tpad) < T
        tape = self.device_decode(jnp.asarray(fpad), valid)
        tape = tuple(np.asarray(a) for a in tape)
        self._last = tape + (T,)
        hyp = self._backtrace(*tape, T)
        if bestpath is None:
            bestpath = bool(self.config["bestpath"])
        if bestpath and hyp.segments:
            lat = self.get_lattice()
            h2 = lat.bestpath(lw=float(self.config["bestpathlw"]),
                              start_lmwid=self.start_lmwid)
            if h2.segments:
                hyp = h2
        return hyp

    def decode_batch(self, feats_list, bestpath: Optional[bool] = None
                     ) -> List[Hypothesis]:
        """Batched decode: all utterances padded to one bucket and run as a
        single vmapped device program — utterance-level data parallelism
        (SURVEY.md §2.10 P1), amortizing device latency and filling the
        chip.  Returns one Hypothesis per utterance."""
        if not feats_list:
            return []
        D = int(feats_list[0].shape[1])
        Ts = [int(f.shape[0]) for f in feats_list]
        if not hasattr(self, "_batch_fn"):
            self._batch_fn = jax.jit(jax.vmap(self.device_decode))
        # ONE bucket: the scan is the serial axis, so total device time is
        # driven by the number of scan steps (sum of per-group Tpad), not by
        # padded-frame count — utterances run in parallel in the vmapped
        # batch axis.  Padding waste only costs senone-scoring FLOPs, which
        # are a minor term.  Split into groups only when padding would more
        # than double the scored frames AND the corpus is long enough for
        # the extra scan launches to amortize.
        Tmax = -(-max(max(Ts), 1) // self.FRAME_BUCKET) * self.FRAME_BUCKET
        pad_frames = Tmax * len(Ts)
        groups: dict = {}
        if pad_frames <= 2 * sum(Ts) or len(Ts) < 8:
            groups[Tmax] = list(range(len(Ts)))
        else:
            for i, T in enumerate(Ts):
                Tpad = -(-max(T, 1) // self.FRAME_BUCKET) * self.FRAME_BUCKET
                groups.setdefault(Tpad, []).append(i)
        out: List[Optional[Hypothesis]] = [None] * len(feats_list)
        bp = bool(self.config["bestpath"]) if bestpath is None else bestpath
        for Tpad, idxs in groups.items():
            fpad = np.zeros((len(idxs), Tpad, D), np.float32)
            for r, i in enumerate(idxs):
                fpad[r, : Ts[i]] = feats_list[i]
            valid = np.arange(Tpad)[None, :] < np.asarray(
                [Ts[i] for i in idxs])[:, None]
            tapes = jax.device_get(self._batch_fn(jnp.asarray(fpad),
                                                  jnp.asarray(valid)))
            for r, i in enumerate(idxs):
                tape = tuple(np.asarray(a[r]) for a in tapes)
                self._last = tape + (Ts[i],)
                hyp = self._backtrace(*tape, Ts[i])
                if bp and hyp.segments:
                    h2 = self.get_lattice().bestpath(
                        lw=float(self.config["bestpathlw"]),
                        start_lmwid=self.start_lmwid)
                    if h2.segments:
                        hyp = h2
                out[i] = hyp
        return out

    # ------------------------------------------------------------------
    def _slot_rc_score(self, trc_row: np.ndarray, k: int, ci: int) -> float:
        """Exit score of word k's rc variant serving CI phone ci."""
        return float(trc_row[int(self.graph.rssid[k, ci])])

    def get_lattice(self):
        """Word lattice for the most recent utterance (ps_get_lattice)."""
        from .lattice import LatNode, Lattice
        if self._last is None:
            raise RuntimeError("no utterance decoded yet")
        tw, tsc, tprev, th2, th1, trc, T = self._last
        g, v, E = self.graph, self.vocab, self.E
        nodes = []
        for slot in range(T * E):
            k = int(tw[slot])
            if k < 0:
                continue
            t, prev = slot // E, int(tprev[slot])
            sf = prev // E + 1 if prev >= 0 else 0
            if prev < 0:
                entry = float(self._ent0[k])
            else:
                pk = int(tw[prev])
                base = self._slot_rc_score(trc[prev], pk, int(g.firstci[k]))
                if base <= float(NEG_INF) * 0.5:
                    base = float(tsc[prev])
                if v.is_filler[k]:
                    lmterm = float(self._fil_pen_np[k])
                else:
                    lmterm = self.lw * self.lm.tg_score(
                        int(th1[prev]), int(th2[prev]), int(v.lmwid[k])
                    ) + self.log_wip
                entry = base + lmterm
            # Expand the variant exit vector to a per-CI vector for the
            # lattice's rc readout (rssid decompression).
            rc_vec = trc[slot][g.rssid[k].astype(np.int64)]
            nodes.append(LatNode(
                id=len(nodes), word=v.word_str[k], kidx=k,
                lmwid=int(v.lmwid[k]), is_filler=bool(v.is_filler[k]),
                fil_pen=float(self._fil_pen_np[k]), sf=sf, ef=t,
                vit_score=float(tsc[slot]), rc_score=rc_vec.copy(),
                entry_score=entry))
        return Lattice(nodes, g.firstci, g.lastci, self.lm, self.lw,
                       self.log_wip, self.sil_ci, self.finish_lmwid, T)

    # ------------------------------------------------------------------
    def _final_slot(self, tw, tsc, th2, th1, trc, T):
        """Best utterance-final tape slot at the last frame with exits,
        scored with silence right context + P(</s> | h)
        (ngram_search_finish semantics)."""
        E, v = self.E, self.vocab
        for t in range(T - 1, -1, -1):
            sl = slice(t * E, t * E + E)
            ws = tw[sl]
            if not (ws >= 0).any():
                continue
            best, best_s = -1, -np.inf
            for e in range(E):
                if ws[e] < 0:
                    continue
                s = self._slot_rc_score(trc[sl][e], int(ws[e]), self.sil_ci)
                if not np.isfinite(s) or s <= float(NEG_INF) * 0.5:
                    s = tsc[sl][e]
                if not v.is_finish[ws[e]]:
                    s += self.lw * self.lm.tg_score(
                        int(th1[sl][e]), int(th2[sl][e]), self.finish_lmwid)
                if s > best_s:
                    best, best_s = t * E + e, float(s)
            if best >= 0:
                return best, best_s
        return -1, float("-inf")

    def _backtrace(self, tw, tsc, tprev, th2, th1, trc, T) -> Hypothesis:
        slot, score = self._final_slot(tw, tsc, th2, th1, trc, T)
        if slot < 0:
            return Hypothesis([], float("-inf"), [])
        v, E = self.vocab, self.E
        segs: List[Segment] = []
        while slot >= 0:
            k = int(tw[slot])
            t = slot // E
            prev = int(tprev[slot])
            start = prev // E + 1 if prev >= 0 else 0
            segs.append(Segment(v.word_str[k], start, t, float(tsc[slot])))
            slot = prev
        segs.reverse()
        words = []
        for s in segs:
            wid = self.dict.wordid(s.word)
            if wid < 0 or not self.dict.is_filler(wid):
                words.append(self.dict.base_str(wid) if wid >= 0 else s.word)
        return Hypothesis(words, score, segs)

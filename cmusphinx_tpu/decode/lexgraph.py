"""Cross-word triphone lexicon graph: dense channel DAG for one word list.

Replaces the reference's multiplexed root channels + right-context fan-out
(reference: pocketsphinx/src/libpocketsphinx/ngram_search_fwdtree.c:67-149
mpx root channels, ngram_search.c:534 ngram_search_alloc_all_rc,
dict2pid.h:133-180 ldiph_lc/lrdiph_rc/rssid compressed tables) with explicit
*variant channels*:

- word-begin phone: one channel per distinct left-context senone sequence
  (compressed over all CI left contexts, like ldiph_lc), entered only by
  predecessors whose final CI phone is in the variant's context set;
- word-end phone: one channel per distinct right-context senone sequence
  (like rssid), read out per next-word-initial CI phone;
- single-phone words: left-context classes x right-context variants over the
  full (lc, rc) grid (lrdiph_rc), entered per lc, read out per rc;
- word-internal phones: one channel (full triphone), chained by an explicit
  edge list (a first/last phone may have several variants, so within-word
  propagation is a scatter-max over edges rather than an index shift).

The result is a flat numpy table set that the decoders turn into a dense
per-frame tensor program: every token automatically carries its exact
cross-word context because context variants ARE distinct channels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np

from ..models.dict import Dictionary
from ..models.dict2pid import (WPOS_BEGIN, WPOS_END, WPOS_INTERNAL,
                               WPOS_SINGLE, Dict2Pid)
from ..models.mdef import BAD_SENID, Mdef


@dataclass
class WordGraph:
    n_chan: int
    n_word: int
    n_ci: int
    n_emit_state: int
    # per channel
    sen_idx: np.ndarray        # [C, S] senone ids
    sen_valid: np.ndarray      # [C, S] bool
    tmat_idx: np.ndarray       # [C]
    word_of: np.ndarray        # [C] word index (sorted ascending)
    is_entry: np.ndarray       # [C] bool: word-entry channel
    ent_lc_mask: np.ndarray    # [C, n_ci] bool: entered when predecessor ends in ci
    exit_mask: np.ndarray      # [C, n_ci] bool: word-final, serves right-context ci
    # within-word edges (src exit -> dst entry)
    esrc: np.ndarray           # [Ne]
    edst: np.ndarray           # [Ne]
    # per word
    firstci: np.ndarray        # [W] first CI phone
    lastci: np.ndarray         # [W] last CI phone


def build_word_graph(dict_wids: Sequence[int], d: Dictionary, mdef: Mdef,
                     d2p: Dict2Pid) -> WordGraph:
    nci = mdef.n_ciphone
    ssid_l: List[int] = []
    tmat_l: List[int] = []
    word_l: List[int] = []
    is_entry: List[bool] = []
    ent_rows: List[np.ndarray] = []     # [n_ci] bool per channel
    exit_rows: List[np.ndarray] = []
    esrc: List[int] = []
    edst: List[int] = []
    firstci = np.zeros(len(dict_wids), np.int32)
    lastci = np.zeros(len(dict_wids), np.int32)
    no_ctx = np.zeros(nci, bool)

    def add_chan(k, pid, entry_mask=None, exit_mask_=None):
        c = len(ssid_l)
        ssid_l.append(int(mdef.phone_ssid[pid]))
        tmat_l.append(int(mdef.phone_tmat[pid]))
        word_l.append(k)
        is_entry.append(entry_mask is not None)
        ent_rows.append(no_ctx if entry_mask is None else entry_mask)
        exit_rows.append(no_ctx if exit_mask_ is None else exit_mask_)
        return c

    for k, wid in enumerate(dict_wids):
        phones = d.pron[wid]
        firstci[k] = phones[0]
        lastci[k] = phones[-1]
        if len(phones) == 1:
            b = phones[0]
            # (lc, rc) grid of pids (WPOS_SINGLE falls back to CI when the
            # triphone is missing, e.g. all filler phones).
            grid = np.empty((nci, nci), np.int32)
            for lc in range(nci):
                for rc in range(nci):
                    grid[lc, rc] = d2p._pid(b, lc, rc, WPOS_SINGLE)
            # Left-context classes = unique grid rows.
            rows, lc_class = np.unique(grid, axis=0, return_inverse=True)
            for cls in range(len(rows)):
                lcs = lc_class == cls
                # Right-context variants within the class.
                uniq, inv = np.unique(rows[cls], return_inverse=True)
                for v, pid in enumerate(uniq):
                    add_chan(k, int(pid), entry_mask=lcs, exit_mask_=inv == v)
        else:
            # First phone: lc variants.
            tab = np.array([d2p._pid(phones[0], lc, phones[1], WPOS_BEGIN)
                            for lc in range(nci)], np.int32)
            uniq, inv = np.unique(tab, return_inverse=True)
            prev = [add_chan(k, int(pid), entry_mask=inv == v)
                    for v, pid in enumerate(uniq)]
            # Internal phones.
            for i in range(1, len(phones) - 1):
                pid = d2p._pid(phones[i], phones[i - 1], phones[i + 1],
                               WPOS_INTERNAL)
                c = add_chan(k, pid)
                for p in prev:
                    esrc.append(p)
                    edst.append(c)
                prev = [c]
            # Last phone: rc variants.
            tab = np.array([d2p._pid(phones[-1], phones[-2], rc, WPOS_END)
                            for rc in range(nci)], np.int32)
            uniq, inv = np.unique(tab, return_inverse=True)
            for v, pid in enumerate(uniq):
                c = add_chan(k, int(pid), exit_mask_=inv == v)
                for p in prev:
                    esrc.append(p)
                    edst.append(c)

    S = mdef.max_emit_state
    ssid = np.asarray(ssid_l, np.int32)
    sen = mdef.sseq[ssid].astype(np.int32)
    bad = int(np.int32(np.uint16(BAD_SENID)))
    return WordGraph(
        n_chan=len(ssid_l), n_word=len(dict_wids), n_ci=nci, n_emit_state=S,
        sen_idx=np.where(sen == bad, 0, sen),
        sen_valid=sen != bad,
        tmat_idx=np.asarray(tmat_l, np.int32),
        word_of=np.asarray(word_l, np.int32),
        is_entry=np.asarray(is_entry, bool),
        ent_lc_mask=np.stack(ent_rows) if ent_rows else np.zeros((0, nci), bool),
        exit_mask=np.stack(exit_rows) if exit_rows else np.zeros((0, nci), bool),
        esrc=np.asarray(esrc, np.int32),
        edst=np.asarray(edst, np.int32),
        firstci=firstci, lastci=lastci,
    )

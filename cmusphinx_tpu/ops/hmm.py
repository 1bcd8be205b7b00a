"""Vectorized per-HMM Viterbi step.

Replaces hmm_vit_eval (reference: pocketsphinx/src/libpocketsphinx/hmm.c:
789-825 dispatch, :330-470 unrolled 3/5-state kernels) with one batched
update over N HMMs at once — the decoder evaluates *all* active channels as
a dense [N, S] tensor program per frame.

Semantics (matching the reference exactly):
- emission first: s[j] = alpha[j] + sen[j]
- exit (into the nonemitting final state):
    exit = max(s[S-1] + tp[S-1, S], s[S-2] + tp[S-2, S])
- transitions (Bakis, at most one skip):
    alpha'[j] = max(s[j] + tp[j,j], s[j-1] + tp[j-1,j], s[j-2] + tp[j-2,j])
- integer "history" payloads (backpointer ids, multiplex ssids) ride along
  with the argmax.

Scores are float32 natural-log; NEG_INF plays WORST_SCORE (hmm.h:74).
The kernel is pure and shape-polymorphic over (N, S); under jit it unrolls
to a handful of fused VPU ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Plain numpy scalar: a module-level jnp constant would initialize the JAX
# backend at import time (blocking on the TPU tunnel before the program can
# choose a platform).
NEG_INF = np.float32(-1.0e30)


def hmm_init_state(n: int, n_state: int, n_payload: int = 1):
    """Fresh (inactive) HMM state: scores at NEG_INF, payloads -1."""
    alpha = jnp.full((n, n_state), NEG_INF, jnp.float32)
    payloads = tuple(jnp.full((n, n_state), -1, jnp.int32) for _ in range(n_payload))
    return alpha, payloads


def _band(tp, off: int):
    """tp [N, S, S+1] -> banded vector tp[:, j, j+off] for valid j."""
    S = tp.shape[1]
    j = jnp.arange(S - off) if off > 0 else jnp.arange(S)
    return tp[:, j, j + off]  # [N, S-off]


def hmm_step(alpha, payloads, sen, log_tp,
             ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """One Viterbi frame update for N HMMs.

    alpha:    [N, S] current state scores (emission NOT yet applied)
    payloads: tuple of [N, S] int32 arrays propagated with the argmax
    sen:      [N, S] senone scores for each state (natural log)
    log_tp:   [N, S, S+1] log transition probabilities

    Returns (new_alpha, new_payloads, exit_score [N], exit_payloads tuple of [N]).
    """
    N, S = alpha.shape
    s = alpha + sen  # emission first (hmm.c order)

    # Exit into the nonemitting final state from the last two states.
    e_last = s[:, S - 1] + log_tp[:, S - 1, S]
    if S >= 2:
        e_prev = s[:, S - 2] + log_tp[:, S - 2, S]
        take_last = e_last >= e_prev
        exit_score = jnp.where(take_last, e_last, e_prev)
        exit_payloads = tuple(
            jnp.where(take_last, p[:, S - 1], p[:, S - 2]) for p in payloads)
    else:
        exit_score = e_last
        exit_payloads = tuple(p[:, S - 1] for p in payloads)

    # Candidate scores into each state j.  Selection is a max/where chain,
    # NOT argmax + take_along_axis: gathers serialize on the TPU while
    # compares/selects ride the VPU at full width.  Tie order matches the
    # reference (self loop, then j-1, then j-2 — hmm.c evaluates in that
    # order and keeps the first max).
    d0 = _band(log_tp, 0)                      # [N, S] self loops
    c_self = s + d0
    if S == 1:
        new_alpha = jnp.maximum(c_self, NEG_INF)
        return (new_alpha, payloads, jnp.maximum(exit_score, NEG_INF),
                exit_payloads)

    d1 = _band(log_tp, 1)                      # [N, S-1] j -> j+1
    c_prev = jnp.concatenate(
        [jnp.full((N, 1), NEG_INF), s[:, :-1] + d1], axis=1)
    p_prev = [jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
              for p in payloads]
    if S >= 3:
        d2 = _band(log_tp, 2)                  # [N, S-2] j -> j+2
        c_skip = jnp.concatenate(
            [jnp.full((N, 2), NEG_INF), s[:, :-2] + d2], axis=1)
        p_skip = [jnp.concatenate([p[:, :2], p[:, :-2]], axis=1)
                  for p in payloads]
        m12 = jnp.maximum(c_prev, c_skip)
        new_alpha = jnp.maximum(c_self, m12)
        sel_self = c_self >= m12
        sel_prev = c_prev >= c_skip
        new_payloads = tuple(
            jnp.where(sel_self, p,
                      jnp.where(sel_prev, pp, ps))
            for p, pp, ps in zip(payloads, p_prev, p_skip))
    else:
        new_alpha = jnp.maximum(c_self, c_prev)
        sel_self = c_self >= c_prev
        new_payloads = tuple(
            jnp.where(sel_self, p, pp) for p, pp in zip(payloads, p_prev))
    new_alpha = jnp.maximum(new_alpha, NEG_INF)

    exit_score = jnp.maximum(exit_score, NEG_INF)
    return new_alpha, new_payloads, exit_score, exit_payloads


def hmm_enter(alpha, payloads, entry_score, entry_payloads, active=None):
    """Inject external entry tokens into state 0 (hmm_enter semantics):
    replace alpha[:, 0] where the entry score is better.

    entry_score: [N]; entry_payloads: tuple of [N].
    """
    better = entry_score > alpha[:, 0]
    if active is not None:
        better = better & active
    new_alpha = alpha.at[:, 0].set(jnp.where(better, entry_score, alpha[:, 0]))
    new_payloads = tuple(
        p.at[:, 0].set(jnp.where(better, ep, p[:, 0]))
        for p, ep in zip(payloads, entry_payloads))
    return new_alpha, new_payloads

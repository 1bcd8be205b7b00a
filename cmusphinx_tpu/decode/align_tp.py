"""Time-parallel forced alignment (SURVEY.md §2.10 P6 — sequence/time
parallelism, the one axis the reference has no analog for).

Viterbi is a max-plus linear recurrence: with per-frame operator
A_t[i, j] = M[i, j] + ll_t[j], the alpha recursion is a_t = a_{t-1} (x) A_t
(max-plus vector-matrix product) — ASSOCIATIVE, so time can be split
across chunks/devices like any scan:

1. **Pass 1 (parallel over chunks)**: each chunk reduces its frames to a
   max-plus TRANSFER MATRIX G_c[entry, exit] = best within-chunk path
   score, using the sentence HMM's sparse predecessor structure (Bakis
   bands + phone-entry links) so the matrix recursion costs O(S^2 P) per
   frame, not S^3.
2. **Combine (cheap, sequential over D chunks)**: boundary alpha vectors
   a_c = a_{c-1} (x) G_c; the utterance score is max(a_D + fexit), and a
   backward argmax over the G_c picks the chunk-boundary states.
3. **Pass 2 (parallel over chunks)**: a normal Viterbi scan per chunk,
   constrained to the known entry boundary state, emits backpointers; the
   per-chunk backtraces stitch into the full state path.

Total work ~= (S + 1)x the sequential aligner (pass 1 runs the vector
recurrence from every possible entry state), but wall time is T/D — the
ring/Ulysses-style trade for extreme-length utterances.  With a
`jax.sharding.Mesh`, pass 1/2 shard the chunk axis over devices; without
one they vmap (same program shape, one device).

Exactness: identical path SCORE to AlignSearch.align (ties may pick a
different but equal-scoring path).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1.0e30


def _pred_table(M: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse predecessor view of the sentence-HMM transition matrix:
    tab[j, p] = p-th predecessor state of j, w[j, p] = its log prob."""
    S = M.shape[0]
    preds = [np.nonzero(M[:, j] > NEG / 2)[0] for j in range(S)]
    P = max((len(p) for p in preds), default=1)
    tab = np.zeros((S, P), np.int32)
    w = np.full((S, P), NEG, np.float32)
    for j, ps in enumerate(preds):
        tab[j, : len(ps)] = ps
        w[j, : len(ps)] = M[ps, j]
    return tab, w


def align_time_parallel(aligner, feats: np.ndarray, words: Sequence[str],
                        n_chunks: int = 4, mesh=None):
    """Returns (states [T], score).  `aligner` is a decode.align
    AlignSearch; `mesh` (optional, 1-D) shards the chunk axis."""
    (state_sen, state_valid, state_phone, state_word, M, entry_lp,
     fexit, tokens, n) = aligner._build(list(words))
    T = int(feats.shape[0])
    S = M.shape[0]
    scores = np.asarray(aligner.scorer.score(jnp.asarray(
        np.asarray(feats, np.float32))))
    ll = np.where(state_valid[None, :], scores[:, state_sen], NEG)
    ll = ll.astype(np.float32)

    D = max(1, min(n_chunks, T - 1))
    # Frames 1..T-1 carry operators (frame 0 is the init); pad to D*L.
    nOp = T - 1
    L = -(-nOp // D)
    ll_ops = np.full((D * L, S), 0.0, np.float32)
    ll_ops[:nOp] = ll[1:]
    valid = np.zeros(D * L, bool)
    valid[:nOp] = True
    ll_ops = ll_ops.reshape(D, L, S)
    valid = valid.reshape(D, L)

    tab, w = _pred_table(M)
    tabj = jnp.asarray(tab)
    wj = jnp.asarray(w)
    P = tab.shape[1]

    def transfer(ll_c, val_c):
        """One chunk's max-plus transfer matrix [S, S] (entry x exit)."""
        eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, NEG).astype(jnp.float32)

        def step(C, inp):
            llt, v = inp
            cand = C[:, tabj] + wj[None]            # [S, S, P]
            Cn = jnp.max(cand, axis=-1) + llt[None, :]
            Cn = jnp.maximum(Cn, NEG)
            return jnp.where(v, Cn, C), None

        G, _ = jax.lax.scan(step, eye, (ll_c, val_c))
        return G

    def pass2(ll_c, val_c, a_entry):
        """Constrained Viterbi over one chunk from boundary alphas;
        returns per-frame (alpha, argmax-pred) tables."""
        def step(a, inp):
            llt, v = inp
            cand = a[tabj] + wj                      # [S, P]
            best = jnp.max(cand, axis=-1) + llt
            bp = jnp.take_along_axis(
                tabj, jnp.argmax(cand, axis=-1)[:, None], axis=1)[:, 0]
            best = jnp.maximum(best, NEG)
            a2 = jnp.where(v, best, a)
            bp2 = jnp.where(v, bp, jnp.arange(S))
            return a2, (a2, bp2)

        _, (alphas, bps) = jax.lax.scan(step, a_entry, (ll_c, val_c))
        return alphas, bps

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec
        axis = mesh.axis_names[0]
        sh = NamedSharding(mesh, Pspec(axis))
        ll_d = jax.device_put(jnp.asarray(ll_ops), sh)
        val_d = jax.device_put(jnp.asarray(valid), sh)
        Gs = jax.jit(jax.vmap(transfer),
                     in_shardings=(sh, sh),
                     out_shardings=sh)(ll_d, val_d)
    else:
        Gs = jax.jit(jax.vmap(transfer))(jnp.asarray(ll_ops),
                                         jnp.asarray(valid))
    Gs = np.asarray(Gs)

    # --- combine: boundary alphas + utterance score + boundary states ---
    a = (entry_lp + ll[0]).astype(np.float64)
    bounds = [a]
    for c in range(D):
        a = (a[:, None] + Gs[c]).max(0)
        bounds.append(a)
    fin = bounds[-1] + fexit
    e_last = int(np.argmax(fin))
    score = float(fin[e_last])
    # backward chunk-boundary argmax
    exits = [0] * (D + 1)
    exits[D] = e_last
    for c in range(D - 1, -1, -1):
        exits[c] = int(np.argmax(bounds[c] + Gs[c][:, exits[c + 1]]))

    # --- pass 2: constrained per-chunk scans (parallel) ---
    a_entries = np.full((D, S), NEG, np.float32)
    for c in range(D):
        a_entries[c, exits[c]] = bounds[c][exits[c]]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec
        axis = mesh.axis_names[0]
        sh = NamedSharding(mesh, Pspec(axis))
        alphas, bps = jax.jit(
            jax.vmap(pass2),
            in_shardings=(sh, sh, sh),
            out_shardings=(sh, sh))(ll_d, val_d,
                                    jax.device_put(jnp.asarray(a_entries),
                                                   sh))
    else:
        alphas, bps = jax.jit(jax.vmap(pass2))(
            jnp.asarray(ll_ops), jnp.asarray(valid),
            jnp.asarray(a_entries))
    bps = np.asarray(bps)

    # --- stitch the state path ---
    states = np.zeros(T, np.int64)
    states[0] = exits[0]
    t = 1
    for c in range(D):
        nloc = min(L, max(0, nOp - c * L))
        if nloc == 0:
            break
        s = exits[c + 1]
        chain = [s]
        for k in range(nloc - 1, 0, -1):
            s = int(bps[c, k, s])
            chain.append(s)
        chain.reverse()
        states[t : t + nloc] = chain
        t += nloc
    return states, score

"""Pallas TPU kernel: fused continuous-GMM senone scoring.

The continuous-density scorer (reference: sphinx3 cont_mgau.c:1174 mgau_eval;
SphinxTrain gauden.c:1150 gauden_compute) computes, per frame t and senone s,

    score[t, s] = logsumexp_k( const[s,k] + x_t . lin[s,k] - x_t^2 . quad[s,k] )

As plain XLA this materializes the [T, S*K] density matrix in HBM between the
GEMMs and the log-sum-exp — for a production model (S ~ 5-8k senones x K ~
8-32 Gaussians, T ~ 1000 frames) that is hundreds of MB of HBM traffic each
way, and the op is bandwidth-bound.  This kernel tiles (T, S) on a Pallas
grid and reduces each [BT, BS*K] density block to [BT, BS] log-mixture scores
entirely in VMEM: the MXU runs the two density GEMMs, the VPU the exp/log
reduction, and only the [T, S] result ever touches HBM — HBM traffic drops by
~K x (the mixture dimension never leaves the chip).

Layout note: Mosaic cannot shape-cast a [BT, BS*K] vector to [BT, BS, K], so
parameters are packed on host in *mixture-major block layout*: within each
block of BS senones the columns are ordered k*BS + s.  The mixture reduction
is then K static lane-aligned [BT, BS] slices (VPU max/add), no reshape.

Numerics match `ContinuousScorer.score` (ops/gmm.py): f32 densities with
full-precision GEMMs, exp-normalized log-sum-exp over the mixture axis.

On non-TPU backends the kernel runs in Pallas interpret mode (tests) or the
caller falls back to the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large-negative pad for senone slots beyond S (finite: keeps exp/log NaN-free).
_PAD_CONST = -1.0e30
BLOCK_S = 128
BLOCK_T = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_params(lin: np.ndarray, quad: np.ndarray, const: np.ndarray,
                n_sen: int, n_density: int, block_s: int = BLOCK_S,
                dtype=None):
    """Host-side packing: [D, S*K] senone-major -> [D, Sp*K] mixture-major
    block layout (column j*BS*K + k*BS + s for senone j*BS+s, mixture k),
    with S padded to a block multiple (padded const = large negative).
    `dtype=bfloat16` stores lin/quad in bf16 for the single-pass serving
    mode (const stays f32 — it carries the log normalizer's full range)."""
    S, K = n_sen, n_density
    D = lin.shape[0]
    pt = np.float32 if dtype is None else np.dtype(dtype)
    bs = min(block_s, _round_up(S, 8))
    Sp = _round_up(S, bs)
    lin_p = np.zeros((D, Sp * K), pt)
    quad_p = np.zeros((D, Sp * K), pt)
    const_p = np.full((Sp * K,), _PAD_CONST, np.float32)
    src = np.arange(S * K)
    s, k = src // K, src % K
    dst = (s // bs) * bs * K + k * bs + (s % bs)
    lin_p[:, dst] = np.asarray(lin, np.float32).astype(pt)
    quad_p[:, dst] = np.asarray(quad, np.float32).astype(pt)
    const_p[dst] = np.asarray(const, np.float32)
    return lin_p, quad_p, const_p.reshape(1, Sp * K), bs


def _kernel(x_ref, lin_ref, quad_ref, const_ref, out_ref, *, bs: int, k: int,
            precision: str = "highest"):
    x = x_ref[:]                                           # [BT, D]
    if precision == "bf16":
        # Serving mode: bf16 params (halved VMEM/HBM) + ONE MXU pass per
        # GEMM with f32 accumulation; x squared in f32, then rounded.
        ll = (const_ref[:]
              + jnp.dot(x.astype(jnp.bfloat16), lin_ref[:],
                        preferred_element_type=jnp.float32)
              - jnp.dot((x * x).astype(jnp.bfloat16), quad_ref[:],
                        preferred_element_type=jnp.float32))
    elif precision == "high":
        # bf16x3 middle ground (~2^-19 operand precision at half HIGHEST's
        # MXU passes).  Mosaic rejects Precision.HIGH, so split operands
        # into bf16 hi+lo by hand: a.b ~= ah.bh + ah.bl + al.bh.
        def split(a):
            hi = a.astype(jnp.bfloat16)
            return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot3(a, b):
            ah, al = split(a)
            bh, bl = split(b)
            f32 = jnp.float32
            return (jnp.dot(ah, bh, preferred_element_type=f32)
                    + jnp.dot(ah, bl, preferred_element_type=f32)
                    + jnp.dot(al, bh, preferred_element_type=f32))

        ll = const_ref[:] + dot3(x, lin_ref[:]) - dot3(x * x, quad_ref[:])
    else:
        # Full f32 GEMMs: log densities are numerically sensitive (see
        # ops/gmm.py HIGHEST rationale) — default MXU bf16 passes cost
        # ~0.1-0.3 nats.
        hi = jax.lax.Precision.HIGHEST
        ll = (const_ref[:]                                 # [1, BS*K]
              + jnp.dot(x, lin_ref[:], preferred_element_type=jnp.float32,
                        precision=hi)
              - jnp.dot(x * x, quad_ref[:],
                        preferred_element_type=jnp.float32, precision=hi))
    # Mixture log-sum-exp over K lane-aligned [BT, BS] column groups.
    m = ll[:, 0:bs]
    for j in range(1, k):
        m = jnp.maximum(m, ll[:, j * bs : (j + 1) * bs])
    acc = jnp.exp(ll[:, 0:bs] - m)
    for j in range(1, k):
        acc = acc + jnp.exp(ll[:, j * bs : (j + 1) * bs] - m)
    out_ref[:] = m + jnp.log(acc)


@functools.partial(jax.jit, static_argnames=(
    "n_sen", "n_density", "block_s", "block_t", "interpret", "precision"))
def fused_mixture_scores_packed(x, lin_p, quad_p, const_p, *, n_sen: int,
                                n_density: int, block_s: int,
                                block_t: int = BLOCK_T,
                                interpret: bool = False,
                                precision: str = "highest"):
    """x [T, D] + pack_params outputs -> [T, n_sen] log mixture scores."""
    T, D = x.shape
    K, bs = n_density, block_s
    SpK = lin_p.shape[1]
    Sp = SpK // K
    if T == 0:  # empty feature batch: match the XLA path's behavior
        return jnp.zeros((0, n_sen), jnp.float32)
    bt = min(block_t, _round_up(T, 8))
    Tp = _round_up(T, bt)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, bs=bs, k=K, precision=precision),
        grid=(Tp // bt, Sp // bs),
        in_specs=[
            pl.BlockSpec((bt, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bs * K), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bs * K), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs * K), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bs), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Sp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * Tp * D * Sp * K,
            bytes_accessed=(Tp * D + Tp * Sp) * 4
            + 2 * D * Sp * K * lin_p.dtype.itemsize,
            transcendentals=Tp * Sp * (K + 1),
        ),
        interpret=interpret,
    )(x, lin_p, quad_p, const_p)
    return out[:T, :n_sen]


def fused_mixture_scores(x, lin, quad, const, *, n_sen: int, n_density: int,
                         block_t: int = BLOCK_T, block_s: int = BLOCK_S,
                         interpret: bool = False, precision: str = "highest"):
    """Convenience wrapper taking senone-major [D, S*K] params (packs on
    host — prefer pack_params once + fused_mixture_scores_packed in loops)."""
    lin_p, quad_p, const_p, bs = pack_params(
        np.asarray(lin), np.asarray(quad), np.asarray(const),
        n_sen, n_density, block_s,
        dtype=jnp.bfloat16 if precision == "bf16" else None)
    return fused_mixture_scores_packed(
        x, jnp.asarray(lin_p), jnp.asarray(quad_p), jnp.asarray(const_p),
        n_sen=n_sen, n_density=n_density, block_s=bs, block_t=block_t,
        interpret=interpret, precision=precision)


def pallas_available() -> bool:
    """True when the default backend compiles Pallas TPU kernels natively."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False

"""FLOP/byte accounting and MFU (model FLOPs utilization) reporting.

The reference never reports hardware utilization (xRT only, SURVEY §5/§6);
on TPU the judged perf axis is achieved FLOP/s vs peak, so every hot stage
gets an analytic FLOP and HBM-byte count here, and evals/mfu_report.py
divides measured wall time into them (PERF.md "stage | ms | GFLOP | MFU").

Peak numbers (one TPU v5e chip):
- bf16 MXU peak: 197 TFLOP/s (public spec).
- f32 ops on the MXU run as multi-pass bf16 (Precision.HIGHEST ~ 6
  passes); the *effective* f32 matmul peak is ~1/6 of bf16.  MFU is
  reported against the bf16 peak (the honest, conservative denominator)
  with the precision-adjusted utilization alongside.
- HBM bandwidth: 819 GB/s.  Stages whose arithmetic intensity
  (FLOP/byte) is below peak_flops/peak_bw ~ 240 are bandwidth-bound; for
  those the roofline utilization (achieved GB/s / 819) is the meaningful
  number and is reported too.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

V5E_PEAK_BF16 = 197e12      # FLOP/s
V5E_F32_PASSES = 6          # Precision.HIGHEST bf16-pass count
V5E_HBM_BW = 819e9          # bytes/s


# ----------------------------------------------------------------------
# Analytic FLOP counts (multiply-add = 2 FLOPs).

def continuous_gmm_flops(T: int, S: int, K: int, D: int) -> float:
    """ContinuousScorer / Pallas fused kernel: two [T, D] @ [D, S*K]
    GEMMs (linear + quadratic term) + the elementwise square, bias and
    logsumexp reduction (ops/gmm.py ContinuousScorer)."""
    gemm = 2 * 2.0 * T * D * S * K
    elem = T * D + 3.0 * T * S * K   # x*x, add const, exp+max+sum
    return gemm + elem


def continuous_gmm_bytes(T: int, S: int, K: int, D: int,
                         fused: bool) -> float:
    """HBM traffic: params + feats + output; the unfused XLA path also
    round-trips the [T, S*K] density matrix through HBM (the measured
    reason the Pallas kernel wins, EVALS.md)."""
    base = 4.0 * (2 * S * K * D + S * K        # lin/quad + const
                  + 2 * T * D                  # feats + feats^2
                  + T * S)                     # output
    if not fused:
        base += 2 * 4.0 * T * S * K
    return base


def psparity_flops(T: int, n_feat: int, n_density: int,
                   veclens, n_sen: int, topn: int) -> float:
    """Semi-continuous 8-bit parity scorer (ops/gmm.py PsParityScorer):
    per stream a [T, D_s] @ [D_s, n_density] density GEMM, the top-N
    argmax selection, and the senone logadd over topn x n_sen 8-bit
    mixture weights (s2_semi_mgau.c:81-530 capability)."""
    f = 0.0
    for d in veclens:
        f += 2.0 * T * int(d) * n_density      # density GEMM
        f += 4.0 * topn * T * n_density        # topn argmax rounds
        f += 3.0 * T * topn * n_sen            # logadd table stage
    return f


def viterbi_scan_bytes(T: int, C: int, S: int, B: int = 1,
                       planes: int = 2, n_rcvar: int = 1) -> float:
    """HBM traffic model of the dense Viterbi scan: per frame the carry
    planes (alpha + payload, [B, S, C] each) are read+written, the
    pre-expanded senone block is read, and the propagation gathers read
    the exit rows.  4 bytes/element."""
    per_frame = (planes * 2.0 * B * S * C      # carry r/w
                 + B * S * C                   # senone block read
                 + planes * B * C)             # propagation gather reads
    return 4.0 * T * per_frame


def onehot_scan_flops(T: int, tables_elems: float, B: int = 1) -> float:
    """One-hot MXU gathers in the small-graph scan cores: each gathered
    element costs a dot-product row (ngram_search.py _make_core)."""
    return 2.0 * T * B * tables_elems


# ----------------------------------------------------------------------
@dataclass
class Stage:
    name: str
    seconds: float
    flops: float = 0.0
    bytes: float = 0.0
    note: str = ""

    @property
    def mfu(self) -> float:
        return self.flops / max(self.seconds, 1e-12) / V5E_PEAK_BF16

    @property
    def bw_util(self) -> float:
        return self.bytes / max(self.seconds, 1e-12) / V5E_HBM_BW


def report(stages: List[Stage]) -> str:
    """Markdown table: stage | ms | GFLOP | MFU (bf16 peak) |
    f32-pass-adj | GB | HBM util."""
    out = ["| stage | ms | GFLOP | MFU(bf16 peak) | x6 f32-adj | GB | "
           "HBM util |",
           "|---|---|---|---|---|---|---|"]
    for s in stages:
        out.append(
            f"| {s.name} | {s.seconds * 1e3:.2f} | {s.flops / 1e9:.2f} | "
            f"{100 * s.mfu:.2f}% | {100 * s.mfu * V5E_F32_PASSES:.1f}% | "
            f"{s.bytes / 1e9:.2f} | {100 * s.bw_util:.1f}% |"
            + (f" {s.note}" if s.note else ""))
    return "\n".join(out)

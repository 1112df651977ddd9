#!/usr/bin/env python
"""Analytical roofline report for a decode/prefill step.

The TPU replacement for the reference's rocprof roofline workflow
(scripts/profile/rocprof_roofline.txt, plot_roofline_hierarchical.py,
GUIDELINE.md): instead of hardware counters, derive each op's FLOPs and HBM
bytes from the model config and report arithmetic intensity vs the chip's
ridge point, plus the step-level speed-of-light token rate.

Usage: python tools/roofline.py [--model 7b] [--batch 8] [--window 512]
       [--dtype int8|bfloat16|float32] [--measured-tok-s N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hip_llama_tpu.config import ModelConfig

CHIPS = {
    # name: (HBM GB/s, bf16 TFLOP/s, int8 TOPS)
    "v5e": (819e9, 197e12, 394e12),
}

# VMEM <-> VPU/MXU bandwidth per chip. The v5e VPU is 8x128x(8 ALUs) at
# ~940 MHz => ~7.9e12 f32 elem/s loads; usable VMEM streaming bandwidth
# is ~O(10x) HBM. This level answers the reference's HIERARCHICAL
# roofline question (scripts/profile/plot_roofline_hierarchical.py:52+,
# L2/L1 levels from rocprof): once an op's HBM intensity clears the HBM
# ridge, is it then VMEM-bound or compute-bound?
VMEM_BW = {"v5e": 8e12}


def live_kv_fraction(pos0: int, steps: int, window: int,
                     block_k: int = 128) -> float:
    """Mean fraction of the KV window the live-clamped decode attention
    kernel actually streams over a chain at positions pos0..pos0+steps-1
    (dead-block skip: ceil((pos+1)/block_k) blocks per step). This is the
    honest denominator for windowed configs — grading a live-clamped
    kernel against full-window traffic produces >100% fractions (the
    round-4 w2048 "103%" artifact)."""
    tot = 0.0
    for i in range(steps):
        live = min(-(-(pos0 + i + 1) // block_k) * block_k, window)
        tot += live / window
    return tot / steps


def op_table(cfg: ModelConfig, b: int, window: int, wbytes_per: float,
             cache_bytes: int) -> list[tuple[str, float, float]]:
    """Per-decode-step (name, FLOPs, HBM bytes) rows, all layers."""
    c = cfg
    rows = []

    def op(name, flops, bytes_):
        rows.append((name, flops, bytes_))

    L = c.n_layers
    op("qkv+o proj", 2 * b * c.dim * (2 * c.dim + 2 * c.kv_dim) * L,
       (c.dim * (2 * c.dim + 2 * c.kv_dim)) * L * wbytes_per)
    op("ffn w1/w2/w3", 2 * b * 3 * c.dim * c.hidden_dim * L,
       3 * c.dim * c.hidden_dim * L * wbytes_per)
    op("attention", 4 * b * c.n_heads * window * c.head_size * L,
       2 * b * c.n_kv_heads * window * c.head_size * L * cache_bytes)
    op("classifier", 2 * b * c.dim * c.vocab_size, c.dim * c.vocab_size * wbytes_per)
    op("embed+norms", 0, b * c.dim * 4 * (2 * L + 1))
    return rows


def vmem_report(cfg: ModelConfig, b: int, window: int, wbytes_per: float,
                cache_bytes: int, chip: str = "v5e"):
    """Second roofline level (the reference's hierarchical-roofline analog,
    plot_roofline_hierarchical.py): for each op, model the IN-KERNEL VMEM
    traffic and VPU elementwise passes of the SHIPPED kernels and report
    which unit bounds it once its HBM stream is paid. This quantifies the
    round-2..4 finding that the q8 residue 'lives inside the kernels': the
    dequant VPU passes are data-dependent with the MXU dot they feed.

    Kernel models (per weight/KV element):
    - q8 dequant+matmul (ops/quant.py `reshape`): VMEM int8 read + f32
      dequant write/read + bf16 cast write + MXU bf16 read ~= 5 B; VPU
      ~3 elementwise ops (convert, scale-mul, cast).
    - int8-MXU decode attention (ops/attention.py i8mxu): KV int8 feeds
      the MXU directly ~= 1 B VMEM, ~0 VPU passes over KV; q/p quant is
      per-row (negligible at decode shapes).
    """
    bw, flops_bf16, _ = CHIPS[chip]
    vbw = VMEM_BW[chip]
    vpu_rate = vbw  # ~1 elementwise op per streamed element at peak
    L = cfg.n_layers
    w_elems = (
        cfg.dim * (2 * cfg.dim + 2 * cfg.kv_dim) * L
        + 3 * cfg.dim * cfg.hidden_dim * L
        + cfg.dim * cfg.vocab_size
    )
    kv_elems = 2 * b * cfg.n_kv_heads * window * cfg.head_size * L
    rows = [
        # name, flops, hbm_bytes, vmem_bytes, vpu_ops
        ("q8 matmuls", 2 * b * w_elems, w_elems * wbytes_per,
         w_elems * 5.0, w_elems * 3.0),
        ("attention(i8mxu)", 4 * b * cfg.n_heads * window * cfg.head_size * L,
         kv_elems * cache_bytes, kv_elems * 1.0, kv_elems * 0.1),
    ]
    print(f"\n-- VMEM-level roofline ({chip}: VMEM ~{vbw/1e12:.0f} TB/s, "
          f"VPU ~{vpu_rate/1e12:.0f} Gelem/s x1e3) --")
    print(f"{'op':18s} {'HBM ms':>8s} {'VMEM ms':>8s} {'VPU ms':>8s} "
          f"{'MXU ms':>8s} {'bound':>10s}")
    for name, f, hbm_b, vmem_b, vpu_o in rows:
        t = {
            "HBM": hbm_b / bw, "VMEM": vmem_b / vbw,
            "VPU": vpu_o / vpu_rate, "MXU": f / flops_bf16,
        }
        bound = max(t, key=t.get)
        print(f"{name:18s} {t['HBM']*1e3:8.2f} {t['VMEM']*1e3:8.2f} "
              f"{t['VPU']*1e3:8.2f} {t['MXU']*1e3:8.2f} {bound:>10s}")
    print("(in-kernel serialization: the VPU dequant feeds the MXU dot "
          "inside each grid step, so the achievable step time is HBM + a "
          "data-dependent fraction of the VPU column — measured +8-11% at "
          "7B decode, BASELINE.md)")


def report(cfg: ModelConfig, b: int, window: int, wbytes_per: float, cache_bytes: int,
           chip: str = "v5e", measured_tok_s: float | None = None,
           compute_dtype: str = "bfloat16", kv_live_fraction: float = 1.0):
    bw, flops_bf16, _flops_int8 = CHIPS[chip]
    # our int8 kernels dequantize to bf16 before the MXU, so bf16 peak is
    # the honest compute ceiling for int8 weights too; fp32 matmuls run at
    # roughly half the bf16 rate
    if compute_dtype == "float32":
        flops_bf16 = flops_bf16 / 2
    rows = op_table(cfg, b, window, wbytes_per, cache_bytes)
    if kv_live_fraction != 1.0:
        # --clamped: scale the attention row's FLOPs/bytes down to what the
        # live-clamped kernel actually touches at the chain's positions
        rows = [
            (n, f * kv_live_fraction, by * kv_live_fraction)
            if n == "attention" else (n, f, by)
            for n, f, by in rows
        ]
        print(f"clamped KV denominator: live fraction {kv_live_fraction:.3f} "
              f"of the {window}-row window")
    ridge = flops_bf16 / bw
    print(f"chip {chip}: HBM {bw/1e9:.0f} GB/s, {compute_dtype} "
          f"{flops_bf16/1e12:.0f} TF/s, "
          f"ridge AI = {ridge:.0f} flop/byte")
    print(f"{'op':14s} {'GFLOP':>9s} {'MB':>9s} {'AI':>7s} {'bound':>8s} {'SoL us':>8s}")
    tot_f = tot_b = 0.0
    for name, f, by in rows:
        ai = f / by if by else float("inf")
        bound = "compute" if ai > ridge else "memory"
        sol = max(f / flops_bf16, by / bw)
        print(f"{name:14s} {f/1e9:9.2f} {by/1e6:9.1f} {ai:7.1f} {bound:>8s} {sol*1e6:8.1f}")
        tot_f += f
        tot_b += by
    sol_step = max(tot_f / flops_bf16, tot_b / bw)
    sol_tok = b / sol_step
    print(f"{'TOTAL':14s} {tot_f/1e9:9.2f} {tot_b/1e6:9.1f} {tot_f/tot_b:7.1f} "
          f"{'memory' if tot_f/tot_b < ridge else 'compute':>8s} {sol_step*1e6:8.1f}")
    print(f"speed-of-light: {sol_tok:.1f} tok/s at batch {b}, window {window}")
    if measured_tok_s:
        print(f"measured: {measured_tok_s:.1f} tok/s = {measured_tok_s/sol_tok*100:.1f}% of roofline")
    return sol_tok


CONFIGS = {
    "7b": ModelConfig(dim=4096, hidden_dim=11008, n_layers=32, n_heads=32,
                      n_kv_heads=32, vocab_size=32000, seq_len=2048),
    "13b": ModelConfig(dim=5120, hidden_dim=13824, n_layers=40, n_heads=40,
                       n_kv_heads=40, vocab_size=32000, seq_len=2048),
    "110m": ModelConfig(dim=768, hidden_dim=2048, n_layers=12, n_heads=12,
                        n_kv_heads=12, vocab_size=32000, seq_len=1024),
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=list(CONFIGS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--dtype", default="int8", choices=["int8", "bfloat16", "float32"])
    ap.add_argument("--cache-dtype", default="bfloat16",
                    choices=["int8", "bfloat16", "float32"])
    ap.add_argument("--measured-tok-s", type=float, default=None)
    ap.add_argument("--vmem", action="store_true",
                    help="append the VMEM/VPU-level roofline rows (the "
                         "hierarchical-roofline analog)")
    ap.add_argument("--clamped", action="store_true",
                    help="use the live-clamped KV denominator for the bench "
                         "decode chain (pos0=window/2, --steps steps) instead "
                         "of full-window traffic — the honest fraction for "
                         "windowed configs")
    ap.add_argument("--pos0", type=int, default=None,
                    help="chain start position for --clamped (default window/2)")
    ap.add_argument("--steps", type=int, default=128,
                    help="chain length for --clamped (default 128, the bench default)")
    a = ap.parse_args()
    wb = {"int8": 1.0625, "bfloat16": 2, "float32": 4}[a.dtype]  # int8 + f32 scales/64
    # int8 KV: 1 byte + one f32 rowwise scale per head_size elements
    hs = CONFIGS[a.model].dim // CONFIGS[a.model].n_heads
    cb = {"int8": 1 + 4 / hs, "bfloat16": 2, "float32": 4}[a.cache_dtype]
    frac = 1.0
    if a.clamped:
        pos0 = a.pos0 if a.pos0 is not None else a.window // 2
        frac = live_kv_fraction(pos0, a.steps, a.window)
    report(CONFIGS[a.model], a.batch, a.window, wb, cb,
           measured_tok_s=a.measured_tok_s,
           compute_dtype="float32" if a.dtype == "float32" else "bfloat16",
           kv_live_fraction=frac)
    if a.vmem:
        vmem_report(CONFIGS[a.model], a.batch, a.window, wb, cb)

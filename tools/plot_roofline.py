#!/usr/bin/env python
"""Hierarchical roofline PLOT (PNG) for a decode step.

The visual counterpart of tools/roofline.py and the TPU replacement for the
reference's rocprof roofline plotter
(scripts/profile/plot_roofline_hierarchical.py): log-log arithmetic
intensity vs attained FLOP/s, with the HBM-bandwidth slope and the MXU
bf16/int8 ceilings, per-op analytical points at their speed-of-light
position, and (optionally) the measured whole-step point from a bench run.

Usage:
  python tools/plot_roofline.py [--model 7b] [--batch 8] [--window 512]
      [--dtype int8] [--cache-dtype bfloat16] [--measured-tok-s 573]
      [--out roofline.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.roofline import CHIPS, CONFIGS, op_table  # noqa: E402

# categorical slots (fixed order) + neutral ink for roofs/text
C_PROJ, C_ATTN, C_OTHER = "#2a78d6", "#eb6834", "#1baf7a"
INK, INK_MUTED, GRID = "#333333", "#6f6e66", "#e4e3db"


def plot(cfg, b, window, wbytes_per, cache_bytes, chip="v5e",
         measured_tok_s=None, out="roofline.png", title=""):
    bw, peak_bf16, peak_int8 = CHIPS[chip]
    rows = op_table(cfg, b, window, wbytes_per, cache_bytes)

    fig, ax = plt.subplots(figsize=(8, 5.5), dpi=150)
    ax.set_xscale("log")
    ax.set_yscale("log")

    ai = np.logspace(-1, 4, 256)
    # hierarchical roofs: HBM slope capped by each compute ceiling
    for peak, name in ((peak_int8, "int8 MXU peak"),
                       (peak_bf16, "bf16 MXU peak")):
        roof = np.minimum(ai * bw, peak)
        ax.plot(ai, roof / 1e12, lw=2, color=INK_MUTED, zorder=2)
        ax.annotate(f"{name} {peak/1e12:.0f} TF/s", xy=(ai[-1], peak / 1e12),
                    xytext=(-4, 4), textcoords="offset points", ha="right",
                    fontsize=8, color=INK)
    ax.annotate(f"HBM {bw/1e9:.0f} GB/s", xy=(0.22, 0.22 * bw / 1e12),
                rotation=38, fontsize=8, color=INK, ha="center", va="bottom")

    colors = {"qkv+o proj": C_PROJ, "ffn w1/w2/w3": C_PROJ,
              "attention": C_ATTN}
    # ops with (near-)identical intensity (the weight-stream matmuls all sit
    # at AI = 2b/wbytes) collapse into one labeled point
    groups: dict[float, list[tuple[str, float, float]]] = {}
    for name, f, by in rows:
        if f <= 0 or by <= 0:
            continue
        key = round(np.log10(f / by), 2)
        groups.setdefault(key, []).append((name, f, by))
    used = set()
    for members in groups.values():
        f = sum(m[1] for m in members)
        by = sum(m[2] for m in members)
        x = f / by
        y = min(x * bw, peak_bf16)  # speed-of-light attainment
        c = colors.get(members[0][0], C_OTHER)
        used.add(c)
        ax.scatter([x], [y / 1e12], s=52, color=c, zorder=4,
                   edgecolors="white", linewidths=1.2)
        ax.annotate("\n".join(m[0] for m in members), xy=(x, y / 1e12),
                    xytext=(8, 2), textcoords="offset points", ha="left",
                    va="bottom", fontsize=8, color=INK)

    tot_f = sum(f for _, f, _ in rows)
    tot_b = sum(by for _, _, by in rows)
    x_tot = tot_f / tot_b
    if measured_tok_s:
        attained = tot_f * measured_tok_s / b  # FLOP/s at the measured rate
        sol_tok = b / max(tot_f / peak_bf16, tot_b / bw)
        ax.scatter([x_tot], [attained / 1e12], s=70, marker="D", color=INK,
                   zorder=5, edgecolors="white", linewidths=1.2)
        ax.annotate(
            f"measured step: {measured_tok_s:.0f} tok/s "
            f"({measured_tok_s / sol_tok * 100:.0f}% of roofline)",
            xy=(x_tot, attained / 1e12), xytext=(10, -12),
            textcoords="offset points", ha="left", fontsize=8, color=INK)

    ax.set_xlabel("arithmetic intensity (FLOP / HBM byte)", color=INK)
    ax.set_ylabel("attained TFLOP/s", color=INK)
    ax.set_title(title or f"{chip} decode roofline — b={b}, window={window}",
                 color=INK, fontsize=11)
    ax.grid(True, which="major", color=GRID, lw=0.6, zorder=0)
    ax.tick_params(colors=INK_MUTED)
    for s in ax.spines.values():
        s.set_color(GRID)
    handles = [
        plt.Line2D([], [], marker="o", ls="", color=c, label=lbl)
        for c, lbl in ((C_PROJ, "weight-stream matmuls"),
                       (C_ATTN, "attention"), (C_OTHER, "other"))
        if c in used
    ]
    if measured_tok_s:
        handles.append(plt.Line2D([], [], marker="D", ls="", color=INK,
                                  label="measured step"))
    ax.legend(handles=handles, fontsize=8, framealpha=0.9, edgecolor=GRID)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=list(CONFIGS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--dtype", default="int8",
                    choices=["int8", "bfloat16", "float32"])
    ap.add_argument("--cache-dtype", default="bfloat16",
                    choices=["int8", "bfloat16", "float32"])
    ap.add_argument("--measured-tok-s", type=float, default=None)
    ap.add_argument("--out", default="roofline.png")
    a = ap.parse_args()
    wb = {"int8": 1.0625, "bfloat16": 2, "float32": 4}[a.dtype]
    cb = {"int8": 1.25, "bfloat16": 2, "float32": 4}[a.cache_dtype]
    plot(CONFIGS[a.model], a.batch, a.window, wb, cb,
         measured_tok_s=a.measured_tok_s, out=a.out)

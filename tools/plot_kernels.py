#!/usr/bin/env python
"""Plot benchmark sweep results — analogue of the reference's
``utils/plot_kernels.py`` (speedup + %-of-peak grouped bars, README.md:7-22).

Consumes the CSV written by ``tools/benchmark_sweep.py`` and emits:
 * ``<out>/throughput_<direction>.png`` — achieved %-of-peak per seqlen,
   grouped by (head_dim, causal) — the analogue of the reference's
   Compute_Throughput.png;
 * ``<out>/tflops_<direction>.png`` — absolute TFLOP/s.

Usage: python tools/plot_kernels.py bench_results.csv [--out plots]
"""

import argparse
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def plot_metric(df, metric, ylabel, title, path):
    seqlens = sorted(df["seqlen"].unique())
    groups = sorted(df.groupby(["head_dim", "causal"]).groups.keys())
    width = 0.8 / max(len(groups), 1)
    fig, ax = plt.subplots(figsize=(12, 5))
    for gi, (hd, causal) in enumerate(groups):
        sub = df[(df.head_dim == hd) & (df.causal == causal)]
        vals = [
            float(sub[sub.seqlen == s][metric].iloc[0])
            if not sub[sub.seqlen == s].empty else 0.0
            for s in seqlens
        ]
        xs = [i + gi * width for i in range(len(seqlens))]
        ax.bar(xs, vals, width=width,
               label=f"hd{hd} {'causal' if causal else 'dense'}")
    ax.set_xticks([i + 0.4 - width / 2 for i in range(len(seqlens))])
    ax.set_xticklabels([str(s) for s in seqlens], rotation=45)
    ax.set_xlabel("sequence length")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.legend()
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--out", default="plots")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    df = pd.read_csv(args.csv)
    for direction in df["direction"].unique():
        sub = df[df.direction == direction]
        plot_metric(sub, "pct_of_peak", "% of chip peak",
                    f"flash-attention {direction}: achieved % of peak "
                    f"(B={int(sub.batch.iloc[0])}, H={int(sub.heads.iloc[0])})",
                    os.path.join(args.out, f"throughput_{direction}.png"))
        plot_metric(sub, "tflops", "TFLOP/s",
                    f"flash-attention {direction}: TFLOP/s",
                    os.path.join(args.out, f"tflops_{direction}.png"))


if __name__ == "__main__":
    main()

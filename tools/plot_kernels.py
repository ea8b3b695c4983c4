#!/usr/bin/env python
"""Plot benchmark sweep results — analogue of the reference's
``utils/plot_kernels.py`` (speedup + %-of-peak grouped bars, README.md:7-22).

Consumes the CSV written by ``tools/benchmark_sweep.py`` and emits:
 * ``<out>/throughput_<direction>.png`` — achieved %-of-peak per seqlen,
   grouped by (head_dim, causal) — the analogue of the reference's
   Compute_Throughput.png;
 * ``<out>/tflops_<direction>.png`` — absolute TFLOP/s;
 * with ``--speedup-csv bench_vs_xla.csv``: ``<out>/speedup_fwd.png`` —
   speedup vs the platform-native attention per seqlen, the analogue of the
   reference's headline ``Speed_Up.png`` (README.md:7-18, built by
   ``/root/reference/utils/plot_kernels.py:139-151``). Shapes where the
   native path OOMs (its O(s^2) score tensor exceeds HBM) are drawn as
   hatched no-data bars, not fabricated values.

Usage: python tools/plot_kernels.py bench_results.csv [--out plots]
       [--speedup-csv bench_vs_xla.csv]
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


def plot_speedup(df, path):
    """Grouped bars: speedup = xla_ms / flash_ms per seqlen, dense + causal.
    OOM/jitter rows (empty speedup cell, status column) become hatched bars
    at the axis top labeled with the status — flash ran, the baseline could
    not, and the chart must say that rather than invent a number."""
    seqlens = sorted(df["seqlen"].unique())
    width = 0.35
    fig, ax = plt.subplots(figsize=(12, 5))
    finite = pd.to_numeric(df["speedup"], errors="coerce")
    ymax = max(2.0, (finite.max() if finite.notna().any() else 2.0) * 1.15)
    for gi, causal in enumerate(sorted(df["causal"].unique())):
        sub = df[df.causal == causal].set_index("seqlen")
        label = "causal" if causal else "dense"
        for i, s in enumerate(seqlens):
            x = i + gi * width
            if s not in sub.index:
                continue
            row = sub.loc[s]
            val = pd.to_numeric(row["speedup"], errors="coerce")
            if row.get("status", "ok") == "ok" and pd.notna(val):
                ax.bar(x, float(val), width=width,
                       color=f"C{gi}", label=label if i == 0 else None)
                ax.text(x, float(val), f"{float(val):.1f}x",
                        ha="center", va="bottom", fontsize=8)
            else:
                ax.bar(x, ymax, width=width, color=f"C{gi}", alpha=0.25,
                       hatch="//",
                       label=(f"{label} (baseline {row['status']})"
                              if i == len(seqlens) - 1 else None))
                ax.text(x, ymax / 2, str(row["status"]).upper(),
                        ha="center", va="center", rotation=90, fontsize=8)
    ax.axhline(1.0, color="k", lw=0.8, ls="--")
    ax.set_xticks([i + width / 2 for i in range(len(seqlens))])
    ax.set_xticklabels([str(s) for s in seqlens], rotation=45)
    ax.set_xlabel("sequence length")
    ax.set_ylabel("speedup vs jax.nn.dot_product_attention")
    ax.set_title("flash-attention fwd speedup vs platform-native attention "
                 "(B=4, H=32, D=128, bf16)")
    ax.set_ylim(0, ymax)
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
    ap.add_argument("--speedup-csv", default=None,
                    help="bench_vs_xla.csv to also emit speedup_fwd.png")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.speedup_csv:
        plot_speedup(pd.read_csv(args.speedup_csv),
                     os.path.join(args.out, "speedup_fwd.png"))
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

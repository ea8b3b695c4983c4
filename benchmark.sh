#!/bin/bash
# Analogue of the reference's benchmark.sh ncu sweep: full fwd+bwd sweep over
# pow2 + non-pow2 seqlens, head dims {64,128}, causal both -> CSV + plots.
set -e
cd "$(dirname "$0")"
OUT=${1:-bench_results.csv}
python tools/benchmark_sweep.py --out "$OUT" "${@:2}"
python tools/plot_kernels.py "$OUT" --out plots

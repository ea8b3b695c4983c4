#!/usr/bin/env python
"""Re-measure the hd64 dense 16k row (VERDICT r2 weak #2).

bench_results_full.csv recorded hd64 dense fwd 16384 at 98.17 ms while
hd128 took 62.48 ms — contradicting PARITY.md's measured claim that hd64
wall-clock matches hd128 at identical blocks. This probe re-times the four
(hdim, causal) cells at 16k (and 8k as the sanity anchor) several times each
so a stale/noisy committed row can be told apart from a real block-table
bug specific to (dense, hd64, 16k).
"""
import sys

sys.path.insert(0, ".")

from tools.benchmark_sweep import bench_fwd  # noqa: E402


def main():
    for seqlen in (8192, 16384):
        n_chain = max(5, min(65, (8192 // seqlen) ** 2 * 5 + 4))
        for hdim in (64, 128):
            for causal in (False, True):
                for rep in range(3):
                    dt, flops, _ = bench_fwd(seqlen, hdim, causal, n_chain)
                    if dt is None:
                        print(f"seq={seqlen} hd={hdim} causal={int(causal)} "
                              f"rep={rep}: jitter — skipped", flush=True)
                        continue
                    print(f"seq={seqlen} hd={hdim} causal={int(causal)} "
                          f"rep={rep}: {dt*1e3:8.3f} ms "
                          f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()

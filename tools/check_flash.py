#!/usr/bin/env python
"""CLI parity checker — analogue of the reference's ``utils/test_flash.py`` /
``utils/test_flash_backward.py`` CLI scripts: run one (batch, seqlen_q,
seqlen_k, heads, heads_k, head_dim, causal) config and print the six error
metrics per output tensor (O, LSE, dQ, dK, dV) vs the fp32 reference.

Usage:
  python tools/check_flash.py --batch 2 --seqlen-q 1000 --seqlen-k 1317 \
      --heads 8 --heads-k 4 --head-dim 128 --causal --dtype bf16
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flash_attention_tpu import bwd, fwd
from flash_attention_tpu.ops.reference import (reference_attention,
                                               reference_attention_bwd)
from flash_attention_tpu.utils.metrics import error_metrics

DTYPES = {"bf16": jnp.bfloat16, "f32": jnp.float32, "fp16": jnp.float16}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seqlen-q", type=int, default=1024)
    ap.add_argument("--seqlen-k", type=int, default=None)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--heads-k", type=int, default=None)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--dtype", choices=DTYPES, default="bf16")
    args = ap.parse_args()
    sk = args.seqlen_k or args.seqlen_q
    hk = args.heads_k or args.heads
    dtype = DTYPES[args.dtype]

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (args.batch, args.seqlen_q, args.heads,
                                  args.head_dim), dtype)
    k = jax.random.normal(ks[1], (args.batch, sk, hk, args.head_dim), dtype)
    v = jax.random.normal(ks[2], (args.batch, sk, hk, args.head_dim), dtype)
    do = jax.random.normal(ks[3], q.shape, dtype)

    o, lse = fwd(q, k, v, is_causal=args.causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=args.causal)
    dq, dk, dv = bwd(q, k, v, o, lse, do, is_causal=args.causal)
    dq_ref, dk_ref, dv_ref = reference_attention_bwd(q, k, v, do,
                                                     causal=args.causal)

    print(f"config: b={args.batch} sq={args.seqlen_q} sk={sk} "
          f"h={args.heads} hk={hk} d={args.head_dim} "
          f"causal={args.causal} dtype={args.dtype}")
    for name, a, b in [("O", o, o_ref), ("LSE", lse, lse_ref),
                       ("dQ", dq, dq_ref), ("dK", dk, dk_ref),
                       ("dV", dv, dv_ref)]:
        print(f"  {name:4s} {error_metrics(a, b)}")


if __name__ == "__main__":
    main()

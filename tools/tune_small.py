"""Small/mid-sequence block-size sweep on the real chip (VERDICT r2 #2).

Sweeps (block_q, block_kv) per seqlen for the fwd kernel at the README
config (B=4, H=32, D=128, bf16), dense + causal, using the jitter-guarded
chain-slope timing from bench.py. Prints one line per measurement; feed the
winners into ``BlockSizes.for_shape``.

Usage: python tools/tune_small.py [seqlen ...] [--square] [--bh 1,2,4,8]

``--square`` restricts to bq = bkv = min(S, 1024) (the proven large-seq
shape) so the sweep isolates the head-packing knob — at small seqlens the
per-grid-step fixed cost dominates and block_h is the decisive variable;
the full (bq, bkv) cross product costs hours of tunnel compiles.
"""
import argparse
import itertools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _time_readback, slope_time  # noqa: E402
from flash_attention_tpu import fwd  # noqa: E402
from flash_attention_tpu.ops.configs import BlockSizes  # noqa: E402

B, H, D = 4, 32, 128
PEAK = 197e12


def chain(n, causal, bs):
    def g(q, k, v):
        o = q
        for _ in range(n):
            o = fwd(o, k, v, is_causal=causal, block_sizes=bs)[0]
        return jnp.sum(o.astype(jnp.float32))

    return jax.jit(g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seqlens", nargs="*", type=int,
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--square", action="store_true",
                    help="only bq = bkv = min(S, 1024)")
    ap.add_argument("--bh", default="1,2,4,8",
                    help="comma-separated block_h candidates")
    ap.add_argument("--pairs", default=None,
                    help="explicit bqxbkv pairs, e.g. 2048x1024,1024x1024 "
                         "(overrides the candidate cross product)")
    args = ap.parse_args()
    seqlens = args.seqlens or [512, 1024, 2048, 4096]
    bh_cand = tuple(int(x) for x in args.bh.split(","))
    key = jax.random.PRNGKey(0)
    for S in seqlens:
        kq, kk, kv = jax.random.split(key, 3)
        # fwd() takes the reference layout (b, s, h, d)
        q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
        cand = sorted({min(c, S) for c in (256, 512, 1024, 2048)})
        if args.square:
            cand = [min(S, 1024)]
        if args.pairs:
            combos = [tuple(int(x) for x in p.split("x"))
                      for p in args.pairs.split(",")]
        else:
            combos = list(itertools.product(cand, cand))
        # same chain-length rule as bench.py so numbers line up with the
        # headline sweep
        n_chain = max(5, min(65, (8192 // S) ** 2 * 5))
        for (bq, bkv), bh in itertools.product(combos, bh_cand):
            if S % bq or S % bkv:
                continue
            # head packing only pays when steps are few; skip huge vmem combos
            if bh * bq * bkv * 4 > 9 * 2**20:
                continue
            bs = BlockSizes(block_q=bq, block_kv=bkv, block_h=bh,
                            block_q_dq=bq, block_kv_dq=bkv,
                            block_q_dkv=bq, block_kv_dkv=bkv)
            for causal in (False, True):
                try:
                    dt = slope_time(lambda n: chain(n, causal, bs),
                                    (q, k, v), n_chain)
                except Exception as e:  # noqa: BLE001 — sweep survey tool
                    print(f"S={S:5d} bq={bq:4d} bkv={bkv:4d} bh={bh} "
                          f"causal={int(causal)} FAILED: {str(e)[:120]}",
                          flush=True)
                    continue
                if dt is None:
                    print(f"S={S:5d} bq={bq:4d} bkv={bkv:4d} bh={bh} "
                          f"causal={int(causal)} jitter — skipped", flush=True)
                    continue
                fl = 4 * B * H * S * S * D * (0.5 if causal else 1)
                print(f"S={S:5d} bq={bq:4d} bkv={bkv:4d} bh={bh} "
                      f"causal={int(causal)} "
                      f"{fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/PEAK:5.1f}% SOL "
                      f"{dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

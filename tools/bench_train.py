#!/usr/bin/env python
"""Training-step throughput: tokens/s through `llama.train_loss`'s
value_and_grad + SGD update (fwd + rematerialized bwd + optimizer), the
surface `tests/test_train.py` gates for correctness.

Model FLOP accounting uses the standard 6*N*T approximation plus exact
attention terms (causal: 0.5 * 12 * L * s^2 * H * D per batch row — fwd 4,
bwd recompute ~8 in useful-FLOPs convention), reported as model FLOP/s
utilization (MFU) against the chip's bf16 peak.

Timing: dependent-chain slope with scalar readback (see bench.py).
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import slope_time
from flash_attention_tpu.models import llama

PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=5504)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seqlens", default="1024,2048,4096")
    args = ap.parse_args()

    cfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, head_dim=128,
        hidden_dim=args.hidden)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    def chain(n, tokens, targets):
        def step(params, tokens, targets):
            for _ in range(n):
                loss, grads = jax.value_and_grad(llama.train_loss)(
                    params, tokens, targets, cfg)
                params = jax.tree.map(
                    lambda p, g: (p - 1e-4 * g).astype(p.dtype), params, grads)
            return loss, params

        return jax.jit(step)

    for s in (int(x) for x in args.seqlens.split(",")):
        key = jax.random.PRNGKey(1)
        tokens = jax.random.randint(key, (args.batch, s), 0, cfg.vocab_size,
                                    jnp.int32)
        targets = jnp.roll(tokens, -1, axis=-1)
        n_chain = max(3, min(17, (4096 // s) * 4 + 1))

        # slope_time expects factory(n) -> callable returning a scalar
        def make(n):
            f = chain(n, tokens, targets)
            return lambda params, tokens, targets: f(params, tokens, targets)[0]

        dt = slope_time(make, (params, tokens, targets), n_chain)
        if dt is None:
            print(f"# seq={s}: slope lost to jitter", flush=True)
            continue
        toks = args.batch * s
        # 6 N T for the dense params (fwd 2 + bwd 4), + causal attention:
        # fwd 4*0.5*s^2*H*D*L, bwd ~2.5x fwd (useful), per batch row
        attn = 0.5 * (4 + 10) * args.layers * s * s * args.heads * 128
        flops = 6 * n_params * toks + attn * args.batch
        print(f"# seq={s:5d} batch={args.batch} {toks/dt:10.0f} tok/s  "
              f"{flops/dt/1e12:6.1f} TFLOP/s  MFU {100*flops/dt/PEAK:5.1f}%  "
              f"{dt*1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

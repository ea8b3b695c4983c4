"""Round-5 probe D: one-shot (block_kv = full sequence) at mid seqlens.

Dense, README config. The grid collapses to (b, h, nq, 1); K/V stream as one
wide block per cell, processed in block_kv_inner sub-tiles carried in SSA.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import slope_time  # noqa: E402
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


def run(S, causal, bs, label):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    n_chain = max(9, min(129, (8192 // S) ** 2 * 9))
    try:
        dt = slope_time(lambda n: chain(n, causal, bs), (q, k, v), n_chain)
    except Exception as e:  # noqa: BLE001 — sweep survey tool
        print(f"S={S:5d} causal={int(causal)} {label}: FAILED {str(e)[:140]}",
              flush=True)
        return
    if dt is None:
        print(f"S={S:5d} causal={int(causal)} {label}: jitter", flush=True)
        return
    fl = 4 * B * H * S * S * D * (0.5 if causal else 1)
    print(f"S={S:5d} causal={int(causal)} {label}: "
          f"{fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/PEAK:5.1f}% SOL "
          f"{dt*1e3:8.3f} ms", flush=True)


for S in (2048, 4096, 8192):
    for inner in (512, 1024):
        for bq in (1024, 512):
            bs = BlockSizes(block_q=bq, block_kv=S, block_kv_inner=inner)
            run(S, False, bs, f"os-bq{bq}-inner{inner}")
# and 512/1024 one-shot refinement: inner 256/512 at both bq
for S in (512, 1024):
    for inner in (256, 512):
        if inner >= S:
            continue
        bs = BlockSizes(block_q=min(S, 1024), block_kv=S, block_kv_inner=inner)
        run(S, False, bs, f"os-inner{inner}")

"""Round-5 probe B: regression recheck + causal striping + one-shot knobs.

README config (B=4, H=32, D=128, bf16). Prints slope-timed SOL per config.
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


def run(S, causal, bs, label, reps=1):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    n_chain = max(9, min(129, (8192 // S) ** 2 * 9))
    for r in range(reps):
        try:
            dt = slope_time(lambda n: chain(n, causal, bs), (q, k, v), n_chain)
        except Exception as e:  # noqa: BLE001 — sweep survey tool
            print(f"S={S:5d} causal={int(causal)} {label}: FAILED "
                  f"{str(e)[:140]}", flush=True)
            return
        if dt is None:
            print(f"S={S:5d} causal={int(causal)} {label}: jitter", flush=True)
            continue
        fl = 4 * B * H * S * S * D * (0.5 if causal else 1)
        print(f"S={S:5d} causal={int(causal)} {label}: "
              f"{fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/PEAK:5.1f}% SOL "
              f"{dt*1e3:8.3f} ms", flush=True)


BASE = dict(block_q=1024, block_kv=1024)
# regression recheck (x2 reps)
run(8192, False, BlockSizes(**BASE), "base", reps=2)
run(8192, True, BlockSizes(**BASE), "base", reps=2)
run(2048, False, BlockSizes(**BASE), "base", reps=2)
# causal striping
for bqi in (256, 512):
    bs = BlockSizes(block_q_inner=bqi, **BASE)
    for S in (2048, 4096, 8192, 16384):
        run(S, True, bs, f"stripe{bqi}")
# one-shot knobs
run(1024, False, BlockSizes(block_kv_inner=512, **BASE), "os-inner512")
run(1024, False, BlockSizes(**BASE), "os-base")
run(512, False, BlockSizes(**BASE), "os-base")
for bqi in (128, 256):
    bs = BlockSizes(block_q_inner=bqi, **BASE)
    run(512, True, bs, f"os-stripe{bqi}")
    run(1024, True, bs, f"os-stripe{bqi}")
run(512, True, BlockSizes(**BASE), "os-base")
run(1024, True, BlockSizes(**BASE), "os-base")

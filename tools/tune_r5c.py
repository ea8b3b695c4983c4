"""Round-5 probe C: static causal-diagonal triangle specialization.

README config (B=4, H=32, D=128, bf16), causal, block_q_inner in
{None, 512, 256, 128} at seq 512..16k.
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


for bqi in (512, 256, 128):
    for S in (512, 1024, 2048, 4096, 8192, 16384):
        bq = min(S, 1024)
        if bqi >= bq:
            continue
        bs = BlockSizes(block_q=1024, block_kv=1024, block_q_inner=bqi)
        run(S, True, bs, f"diag{bqi}")

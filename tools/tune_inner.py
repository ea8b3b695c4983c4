"""Sweep block_kv_inner (fwd online-softmax sub-tile) at the 8k headline config.

The inner tile interleaves the QK^T and PV MXU passes at finer grain; the
round-2/3 sweeps covered (block_q, block_kv, block_h) but never this knob
(default None = whole block).
"""
import time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from flash_attention_tpu import fwd
from flash_attention_tpu.ops.configs import BlockSizes

B, S, H, D = 4, 8192, 32, 128
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)


def chain(n, causal, bs):
    def g(q, k, v):
        o = q
        for _ in range(n):
            o = fwd(o, k, v, is_causal=causal, block_sizes=bs)[0]
        return jnp.sum(o.astype(jnp.float32))
    return jax.jit(g)


def t_read(f, args, reps=3):
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(*args))
    return (time.perf_counter() - t0) / reps


for inner in (None, 512, 256, 128):
    bs = BlockSizes(block_q=1024, block_kv=1024, block_kv_inner=inner)
    for causal in (False, True):
        try:
            t1 = t_read(chain(1, causal, bs), (q, k, v))
            t5 = t_read(chain(5, causal, bs), (q, k, v))
            dt = (t5 - t1) / 4
            fl = 4 * B * H * S * S * D * (0.5 if causal else 1)
            print(f"inner={inner} causal={int(causal)} "
                  f"{fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/197e12:5.1f}% SOL "
                  f"{dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"inner={inner} causal={causal} FAILED: {str(e)[:160]}",
                  flush=True)

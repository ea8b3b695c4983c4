"""Round-5 probe J: long-KV chunked forward (attention.KV_SPLIT) at 16k+."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import slope_time  # noqa: E402
from flash_attention_tpu import fwd  # noqa: E402

B, H, D = 4, 32, 128
PEAK = 197e12


def chain(n, causal):
    def g(q, k, v):
        o = q
        for _ in range(n):
            o = fwd(o, k, v, is_causal=causal)[0]
        return jnp.sum(o.astype(jnp.float32))
    return jax.jit(g)


def run(S, causal):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    dt = slope_time(lambda n: chain(n, causal), (q, k, v), 3)
    if dt is None:
        print(f"S={S} causal={int(causal)}: jitter", flush=True)
        return
    fl = 4 * B * H * S * S * D * (0.5 if causal else 1)
    print(f"S={S:5d} causal={int(causal)} chunked: "
          f"{fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/PEAK:5.1f}% SOL "
          f"{dt*1e3:8.3f} ms", flush=True)


run(16384, False)
run(16384, True)

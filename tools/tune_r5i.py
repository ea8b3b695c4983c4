"""Round-5 probe I: the 16k regime.

At 16384 the one-shot block (K+V = 8 MB + double buffering) no longer fits
VMEM, so dense falls back to the (1024, 2048, inner 1024) scratch grid
(~75% SOL vs 91% at 8k one-shot) and causal to the plain 1024^2 grid
(~60%). Probe wider scratch-regime KV blocks (fewer grid steps, fewer
scratch round-trips) and the band-switch at nk == 2.
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


def run(S, causal, bq, bkv, inner, bqi=None, reps=1):
    bs = BlockSizes(block_q=bq, block_kv=bkv, block_kv_inner=inner,
                    block_q_inner=bqi)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    n_chain = max(9, min(129, (8192 // S) ** 2 * 9)) if S <= 8192 else 3
    label = f"bq{bq}-bkv{bkv}-in{inner}-qi{bqi}"
    for _ in range(reps):
        try:
            dt = slope_time(lambda n: chain(n, causal, bs), (q, k, v), n_chain)
        except Exception as e:  # noqa: BLE001 — sweep survey tool
            print(f"S={S:5d} causal={int(causal)} {label}: FAILED "
                  f"{str(e)[:90]}", flush=True)
            return
        if dt is None:
            print(f"S={S:5d} causal={int(causal)} {label}: jitter", flush=True)
            continue
        fl = 4 * B * H * S * S * D * (0.5 if causal else 1)
        print(f"S={S:5d} causal={int(causal)} {label}: "
              f"{fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/PEAK:5.1f}% SOL "
              f"{dt*1e3:8.3f} ms", flush=True)


import sys as _sys  # noqa: E402

which = _sys.argv[1] if len(_sys.argv) > 1 else "dense"
if which == "dense":
    # dense 16k: current = (1024, 2048, 1024)
    run(16384, False, 512, 8192, 1024)
    run(16384, False, 1024, 4096, 1024)
    run(16384, False, 256, 8192, 1024)
elif which == "causal":
    # causal 16k: current = plain (1024, 1024) grid
    run(16384, True, 512, 8192, 1024)     # band switch at nk == 2
    run(16384, True, 1024, 2048, 1024)
    run(16384, True, 256, 8192, 1024)
elif which == "oneshot":
    run(16384, False, 256, 16384, 1024)   # one-shot; likely VMEM fail

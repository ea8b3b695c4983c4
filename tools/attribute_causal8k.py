"""Attribute the causal-8k gap to its components (VERDICT r2 #3).

BENCH r2 recorded causal 8k at 55.9% SOL in the headline config (B=4, H=32)
while the self-derived block-granularity ceiling is ~63% (PARITY.md: causal
SOL ceiling = 0.5 / live_block_fraction x dense SOL; at seq 8k / block 1024
the live fraction is 36/64 = 0.5625 so the ceiling is 0.889 x dense). The
B4-H16 sweep config measured 62.1% at least once. This tool separates the
candidate causes with one measurement each:

  * dense same-config        — the dense anchor the ceiling math scales;
  * causal 3-state           — the shipped schedule;
  * causal force_branch=mask — every live block masked (round-1 behavior):
                               the cost of the mask VPU work itself;
  * causal force_branch=nomask — every live block mask-free (WRONG numerics,
                               ceiling): the cost attributable to masking
                               diagonal blocks;
  * H=16 variant             — the config difference vs the sweep number.

Usage: python tools/attribute_causal8k.py [seqlen]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import slope_time  # noqa: E402
from flash_attention_tpu.ops.configs import BlockSizes  # noqa: E402
from flash_attention_tpu.ops.flash_fwd import flash_fwd  # noqa: E402

B, D = 4, 128
PEAK = 197e12


def chain(n, causal, force_branch):
    def g(q, k, v):
        o = q
        for _ in range(n):
            o, _ = flash_fwd(o, k, v, causal=causal, sm_scale=D ** -0.5,
                             block_sizes=BlockSizes(),
                             seqlen_q=o.shape[2], seqlen_k=k.shape[2],
                             interpret=jax.default_backend() == "cpu",
                             force_branch=force_branch)
        return jnp.sum(o.astype(jnp.float32))

    return jax.jit(g)


def measure(tag, S, H, causal, force_branch=None):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # flash_fwd takes kernel layout (b, h, s, d)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)
    n_chain = max(5, min(65, (8192 // S) ** 2 * 5))
    dt = slope_time(lambda n: chain(n, causal, force_branch), (q, k, v),
                    n_chain)
    if dt is None:
        print(f"{tag:34s}: jitter — skipped", flush=True)
        return None
    fl = 4 * B * H * S * S * D * (0.5 if causal else 1)
    print(f"{tag:34s}: {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TFLOP/s "
          f"{100*fl/dt/PEAK:5.1f}% SOL", flush=True)
    return dt


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    for H in (32, 16):
        print(f"--- B={B} H={H} D={D} seq={S} bf16 ---", flush=True)
        t_dense = measure(f"dense H={H}", S, H, False)
        t_causal = measure(f"causal 3-state H={H}", S, H, True)
        t_mask = measure(f"causal force=mask H={H}", S, H, True, "mask")
        t_nomask = measure(f"causal force=nomask H={H}", S, H, True, "nomask")
        if t_dense and t_causal and t_nomask:
            nb = S // 1024
            live = (nb * (nb + 1) / 2) / nb ** 2
            # causal runs only the live blocks, each at dense per-block
            # speed, so the wall-clock ceiling is live_fraction x dense
            print(f"  block ceiling (live={live:.4f}): predicted causal "
                  f"{t_dense*live*1e3:.3f} ms; measured {t_causal*1e3:.3f} ms;"
                  f" mask-free floor {t_nomask*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
